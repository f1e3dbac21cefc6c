"""Head-metadata extraction (functions/headmeta.py): ladder
precedence, attribute-order variants, trim/empty→null normalization,
the HEAD_CHARS scan cutoff, and polars↔DuckDB regex lockstep."""

import pyarrow as pa


def _run(htmls):
    from docling_translate_ray.functions.headmeta import (
        extract_head_meta_batch)

    t = pa.table({
        "doc_id": pa.array(range(len(htmls)), pa.int64()),
        "html": pa.array(htmls, pa.string()),
    })
    return extract_head_meta_batch(t).to_pylist()


def test_title_ladder_and_attr_orders():
    out = _run([
        # og:title (property-first) beats the <title> tag
        '<meta property="og:title" content="OG wins">'
        "<title>Tag loses</title>",
        # og:title content-first variant
        '<meta content="OG swapped" property="og:title"><title>t</title>',
        # tag only
        "<title>Just the tag</title>",
        # nothing
        "plain body",
        None,
    ])
    got = [(r["title"], r["title_source"]) for r in out]
    assert got == [("OG wins", "og"), ("OG swapped", "og"),
                   ("Just the tag", "tag"), (None, "none"),
                   (None, "none")]


def test_description_and_canonical():
    out = _run([
        '<meta name="description" content="meta desc">'
        '<meta property="og:description" content="og desc">'
        '<link rel="canonical" href="https://ex.com/a">',
        # og fallback + href-first canonical
        '<meta property="og:description" content="only og">'
        '<link href="https://ex.com/b" rel="canonical">',
        # content-first name=description
        '<meta content="swapped desc" name="description">',
    ])
    assert [(r["description"], r["desc_source"], r["canonical_url"])
            for r in out] == [
        ("meta desc", "meta", "https://ex.com/a"),
        ("only og", "og", "https://ex.com/b"),
        ("swapped desc", "meta", None)]


def test_trim_and_empty_to_null():
    out = _run([
        "<title> \t padded \r\n </title>",
        "<title> \t\r\n </title>",                 # whitespace-only → null
        '<meta property="og:title" content="">x',  # empty capture → no rung
    ])
    got = [(r["title"], r["title_source"]) for r in out]
    assert got == [("padded", "tag"), (None, "none"), (None, "none")]


def test_head_chars_cutoff():
    from docling_translate_ray.functions.headmeta import HEAD_CHARS

    inside = "<title>early</title>" + "x" * HEAD_CHARS \
        + '<meta property="og:title" content="late decoy">'
    beyond = "x" * HEAD_CHARS + "<title>too late</title>"
    # a tag STRADDLING the cutoff must not fire either
    straddle = "x" * (HEAD_CHARS - 10) + "<title>cut</title>"
    out = _run([inside, beyond, straddle])
    got = [(r["title"], r["title_source"]) for r in out]
    assert got == [("early", "tag"), (None, "none"), (None, "none")]


def test_no_cross_tag_match():
    # '[^>]*' must stop a rung from stitching two different tags
    out = _run([
        '<meta property="og:title"><meta content="other tag">',
    ])
    assert out[0]["title_source"] == "none"


def test_sql_lockstep_adversarial():
    """The DuckDB ladders (RE2) agree with the polars kernel
    (rust-regex) value-for-value on boundary-hugging input."""
    import duckdb

    from docling_translate_ray.functions.headmeta import (
        HEAD_CHARS, head_meta_sql_exprs)

    htmls = [
        '<meta property="og:title" content="a"><title>b</title>',
        '<meta content="a" property="og:title">',
        "<title>only</title>",
        "<title></title>",                       # empty capture
        "<title>   </title>",                    # ws-only → null both sides
        '<meta name="description" content="d1">'
        '<meta property="og:description" content="d2">',
        '<link href="u1" rel="canonical"><link rel="canonical" href="u2">',
        "x" * (HEAD_CHARS - 5) + "<title>cut</title>",
        "…<title>unicode neighbours…</title>…",
        "", None,
        '<meta property="og:title"><meta content="no stitch">',
    ]
    got = _run(htmls)
    exprs = head_meta_sql_exprs("html")
    sel = ", ".join(f"{e} AS {k}" for k, e in exprs.items())
    con = duckdb.connect()
    t = pa.table({"doc_id": pa.array(range(len(htmls)), pa.int64()),
                  "html": pa.array(htmls, pa.string())})
    con.register("pages", t)
    want = con.execute(
        f"SELECT doc_id, {sel} FROM pages ORDER BY doc_id"
    ).fetch_arrow_table().to_pylist()
    for g, w in zip(got, want):
        for k in ("title", "title_source", "description",
                  "desc_source", "canonical_url"):
            assert g[k] == w[k], (g["doc_id"], k, g[k], w[k])
