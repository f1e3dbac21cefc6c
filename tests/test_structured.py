"""JSON-LD structured-data extraction (functions/structured.py)."""

import pyarrow as pa

from docling_translate_ray.functions import structured as fs


def _rows(html):
    batch = pa.table({"url": ["u"], "html": pa.array([html], pa.string())})
    out = fs.jsonld_batch(batch)
    return [tuple(r[c] for c in
                  ("block_idx", "jtype", "headline",
                   "date_published", "author"))
            for r in out.to_pylist()]


def test_article_fields():
    h = ('<html><head><script type="application/ld+json">'
         '{"@type": "NewsArticle", "headline": "Big News", '
         '"datePublished": "2024-03-01", '
         '"author": {"name": "Ann Writer"}}'
         "</script></head></html>")
    assert _rows(h) == [(0, "NewsArticle", "Big News",
                         "2024-03-01", "Ann Writer")]


def test_ladders_name_fallback_author_string_and_list():
    h = ('<script type="application/ld+json">'
         '{"@type": "Product", "name": "Widget", "author": "Bob"}'
         "</script>"
         '<script type="application/ld+json">'
         '{"@type": ["Article", "Thing"], "headline": "H2", '
         '"author": [{"name": "Carol"}, {"name": "Dan"}]}'
         "</script>")
    assert _rows(h) == [
        (0, "Product", "Widget", "", "Bob"),
        (1, "Article", "H2", "", "Carol"),
    ]


def test_invalid_json_and_missing_type_skipped():
    h = ('<script type="application/ld+json">{not json}</script>'
         '<script type="application/ld+json">{"headline": "x"}</script>'
         '<script type="application/ld+json">[1, 2]</script>'
         '<script type="application/ld+json">{"@type": "Thing"}</script>')
    # only the last block is valid; its block_idx is 0 (ordinal among
    # VALID blocks)
    assert _rows(h) == [(0, "Thing", "", "", "")]


def test_no_blocks_and_binary_payload():
    batch = pa.table({
        "url": ["a", "b"],
        "html": pa.array(
            [b"<html>no ld</html>",
             b'<script type="application/ld+json">'
             b'{"@type": "T", "name": "n"}</script>'],
            pa.binary()),
    })
    out = fs.jsonld_batch(batch).to_pylist()
    assert [(r["url"], r["jtype"], r["headline"]) for r in out] == \
        [("b", "T", "n")]


def test_extract_jsonld_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "url": ["x"],
        "html": ['<script type="application/ld+json">'
                 '{"@type": "A", "headline": "hh"}</script>'],
    }))
    out = fs.extract_jsonld(ds).to_pandas()
    assert list(out.headline) == ["hh"]


def test_json_containing_angle_bracket_not_dropped():
    # '<' is legal inside JSON strings; the lazy body match keeps it
    out = _rows('<script type="application/ld+json">'
                '{"@type": "Article", "headline": "a <b> c"}</script>')
    assert out == [(0, "Article", "a <b> c", "", "")]
