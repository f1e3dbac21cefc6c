"""PageRank operator: integer-exact vs an independent driver-side replay."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from docling_translate_ray.functions.graph import DEFAULT_EDGES, pagerank_int


def _reference(n: int, iterations: int = 3) -> dict[int, int]:
    scale, damping, d = 1_000_000, 85, len(DEFAULT_EDGES)
    base = (100 - damping) * scale // 100
    pr = {i: scale for i in range(n)}
    for _ in range(iterations):
        s = {i: 0 for i in range(n)}
        for i in range(n):
            for m, a in DEFAULT_EDGES:
                s[(i * m + a) % n] += pr[i] // d
        pr = {i: base + damping * s[i] // 100 for i in range(n)}
    return pr


def test_pagerank_matches_pure_python_replay():
    n = 37  # prime, so the affine maps are bijections — but the op must
    # not rely on that; replay computes whatever the rule produces
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ).repartition(3)
    out = pagerank_int(ds, num_partitions=4)
    got = {r["doc_id"]: r["pr"] for r in out.take_all()}
    assert got == _reference(n)


def test_pagerank_non_bijective_rule_keeps_all_nodes():
    # n = 14 shares a factor with m = 7: some nodes get no in-links from
    # that map; every node must still appear with >= the teleport base
    n = 14
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    out = pagerank_int(ds, num_partitions=4)
    got = {r["doc_id"]: r["pr"] for r in out.take_all()}
    assert set(got) == set(range(n))
    assert got == _reference(n)
    assert all(v >= 150_000 for v in got.values())
    # total mass is conserved up to floor losses
    assert sum(got.values()) <= n * 1_000_000


def test_anchor_text_agg_handmade():
    import ray.data

    from docling_translate_ray.functions.graph import anchor_text_agg

    edges = pa.table({
        "dst": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "anchor": pa.array(
            ["home", "home", "about us", "zzz", "blog", "atom", "only"],
            pa.string()),
    })
    got = {r["dst"]: (r["n_inlinks"], r["n_unique_anchors"], r["top_anchor"])
           for r in anchor_text_agg(
               ray.data.from_arrow(edges).repartition(3)).take_all()}
    assert got[1] == (4, 3, "home")       # count argmax
    assert got[2] == (2, 2, "atom")       # tie -> lexicographically smallest
    assert got[3] == (1, 1, "only")
    assert set(got) == {1, 2, 3}


def test_resolve_href_rule_table():
    from docling_translate_ray.functions.graph import resolve_href

    base = "https://www.site.example:8080/a/b/page.html?q=1"
    cases = {
        "https://other.example/x": "https://other.example/x",
        "http://other.example/x": "http://other.example/x",
        "//cdn.example/y": "https://cdn.example/y",
        "/root.html": "https://www.site.example:8080/root.html",
        "sib.html": "https://www.site.example:8080/a/b/sib.html",
        "deeper/x.html": "https://www.site.example:8080/a/b/deeper/x.html",
        "page.html#sec": "https://www.site.example:8080/a/b/page.html",
        "#frag": None,
        "": None,
        "mailto:a@b.example": None,
        "javascript:void(0)": None,
        "data:text/plain,hi": None,
    }
    for href, want in cases.items():
        assert resolve_href(base, href) == want, href
    # base without a scheme: relatives unresolvable, absolutes still pass
    assert resolve_href("no-scheme-base", "x.html") is None
    assert resolve_href("no-scheme-base", "https://a.example/x") == \
        "https://a.example/x"
    # base with bare origin (no path): directory is "/"
    assert resolve_href("https://a.example", "x.html") == \
        "https://a.example/x.html"


def test_extract_links_batch_order_anchors_and_quotes():
    from docling_translate_ray.functions.graph import extract_links_batch

    html = (
        "<html><body>"
        "<a href='/one' class=x>First <b>bold</b>\n link</a>"
        '<a href="#skip">nope</a>'
        '<A HREF="https://e.example/two" target=_blank>SECOND</A>'
        "<a href='mailto:z@z'>nope</a>"
        "<a href='rel/three'><img src='i.png'/></a>"
        "</body></html>"
    )
    batch = pa.table({
        "url": ["https://h.example/d/p.html", "https://empty.example/"],
        "html": [html.encode("utf-8"), None],  # binary column + null row
    })
    got = extract_links_batch(batch).to_pylist()
    assert [(r["link"], r["anchor"], r["pos"]) for r in got] == [
        ("https://h.example/one", "First bold link", 1),
        ("https://e.example/two", "SECOND", 2),
        ("https://h.example/d/rel/three", "", 3),
    ]
    assert all(r["url"] == "https://h.example/d/p.html" for r in got)
