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
