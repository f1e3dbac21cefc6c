"""Link-reciprocity spam signal (functions/graph.link_reciprocity)."""

import pyarrow as pa

from docling_translate_ray.functions.graph import link_reciprocity


def _run(edges):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string()),
    }))
    out = link_reciprocity(ds).to_pandas()
    return {r.host: (int(r.n_out), int(r.n_recip), int(r.recip_pct))
            for r in out.itertuples()}


def test_reciprocal_and_one_way(ray_session):
    # c has no out-links -> absent (the signal is per LINKING host)
    got = _run([("a", "b"), ("b", "a"), ("a", "c")])
    assert got == {"a": (2, 1, 50), "b": (1, 1, 100)}


def test_duplicates_selfloops_dropped(ray_session):
    got = _run([("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")])
    assert got == {"a": (1, 1, 100), "b": (1, 1, 100)}


def test_pure_farm_vs_organic(ray_session):
    edges = []
    # farm: f0..f3 fully reciprocal clique
    for i in range(4):
        for j in range(4):
            if i != j:
                edges.append((f"f{i}", f"f{j}"))
    # organic: o links out to 3 hosts, none reciprocate
    edges += [("o", "x"), ("o", "y"), ("o", "z")]
    got = _run(edges)
    for i in range(4):
        assert got[f"f{i}"] == (3, 3, 100)
    assert got["o"] == (3, 0, 0)
