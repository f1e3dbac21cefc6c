"""Tests for functions/graph.host_components — host-graph connected
components labeled by the component's lexicographic minimum host
string, on both closure paths (single-task union-find and distributed
min-label propagation)."""

import pyarrow as pa
import pytest

from docling_translate_ray.functions.graph import host_components


def _run(edges, **kw):
    import ray.data

    t = pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string()),
    })
    out = host_components(ray.data.from_arrow(t), num_partitions=4, **kw)
    return {r["host"]: r["component_host"] for r in out.take_all()}


EDGES = [
    # chain a-b-c (multi-hop closure required)
    ("b.example", "a.example"),
    ("c.example", "b.example"),
    # star around z, including host10/host2 string-order trap
    ("host10.example", "z.example"),
    ("host2.example", "z.example"),
    # self-loop singleton
    ("solo.example", "solo.example"),
    # duplicate edge
    ("c.example", "b.example"),
]

EXPECTED = {
    "a.example": "a.example",
    "b.example": "a.example",
    "c.example": "a.example",
    "z.example": "host10.example",   # 'host10' < 'host2' < 'z'
    "host10.example": "host10.example",
    "host2.example": "host10.example",
    "solo.example": "solo.example",
}


def test_golden_components_fast_path():
    assert _run(EDGES) == EXPECTED


def test_golden_components_distributed_path():
    # threshold 0 forces the min-label-propagation closure
    assert _run(EDGES, single_block_threshold=0) == EXPECTED


def test_every_host_labeled_once():
    got = _run(EDGES)
    assert len(got) == 7
    # labels are real member hosts
    for h, c in got.items():
        assert c in got


def test_two_cliques_never_merge():
    edges = ([(f"a{i}.x", f"a{j}.x") for i in range(4) for j in range(4)]
             + [(f"b{i}.y", f"b{j}.y") for i in range(3) for j in range(3)])
    got = _run(edges)
    assert set(got[h] for h in got if h.endswith(".x")) == {"a0.x"}
    assert set(got[h] for h in got if h.endswith(".y")) == {"b0.y"}


@pytest.mark.parametrize("threshold", [0, 2_000_000])
def test_chain_matches_naive(threshold):
    # 3 chains of 5 with shuffled edge order; naive union-find reference
    import random

    rng = random.Random(5)
    edges = []
    for c in range(3):
        hosts = [f"h{c}n{k}.example" for k in range(5)]
        for k in range(1, 5):
            edges.append((hosts[k], hosts[k - 1]))
    rng.shuffle(edges)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for h in list(parent):
        comps.setdefault(find(h), set()).add(h)
    expected = {}
    for members in comps.values():
        lbl = min(members)
        for h in members:
            expected[h] = lbl
    assert _run(edges, single_block_threshold=threshold) == expected


def test_driver_query_matches_oracle(sf_dir):
    import duckdb

    import __ray_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.queries_legacy()}
    got = sorted(qs["host_components"](sf_dir).take_all(),
                 key=lambda r: r["host"])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    exp = sorted(
        con.execute(entrymod.oracle_sql()["host_components"])
        .arrow().to_pylist(), key=lambda r: r["host"])
    assert got == exp
