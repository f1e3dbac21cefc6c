"""Shuffle/skew tests: hash partitioning correctness and hot-key immunity.

The engine's skew story (SURVEY.md §4): every shuffle key is either a
content hash (uniform by construction) or preceded by a per-batch combiner
that caps exchange rows at one per (batch, key) — so a single pathological
hot key ("" boilerplate sentence, one giant host) degrades a partition by
at most num_blocks rows, never by the key's row count.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from docling_translate_ray.stages.shuffle import add_pkey, grouped_sum, hash_partition_apply


def _collect(ds) -> pa.Table:
    batches = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    return pa.concat_tables(batches, promote_options="default")


def test_add_pkey_stable_and_bounded():
    t = pa.table({"k": [f"key{i % 7}" for i in range(100)], "v": list(range(100))})
    out1 = add_pkey(t, ["k"], 16)
    out2 = add_pkey(t, ["k"], 16)
    assert out1["_pkey"].to_pylist() == out2["_pkey"].to_pylist()  # process-stable
    assert all(0 <= p < 16 for p in out1["_pkey"].to_pylist())
    # equal keys → equal pkey
    by_key = {}
    for k, p in zip(out1["k"].to_pylist(), out1["_pkey"].to_pylist()):
        assert by_key.setdefault(k, p) == p


def test_hash_partition_apply_co_partitions_keys():
    import polars as pl

    rows = pa.table(
        {"k": [f"g{i % 23}" for i in range(2000)], "v": list(range(2000))}
    )
    ds = ray.data.from_arrow(rows).repartition(8)

    def block(part: pa.Table) -> pa.Table:
        # per-partition group_by is globally correct ⇔ keys co-partitioned
        return (
            pl.from_arrow(part).group_by("k").agg(pl.col("v").sum()).to_arrow()
        )

    got = _collect(hash_partition_apply(ds, ["k"], block, num_partitions=8))
    assert got.num_rows == 23  # each key appears exactly once overall
    want = (
        pl.from_arrow(rows).group_by("k").agg(pl.col("v").sum())
    )
    got_map = dict(zip(got["k"].to_pylist(), got["v"].to_pylist()))
    for k, v in zip(want["k"].to_list(), want["v"].to_list()):
        assert got_map[k] == v


def test_grouped_sum_hot_key_immunity():
    """One key owning 99% of 60k rows: the combiner means the exchange sees
    ≤ (blocks × keys) rows, and the result is still exact."""
    import polars as pl

    n = 60_000
    keys = ["hot"] * (n - 600) + [f"cold{i}" for i in range(600)]
    vals = list(range(n))
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(16)
    out = _collect(
        grouped_sum(
            ds,
            ["k"],
            [pl.col("v").sum().alias("_s"), pl.len().cast(pl.Int64).alias("_n")],
            {"total": "_s", "n": "_n"},
        )
    )
    got = {r["k"]: (r["total"], r["n"]) for r in out.to_pylist()}
    hot_expect = sum(range(n - 600))
    assert got["hot"] == (hot_expect, n - 600)
    assert len(got) == 601
    cold_base = n - 600
    for i in (0, 599):
        assert got[f"cold{i}"] == (cold_base + i, 1)


def test_id_filter_join_paths_agree_semi_anti():
    """Broadcast path (under the row budget) and partition_join fallback
    (budget forced to 0) must return identical rows for both semi and
    anti, including the empty-id-set edge (semi -> nothing, anti ->
    everything)."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import id_filter_join

    rows = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": [f"doc {i}" for i in range(200)],
    })
    ds = ray.data.from_arrow(rows).repartition(8)
    keep = pa.table({"doc_id": pa.array(range(0, 200, 3), pa.int64())})
    ids = ray.data.from_arrow(keep)

    for how, want in (
        ("semi", set(range(0, 200, 3))),
        ("anti", set(range(200)) - set(range(0, 200, 3))),
    ):
        bcast = _collect(id_filter_join(ds, ids, how=how))
        dist = _collect(id_filter_join(ds, ids, how=how, max_broadcast=0))
        assert set(bcast["doc_id"].to_pylist()) == want
        assert (
            pl.from_arrow(bcast).sort("doc_id").to_arrow()
            == pl.from_arrow(dist).sort("doc_id").to_arrow()
        )
        # full rows survive, not just ids
        assert set(bcast.column_names) == {"doc_id", "text"}

    empty = ray.data.from_arrow(
        pa.schema([("doc_id", pa.int64())]).empty_table())
    assert id_filter_join(ds, empty, how="semi").count() == 0
    assert id_filter_join(ds, empty, how="anti").count() == 200


def test_broadcast_join_parity_with_partition_join():
    """Broadcast path and partition_join must produce identical row
    multisets for inner and left, including duplicate right keys
    (fan-out), unmatched left rows (null fill), and null keys (never
    match)."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import (
        broadcast_join,
        partition_join,
    )

    left = pa.table({
        "k": pa.array([1, 2, 2, 3, None, 5], pa.int64()),
        "v": ["a", "b", "c", "d", "e", "f"],
    })
    right = pa.table({
        "k": pa.array([2, 2, 3, None], pa.int64()),
        "w": pa.array([10, 20, 30, 40], pa.int64()),
    })
    lds = ray.data.from_arrow(left).repartition(4)

    def norm(tbl: pa.Table) -> list:
        return sorted(
            pl.from_arrow(tbl).rows(),
            key=lambda r: tuple((x is None, x) for x in r),
        )

    for how in ("inner", "left"):
        bcast = _collect(broadcast_join(lds, ray.data.from_arrow(right),
                                        on=["k"], how=how))
        dist = _collect(partition_join(lds, ray.data.from_arrow(right),
                                       on=["k"], how=how))
        assert bcast.schema == dist.schema.remove_metadata() or (
            bcast.column_names == dist.column_names)
        assert norm(bcast) == norm(dist), how
        # fallback path (budget forced to 0) = partition_join by construction
        fb = _collect(broadcast_join(lds, ray.data.from_arrow(right),
                                     on=["k"], how=how, max_broadcast=0))
        assert norm(fb) == norm(dist), how

    # null keys never match in either mode
    inner = _collect(broadcast_join(lds, ray.data.from_arrow(right),
                                    on=["k"], how="inner"))
    assert None not in inner["k"].to_pylist()


def test_broadcast_join_empty_right_contract():
    """Empty-right contract mirrors partition_join: left-join returns the
    left side untouched; inner raises (needs the right columns)."""
    import pytest

    from docling_translate_ray.stages.shuffle import broadcast_join

    lds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                        "v": ["a"]}))
    empty = ray.data.from_arrow(
        pa.schema([("k", pa.int64()), ("w", pa.int64())]).empty_table())
    # schema known but zero rows: broadcast path joins against an empty
    # table — left keeps rows with null fill, inner returns nothing
    assert broadcast_join(lds, empty, on=["k"], how="inner").count() == 0
    lres = _collect(broadcast_join(lds, empty, on=["k"], how="left"))
    assert lres["v"].to_pylist() == ["a"] and lres["w"].to_pylist() == [None]

    # schema UNKNOWN (filter matched nothing upstream -> schema None)
    nosch = ray.data.from_items([{"k": 1, "w": 2}]).filter(
        lambda r: False).materialize()
    if nosch.schema() is None:
        assert broadcast_join(lds, nosch, on=["k"], how="left") is lds
        with pytest.raises(ValueError):
            broadcast_join(lds, nosch, on=["k"], how="inner")


def test_id_filter_join_null_keys_parity():
    """Null ids in either side must behave like the exchange path: null
    keys never match (semi drops them, anti keeps them) even when the id
    SET also contains nulls (pc.is_in would otherwise match null-to-null;
    the broadcast path drops set nulls on purpose)."""
    from docling_translate_ray.stages.shuffle import id_filter_join

    rows = pa.table({
        "doc_id": pa.array([1, 2, None], pa.int64()),
        "v": ["a", "b", "c"],
    })
    ds = ray.data.from_arrow(rows)
    ids = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([2, None], pa.int64())}))

    for how, want in (("semi", {"b"}), ("anti", {"a", "c"})):
        bcast = _collect(id_filter_join(ds, ids, how=how))
        dist = _collect(id_filter_join(ds, ids, how=how, max_broadcast=0))
        assert set(bcast["v"].to_pylist()) == want, how
        assert set(dist["v"].to_pylist()) == want, how


def test_broadcast_join_byte_cap_falls_back():
    """A right side that passes the row budget but exceeds the BYTE cap
    must take the partition_join fallback and still return identical
    rows (row-count-only gating would broadcast wide tables)."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import broadcast_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(range(50), pa.int64()), "v": ["x"] * 50}))
    wide = ray.data.from_arrow(pa.table({
        "k": pa.array(range(50), pa.int64()),
        "w": ["y" * 4096] * 50}))
    a = _collect(broadcast_join(left, wide, on=["k"], how="inner"))
    b = _collect(broadcast_join(left, wide, on=["k"], how="inner",
                                max_broadcast_bytes=1))
    assert sorted(pl.from_arrow(a).rows()) == sorted(pl.from_arrow(b).rows())
    assert a.num_rows == 50


def test_partition_wall_recorder_env_gated(tmp_path, monkeypatch):
    """The skew profiler appends one JSON line per partition when
    DTR_PARTITION_WALL_DIR is set, and is a no-op (no files) otherwise."""
    import json
    import os

    from docling_translate_ray.stages.shuffle import _record_partition_wall

    monkeypatch.delenv("DTR_PARTITION_WALL_DIR", raising=False)
    _record_partition_wall("off", 1, 1, 0.5)
    assert list(tmp_path.iterdir()) == []

    monkeypatch.setenv("DTR_PARTITION_WALL_DIR", str(tmp_path))
    _record_partition_wall("host:schedule", 100, 90, 0.25)
    _record_partition_wall("host:schedule", 7, 7, 0.01)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].name == f"walls-{os.getpid()}.jsonl"
    recs = [json.loads(line) for line in files[0].read_text().splitlines()]
    assert recs == [
        {"label": "host:schedule", "rows_in": 100, "rows_out": 90,
         "wall_s": 0.25},
        {"label": "host:schedule", "rows_in": 7, "rows_out": 7,
         "wall_s": 0.01},
    ]
