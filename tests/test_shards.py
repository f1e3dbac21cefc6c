"""train_shards (functions/shards): deterministic global-shuffle shard
layout — DuckDB lockstep, partition invariance, and the writer mode."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus(n=300):
    # sparse non-contiguous ids + varied/empty texts
    ids = [i * 7 + (i % 3) for i in range(n)]
    texts = [
        "" if i % 17 == 0 else f"doc {i} " + "word " * (i % 23)
        for i in ids
    ]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _oracle(tbl: pa.Table):
    import duckdb

    con = duckdb.connect()
    con.register("documents", tbl)
    out = con.execute("""
        WITH k AS (
          SELECT doc_id, length(text) AS n_chars,
                 md5('shard:' || doc_id) AS key
          FROM documents),
        r AS (
          SELECT substring(key, 1, 1) AS shard, doc_id, n_chars,
                 row_number() OVER (PARTITION BY substring(key, 1, 1)
                                    ORDER BY key) AS rk
          FROM k)
        SELECT shard, count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS total_chars,
               sum(rk * (doc_id % 9973))::BIGINT AS order_check
        FROM r GROUP BY shard ORDER BY shard
    """).fetch_arrow_table()
    return sorted(tuple(r.values()) for r in out.to_pylist())


def _rows(ds):
    return sorted(tuple(r.values()) for r in ds.take_all())


def test_train_shards_matches_duckdb_and_is_partition_invariant():
    import ray.data

    from docling_translate_ray.functions.shards import train_shards

    tbl = _corpus()
    want = _oracle(tbl)
    got = _rows(train_shards(ray.data.from_arrow(tbl)))
    assert got == want
    # layout independence: different input blocking + partition count
    got2 = _rows(train_shards(ray.data.from_arrow(tbl).repartition(9),
                              num_partitions=5))
    assert got2 == want
    # all 16 shards populated at this size, counts sum to the corpus
    assert len(got) == 16
    assert sum(r[1] for r in got) == tbl.num_rows


def test_train_shards_two_hex_digits_and_empty():
    import ray.data

    from docling_translate_ray.functions.shards import train_shards

    tbl = _corpus(120)
    got = _rows(train_shards(ray.data.from_arrow(tbl), hex_digits=2))
    assert sum(r[1] for r in got) == 120
    assert all(len(r[0]) == 2 for r in got)
    # finer sharding refines the coarse one: grouping 2-digit shards by
    # their first digit reproduces the 1-digit doc counts
    coarse = {r[0]: r[1] for r in _rows(train_shards(
        ray.data.from_arrow(tbl), hex_digits=1))}
    agg: dict[str, int] = {}
    for shard, n, *_ in got:
        agg[shard[0]] = agg.get(shard[0], 0) + n
    assert agg == coarse

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert _rows(train_shards(ray.data.from_arrow(empty))) == []


def test_train_shards_writer_one_sorted_file_per_shard(tmp_path):
    import ray.data

    from docling_translate_ray.functions.shards import train_shards

    tbl = _corpus(200)
    out = str(tmp_path / "shards")
    stats = {r[0]: r for r in _rows(
        train_shards(ray.data.from_arrow(tbl), out_dir=out))}

    files = sorted(os.listdir(out))
    assert files == sorted(f"shard-{s}.parquet" for s in stats)

    seen_ids = []
    for f in files:
        shard = f[len("shard-"):-len(".parquet")]
        t = pq.read_table(os.path.join(out, f))
        keys = t["key"].to_pylist()
        # within-shard order is the full shuffle-key order, and every
        # key carries its shard as prefix
        assert keys == sorted(keys)
        assert all(k.startswith(shard) for k in keys)
        assert t.num_rows == stats[shard][1]
        seen_ids.extend(t["doc_id"].to_pylist())
    # the shard files partition the corpus exactly
    assert sorted(seen_ids) == sorted(tbl["doc_id"].to_pylist())


def test_train_shards_query_entry_runs(sf_dir):
    from docling_translate_ray.pipelines.queries import q_train_shards

    rows = _rows(q_train_shards(sf_dir))
    assert 0 < len(rows) <= 16
    schema = q_train_shards(sf_dir).schema()
    assert schema.names == ["shard", "n_docs", "total_chars", "order_check"]


@pytest.mark.parametrize("bad", [0, 5])
def test_train_shards_rejects_bad_hex_digits(bad):
    import ray.data

    from docling_translate_ray.functions.shards import train_shards

    with pytest.raises(ValueError):
        train_shards(ray.data.from_arrow(_corpus(10)), hex_digits=bad)
