"""profile_columns (functions/profile): DuckDB lockstep, nulls,
all-null columns, dtype fence, partition invariance."""

import pyarrow as pa
import pytest


def _tbl():
    return pa.table({
        "k": pa.array([5, 3, 3, None, -7, 100, 5], pa.int64()),
        "s": pa.array(["b", None, "a", "a", "z", None, "b"], pa.string()),
        "all_null": pa.array([None] * 7, pa.string()),
    })


def _run(tbl, cols, num_partitions=4):
    import ray.data

    from docling_translate_ray.functions.profile import profile_columns

    out = profile_columns(ray.data.from_arrow(tbl), cols,
                          num_partitions=num_partitions)
    return (out.to_pandas().sort_values("column").reset_index(drop=True))


def test_duckdb_lockstep():
    import duckdb

    got = _run(_tbl(), ["k", "s"])
    con = duckdb.connect()
    con.register("t", _tbl())
    want = con.execute("""
        SELECT 'k' AS "column", count(*)::BIGINT n_rows,
               (count(*)-count(k))::BIGINT null_cnt,
               count(DISTINCT k)::BIGINT n_distinct,
               CAST(min(k) AS VARCHAR) min_value,
               CAST(max(k) AS VARCHAR) max_value FROM t
        UNION ALL
        SELECT 's', count(*)::BIGINT, (count(*)-count(s))::BIGINT,
               count(DISTINCT s)::BIGINT, min(s), max(s) FROM t
        ORDER BY "column"
    """).fetchdf().reset_index(drop=True)
    assert got.equals(want)
    # negative ints order numerically, not lexically
    krow = got[got["column"] == "k"].iloc[0]
    assert krow.min_value == "-7" and krow.max_value == "100"


def test_all_null_column():
    got = _run(_tbl(), ["all_null"])
    r = got.iloc[0]
    assert r.n_rows == 7 and r.null_cnt == 7 and r.n_distinct == 0
    assert r.min_value is None and r.max_value is None


def test_dtype_fence():
    import ray.data

    from docling_translate_ray.functions.profile import profile_columns

    bad = pa.table({"f": pa.array([1.5], pa.float64())})
    with pytest.raises(TypeError, match="canonical string"):
        profile_columns(ray.data.from_arrow(bad), ["f"])


def test_partition_invariance():
    a = _run(_tbl(), ["k", "s", "all_null"], num_partitions=1)
    b = _run(_tbl(), ["k", "s", "all_null"], num_partitions=3)
    assert a.equals(b)
