"""Column profiling — the engine's ``DESCRIBE``/data-quality op: one
output row per profiled column with row/null/distinct counts and
min/max, in a single pass over the table.

Every serious batch engine ships this (Spark ``describe``, Deequ/
dbt-style profiling); a 100 TB curation run wants it as the first and
last pipeline stage (schema drift, null explosions, key-cardinality
checks) without paying one scan per statistic.

Scale shape — ONE pass, ONE exchange, no driver loops:

1. per-batch combiner MELTS the profiled columns to the narrow table
   ``(col, v, cnt)`` — ``v`` the canonical string form of the value
   (NULL for nulls), ``cnt`` the batch count — deduplicated per batch,
   so a hot value crosses the exchange once per block, never per row;
2. one exchange keyed on ``col`` alone co-locates everything a column's
   profile needs; the block computes rows/nulls (Σ cnt), the exact
   distinct count (unique non-null ``v``), and min/max — numerically
   for integer columns (the canonical string casts back losslessly),
   byte-lexicographically for strings (polars and DuckDB both compare
   UTF-8 bytes).

Supported dtypes: integer and (large_)string — the types whose
canonical string form is identical between polars and DuckDB's
``CAST(x AS VARCHAR)`` (the oracle hash-compares strings; float /
timestamp formatting is engine-specific and therefore refused loudly).

Skew note: a profiled column whose value set is corpus-sized (a key
column) sends its batch-distinct values to ONE partition — `col` is
the partition key by design (the block needs the whole value set for
the exact distinct count).  Profile k columns and the k heaviest
partitions run in parallel; for a single monster column at 100 TB,
swap the exact count for the HLL sketch (functions/sketch.py) — the
plumbing is otherwise identical.

Reference parity: the reference repo has no profiling stage; part of
the beyond-reference training-data operator suite.
"""

from __future__ import annotations

import pyarrow as pa

_MELT_SCHEMA = pa.schema([
    ("col", pa.string()),
    ("v", pa.string()),
    ("cnt", pa.int64()),
])

_OUT_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("n_rows", pa.int64()),
    ("null_cnt", pa.int64()),
    ("n_distinct", pa.int64()),
    ("min_value", pa.string()),
    ("max_value", pa.string()),
])


def profile_columns(ds, columns: list[str], num_partitions: int = 16):
    """Profile ``columns`` of ``ds``; returns a Dataset with one row per
    column: ``(column, n_rows, null_cnt, n_distinct, min_value,
    max_value)`` (min/max as canonical strings, NULL when the column is
    all-null)."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    int_cols = set()
    for c in columns:
        t = types[c]
        if pa.types.is_integer(t):
            int_cols.add(c)
        elif not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            raise TypeError(
                f"profile_columns: column {c!r} has type {t} — only "
                "integer and string columns have an engine-portable "
                "canonical string form (cast floats/timestamps upstream)")

    def melt(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(columns))
        parts = []
        for c in columns:
            parts.append(
                df.select(pl.col(c).cast(pl.String).alias("v"))
                .group_by("v")
                .agg(pl.len().cast(pl.Int64).alias("cnt"))
                .with_columns(pl.lit(c).alias("col"))
                .select(["col", "v", "cnt"])
            )
        return pl.concat(parts).to_arrow().cast(_MELT_SCHEMA)

    def block(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part)
        rows = {k: [] for k in _OUT_SCHEMA.names}
        for (c,), g in df.group_by("col"):
            nn = g.filter(pl.col("v").is_not_null())
            agg = nn.group_by("v").agg(pl.col("cnt").sum())
            if c in int_cols and agg.height:
                ints = agg["v"].cast(pl.Int64)
                mn, mx = str(ints.min()), str(ints.max())
            elif agg.height:
                mn, mx = agg["v"].min(), agg["v"].max()
            else:
                mn = mx = None
            rows["column"].append(c)
            rows["n_rows"].append(int(g["cnt"].sum()))
            rows["null_cnt"].append(
                int(g.filter(pl.col("v").is_null())["cnt"].sum()))
            rows["n_distinct"].append(agg.height)
            rows["min_value"].append(mn)
            rows["max_value"].append(mx)
        return pa.table(rows, schema=_OUT_SCHEMA)

    return hash_partition_apply(
        ds.select_columns(columns).map_batches(
            melt, batch_format="pyarrow"),
        ["col"], block,
        num_partitions=min(num_partitions, max(1, len(columns))),
    )
