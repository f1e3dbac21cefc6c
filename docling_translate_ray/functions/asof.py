"""As-of join — an operator Ray Data lacks natively (SURVEY.md §2.4 notes
the reference has no relational joins at all; this is a beyond-reference
primitive a training/eventlog pipeline needs).

Expressed per the custom-operator recipe: both sides are mapped onto ONE
unified schema (left pads a null value column, right pads null left-only
columns), tagged, unioned, **hash-co-partitioned by the `by` key** (one
shuffle), and each partition runs one vectorized ``polars.join_asof``
(backward: latest right row with ``right.on <= left.on``).

Partitioning assumption: all rows of one ``by`` key fit one partition —
the same contract every keyed window/groupby here relies on; skew in
``by`` is bounded by the hot key's own row count.
"""

from __future__ import annotations

import pyarrow as pa

from docling_translate_ray.stages.shuffle import hash_partition_apply

_SIDE = "_asof_side"
_RV = "_asof_rv"


def asof_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    left_cols: list[str],
    right_value_col: str,
    out_name: str | None = None,
    num_partitions: int = 32,
):
    """Backward as-of join: for each left row, the latest right row of the
    same ``by`` key with ``right.on <= left.on``.

    ``left_cols`` must include ``by`` and ``on`` and are carried through;
    the matched right value lands in ``out_name`` (default
    ``asof_<right_value_col>``), null when the key has no earlier right row.
    """
    out_name = out_name or f"asof_{right_value_col}"
    lschema = left_ds.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    rschema = right_ds.schema()
    rv_type = dict(zip(rschema.names, rschema.types))[right_value_col]

    def to_unified(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols: dict[str, pa.Array] = {}
            for c in left_cols:
                if side == 0 or c in (by, on):
                    cols[c] = (
                        batch[c].combine_chunks()
                        if isinstance(batch[c], pa.ChunkedArray) else batch[c]
                    )
                else:
                    cols[c] = pa.nulls(n, ltypes[c])
            cols[_RV] = (
                pa.nulls(n, rv_type) if side == 0
                else batch[right_value_col].cast(rv_type)
            )
            cols[_SIDE] = pa.array([side] * n, pa.int8())
            return pa.table(cols)

        return fn

    left_t = left_ds.select_columns(left_cols).map_batches(
        to_unified(0), batch_format="pyarrow"
    )
    right_keep = list(dict.fromkeys([by, on, right_value_col]))
    right_t = right_ds.select_columns(right_keep).map_batches(
        to_unified(1), batch_format="pyarrow"
    )
    both = left_t.union(right_t)

    def block(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        left = df.filter(pl.col(_SIDE) == 0).select(left_cols).sort([by, on])
        right = (
            df.filter(pl.col(_SIDE) == 1)
            .select([by, on, _RV])
            .rename({on: "_ron"})
            .sort([by, "_ron"])
        )
        joined = left.join_asof(
            right, left_on=on, right_on="_ron", by=by, strategy="backward"
        )
        out = joined.rename({_RV: out_name}).select(left_cols + [out_name])
        return out.to_arrow()

    return hash_partition_apply(both, [by], block, num_partitions=num_partitions)


def range_join_count(
    left_ds,
    right_ds,
    by: str,
    left_on: str,
    right_on: str,
    lower,
    upper,
    left_cols: list[str],
    out_name: str = "n_matches",
    num_partitions: int = 32,
):
    """Range (interval) join with count semantics — the second join
    operator Ray Data lacks natively (with :func:`asof_join`): for every
    left row, the number of right rows of the same ``by`` key whose
    ``right_on`` falls in ``[left_on + lower, left_on + upper)``
    (``lower``/``upper`` are :class:`datetime.timedelta`, may be
    negative).  Left rows with no matches are kept with count 0.

    Kernel: hash-co-partition both sides by ``by`` (ONE shuffle), then a
    **merge-count** per partition — each left row becomes two boundary
    queries (window start/end), queries and right rows are sorted
    together on ``(by, t, side)`` and one cumulative sum of the right
    indicator yields ``count(right_on < X)`` for every boundary; the
    window count is the difference of its two boundaries.  O((n+2m)
    log(n+2m)) per partition, never materializes matched pairs — a
    join_where/IEJoin would build every (purchase, view) pair before
    counting.

    Partitioning assumption (shared with every keyed op here): one
    ``by`` key's rows fit in one partition.
    """
    lschema = left_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    on_type = ltypes[left_on]

    def to_unified(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols: dict[str, pa.Array] = {}
            for c in left_cols:
                if side == 0:
                    a = batch[c]
                    cols[c] = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                elif c == by:
                    a = batch[by]
                    cols[c] = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                else:
                    cols[c] = pa.nulls(n, ltypes[c])
            cols[_RV] = (
                pa.nulls(n, on_type) if side == 0
                else batch[right_on].cast(on_type)
            )
            cols[_SIDE] = pa.array([side] * n, pa.int8())
            return pa.table(cols)

        return fn

    left_t = left_ds.select_columns(left_cols).map_batches(
        to_unified(0), batch_format="pyarrow"
    )
    right_t = right_ds.select_columns(
        list(dict.fromkeys([by, right_on]))
    ).map_batches(to_unified(1), batch_format="pyarrow")
    both = left_t.union(right_t)

    def block(part: pa.Table) -> pa.Table:
        import polars as pl

        lo = pl.duration(microseconds=int(lower.total_seconds() * 1_000_000))
        hi = pl.duration(microseconds=int(upper.total_seconds() * 1_000_000))
        df = pl.from_arrow(part)
        left = (
            df.filter(pl.col(_SIDE) == 0).select(left_cols)
            .with_row_index("_qid")
        )
        right = df.filter(pl.col(_SIDE) == 1).select([by, _RV])
        bounds = pl.concat([
            left.select(
                pl.col(by), (pl.col(left_on) + lo).alias("_t"),
                pl.col("_qid"), pl.lit(-1, dtype=pl.Int64).alias("_sign"),
                pl.lit(0, dtype=pl.Int8).alias("_isr"),
            ),
            left.select(
                pl.col(by), (pl.col(left_on) + hi).alias("_t"),
                pl.col("_qid"), pl.lit(1, dtype=pl.Int64).alias("_sign"),
                pl.lit(0, dtype=pl.Int8).alias("_isr"),
            ),
            right.select(
                pl.col(by), pl.col(_RV).alias("_t"),
                pl.lit(None, dtype=pl.UInt32).alias("_qid"),
                pl.lit(0, dtype=pl.Int64).alias("_sign"),
                pl.lit(1, dtype=pl.Int8).alias("_isr"),
            ),
        ])
        # at tie timestamps queries sort BEFORE right rows, so the running
        # right-count at a query row is exactly count(right_on < X)
        merged = bounds.sort([by, "_t", "_isr"]).with_columns(
            pl.col("_isr").cum_sum().over(by).cast(pl.Int64).alias("_cum")
        )
        counts = (
            merged.filter(pl.col("_isr") == 0)
            .group_by("_qid")
            .agg((pl.col("_cum") * pl.col("_sign")).sum().alias(out_name))
        )
        return (
            left.join(counts, on="_qid", how="left")
            .with_columns(pl.col(out_name).fill_null(0))
            .select(left_cols + [out_name])
            .to_arrow()
        )

    return hash_partition_apply(both, [by], block, num_partitions=num_partitions)
