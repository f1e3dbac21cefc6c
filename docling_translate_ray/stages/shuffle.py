"""Hash-partitioned, block-vectorized aggregation.

``Dataset.groupby(key).map_groups(fn)`` calls ``fn`` once **per group** —
fine for dozens of groups, catastrophic for millions (per-group Python
dispatch + one tiny Arrow table each).  The scale pattern used throughout
this engine instead:

1. add ``_pkey = hash(keys) % num_partitions`` (vectorized, process-stable
   polars xxhash — never Python ``hash()``),
2. ``groupby("_pkey")`` — the ONLY shuffle, with ``num_partitions`` groups
   regardless of key cardinality,
3. apply a **block function** once per partition; inside it, finish the
   aggregation vectorized (polars ``group_by`` / ``unique`` over the whole
   partition at once).

Rows with equal keys always share a partition, so any per-key decision made
inside the block is globally correct.  ``num_partitions`` bounds both group
count and per-task memory (partition ≈ rows/num_partitions after upstream
combiners); size it ≥ cluster cores for parallelism.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

PKEY = "_pkey"


def add_pkey(batch: pa.Table, keys: list[str], num_partitions: int, seed: int = 42) -> pa.Table:
    """Append ``_pkey`` = stable hash of the key columns mod num_partitions."""
    import numpy as np
    import polars as pl

    df = pl.from_arrow(batch.select(keys))
    h = df.hash_rows(seed=seed).to_numpy()  # uint64, stable for fixed polars
    pk = (h % np.uint64(num_partitions)).astype(np.int64)
    return batch.append_column(PKEY, pa.array(pk, pa.int64()))


def hash_partition_apply(
    ds,
    keys: list[str],
    block_fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 64,
):
    """Shuffle by ``hash(keys) % num_partitions``; run ``block_fn`` once per
    partition (NOT per group) on the full partition table (``_pkey`` removed).

    ``block_fn`` must itself group by ``keys`` (vectorized) — equal keys are
    guaranteed co-partitioned.
    """

    def _add(batch: pa.Table) -> pa.Table:
        return add_pkey(batch, keys, num_partitions)

    def _apply(part: pa.Table) -> pa.Table:
        return block_fn(part.drop_columns([PKEY]))

    return (
        ds.map_batches(_add, batch_format="pyarrow")
        .groupby(PKEY)
        .map_groups(_apply, batch_format="pyarrow")
    )


def grouped_sum(
    ds,
    keys: list[str],
    partial_exprs,
    sum_cols: dict[str, str],
    num_partitions: int = 64,
):
    """Two-level distributed aggregation, fully vectorized at both levels.

    * partial: per-batch polars ``group_by(keys).agg(partial_exprs)`` —
      the combiner; the shuffle carries one row per (batch, key);
    * final: hash-partition by keys, per-partition polars
      ``group_by(keys).agg(sum)`` renaming ``sum_cols[out_name] = src``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(batch).group_by(keys).agg(*partial_exprs).to_arrow()

    def final(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        out = df.group_by(keys).agg(
            *[pl.col(src).sum().alias(name) for name, src in sum_cols.items()]
        )
        return out.to_arrow()

    return hash_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys,
        final,
        num_partitions=num_partitions,
    )
