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


def _record_partition_wall(label: str, rows_in: int, rows_out: int,
                           wall_s: float) -> None:
    """Skew diagnosis hook: when ``DTR_PARTITION_WALL_DIR`` is set (worker
    env — propagate via ``runtime_env={"env_vars": ...}``), every partition
    task appends one JSON line ``{label, rows_in, rows_out, wall_s}`` to a
    pid-unique file there.  Aggregating the files gives the per-partition
    wall histogram of each keyed exchange — the straggler detector for
    skewed keys (hot hosts, template lines).  Off by default; single
    worker-local append per PARTITION (not per row/batch), so the cost is
    nil even when enabled."""
    import json
    import os

    wall_dir = os.environ.get("DTR_PARTITION_WALL_DIR")
    if not wall_dir:
        return
    try:
        with open(os.path.join(wall_dir, f"walls-{os.getpid()}.jsonl"),
                  "a", encoding="utf-8") as f:
            f.write(json.dumps({"label": label, "rows_in": rows_in,
                                "rows_out": rows_out,
                                "wall_s": round(wall_s, 6)}) + "\n")
    except OSError:
        pass  # profiling must never fail the job


def hash_partition_apply(
    ds,
    keys: list[str],
    block_fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 64,
    label: str | None = None,
):
    """Shuffle by ``hash(keys) % num_partitions``; run ``block_fn`` once per
    partition (NOT per group) on the full partition table (``_pkey`` removed).

    ``block_fn`` must itself group by ``keys`` (vectorized) — equal keys are
    guaranteed co-partitioned.

    ``label`` names this exchange in the partition-wall profile (see
    :func:`_record_partition_wall`); defaults to ``keys:block_fn.__name__``.
    """
    wall_label = label or (",".join(keys) + ":" +
                           getattr(block_fn, "__name__", "block"))

    def _add(batch: pa.Table) -> pa.Table:
        return add_pkey(batch, keys, num_partitions)

    def _apply(part: pa.Table) -> pa.Table:
        import time

        t0 = time.perf_counter()
        out = block_fn(part.drop_columns([PKEY]))
        _record_partition_wall(wall_label, part.num_rows, out.num_rows,
                               time.perf_counter() - t0)
        return out

    return (
        ds.map_batches(_add, batch_format="pyarrow")
        .groupby(PKEY)
        .map_groups(_apply, batch_format="pyarrow")
    )


class PersistedDataset:
    """Handle over a dataset spilled to scratch parquet by
    :func:`persist_dataset`: call with a column list for a PRUNED
    re-read; ``num_rows`` is the exact row count (parquet footers —
    no Ray job)."""

    def __init__(self, out_dir: str, files: list[str],
                 empty_schema: pa.Schema):
        import pyarrow.parquet as pq

        self._dir, self._files = out_dir, files
        self._empty = empty_schema
        self.num_rows = sum(
            pq.ParquetFile(f).metadata.num_rows for f in files)

    def __call__(self, columns: list[str]):
        import ray.data

        if not self._files:
            return ray.data.from_arrow(
                self._empty.empty_table().select(columns))
        return ray.data.read_parquet(self._dir, columns=columns)


def persist_dataset(ds, scratch_prefix: str, scratch_dir: str | None,
                    empty_schema: pa.Schema) -> PersistedDataset:
    """Write a (corpus-sized) dataset to scratch parquet ONCE and return
    a pruned-re-read handle.

    A Ray Dataset consumed by TWO downstream chains re-executes its
    whole lineage per consumer — for the explode-heavy dedup/template
    operators that means the corpus scan + per-doc explode (the most
    expensive pass) runs twice (the mirror_hosts standing rule,
    BASELINE.md round 4).  Durable scratch parquet pays one compressed
    write instead, and each consumer re-reads only the COLUMNS it needs.

    The scratch dir must outlive consumption of the returned datasets;
    pass ``scratch_dir`` to own the lifecycle (pipelines pass their work
    dir), else a process-lifetime tempdir is used.  Multi-node: the dir
    must be on worker-reachable shared storage (the composites'
    standing ``work_dir`` contract).
    """
    import os
    import tempfile

    if scratch_dir is None:
        scratch_dir = tempfile.mkdtemp(prefix=scratch_prefix)
    out = os.path.join(scratch_dir, "exploded")
    os.makedirs(out, exist_ok=True)
    ds.write_parquet(out)
    files = [os.path.join(out, f) for f in sorted(os.listdir(out))
             if f.endswith(".parquet")]
    return PersistedDataset(out, files, empty_schema)


def hash_partition_apply_spill(
    ds,
    keys: list[str],
    block_fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 64,
    scratch_dir: str | None = None,
    label: str | None = None,
    empty_schema: pa.Schema | None = None,
):
    """:func:`hash_partition_apply`, but the exchange SPILLS through
    scratch parquet instead of riding the object store.
    ``empty_schema`` is the pre-``block_fn`` schema used to replay the
    block on a fully empty input (an empty dataset's ``schema()`` can
    be ``None``, so it can't be inferred).

    The plasma variant holds the whole shuffled table in object-store
    memory at the exchange barrier (hash_embed's 39M sparse rows peaked
    2.6 GiB at 960k pages).  Here the map side writes hive-partitioned
    parquet (``_pkey=<p>/``) — compressed, streamed block by block —
    and the reduce side is one task per partition reading ONLY its own
    directory, so peak object-store memory is bounded by in-flight
    read/write blocks, not the table.  Same contract as
    :func:`hash_partition_apply`: ``block_fn`` runs once per partition
    with equal keys co-partitioned, ``_pkey`` never reaches it.

    Trade-off: one durable write + one read of the (compressed)
    exchange table vs zero disk in the plasma path — use for
    corpus-sized exchanges; the scratch dir must outlive consumption
    of the returned (lazy) dataset.  Multi-node: ``scratch_dir`` must
    be on storage every worker can reach (the composite pipelines'
    standing ``work_dir`` contract) — a driver-local /tmp default only
    works single-node.
    """
    import os
    import tempfile

    import ray.data

    wall_label = label or (",".join(keys) + ":" +
                           getattr(block_fn, "__name__", "block") + ":spill")
    if scratch_dir is None:
        scratch_dir = tempfile.mkdtemp(prefix="dtr_spill_")
    out = os.path.join(scratch_dir, "exchange")
    os.makedirs(out, exist_ok=True)
    ds.map_batches(
        lambda b: add_pkey(b, keys, num_partitions), batch_format="pyarrow"
    ).write_parquet(out, partition_cols=[PKEY])

    parts = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(out)
        if d.startswith(f"{PKEY}="))
    if not parts:  # empty input: replay block_fn on the empty schema
        schema = ds.schema()
        base = (schema.base_schema if schema is not None else empty_schema)
        if base is None:
            return ray.data.from_items([])
        return ray.data.from_arrow(block_fn(base.empty_table()))

    def apply_part(batch: pa.Table) -> pa.Table:
        import time

        import pyarrow.parquet as pq

        outs = []
        for p in batch["part"].to_pylist():
            part = pq.read_table(os.path.join(out, f"{PKEY}={p}"))
            t0 = time.perf_counter()
            res = block_fn(part)
            _record_partition_wall(wall_label, part.num_rows, res.num_rows,
                                   time.perf_counter() - t0)
            outs.append(res)
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_items(
        [{"part": p} for p in parts]
    ).map_batches(apply_part, batch_format="pyarrow", batch_size=1)


def distinct(ds, cols: list[str], num_partitions: int = 64):
    """Exact DISTINCT over ``cols`` (``ds.unique`` analog, scale path):
    per-batch combiner (local unique) → hash-partitioned global unique —
    duplicate rows never cross the exchange more than once per batch."""

    def local_unique(batch: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(batch.select(cols)).unique(keep="any").to_arrow()

    def block(part: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(part).unique(keep="any").to_arrow()

    return hash_partition_apply(
        ds.map_batches(local_unique, batch_format="pyarrow"),
        cols, block, num_partitions=num_partitions,
    )


def partition_join(left_ds, right_ds, on: list[str], how: str = "left",
                   num_partitions: int = 32):
    """Equi-join via hash co-partitioning + one vectorized polars join per
    partition — replaces ``Dataset.join`` where its aggregator-actor
    operator underperforms (measured: 192k wide docs ⋈ 76k rows took 66 s
    through ``Dataset.join`` vs ~10 s through this path at 32 CPUs).

    Non-key columns must be disjoint between the sides (no suffixing);
    each side is padded with typed nulls onto the unified schema, tagged,
    unioned, partitioned by ``hash(on)``, then polars-joined per
    partition.  ``how`` ∈ {"left", "inner", "semi", "anti"} — semi/anti
    return the LEFT columns only (existence filter; the right side's
    non-key columns are ignored), which is the distributed path for
    survivor-selection / drop-set subtraction without any broadcast.
    """
    assert how in ("left", "inner", "semi", "anti")
    lsch, rsch = left_ds.schema(), right_ds.schema()
    if lsch is None:  # empty/unknown left — nothing to join in any mode
        return left_ds
    if rsch is None:  # empty/unknown right side (e.g. a filter matched nothing)
        if how in ("left", "anti"):
            return left_ds          # anti: nothing to subtract; left: no matches
        if how == "semi":
            return left_ds.limit(0)  # nothing can match
        raise ValueError(
            "partition_join: right side has no schema (empty dataset) — an "
            "inner join needs the right columns; filter/short-circuit upstream"
        )
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    overlap = (set(ltypes) & set(rtypes)) - set(on)
    assert not overlap, f"non-key columns must be disjoint, got {overlap}"
    lcols = list(lsch.names)
    rextra = [c for c in rsch.names if c not in on]
    unified = lcols + rextra

    def to_unified(side: int, types_here: dict):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols: dict[str, pa.Array] = {}
            for c in unified:
                if c in batch.column_names:
                    a = batch[c]
                    cols[c] = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                else:
                    cols[c] = pa.nulls(n, ltypes.get(c) or rtypes.get(c))
            cols["_side"] = pa.array([side] * n, pa.int8())
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(to_unified(0, ltypes), batch_format="pyarrow").union(
        right_ds.map_batches(to_unified(1, rtypes), batch_format="pyarrow")
    )

    def block(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        left = df.filter(pl.col("_side") == 0).select(lcols)
        if how in ("semi", "anti"):
            right = df.filter(pl.col("_side") == 1).select(on).unique()
            return left.join(right, on=on, how=how).select(lcols).to_arrow()
        right = df.filter(pl.col("_side") == 1).select(on + rextra)
        return left.join(right, on=on, how=how).select(unified).to_arrow()

    return hash_partition_apply(both, on, block, num_partitions=num_partitions)


def id_filter_join(ds, ids_ds, id_column: str = "doc_id", how: str = "semi",
                   max_broadcast: int = 2_000_000, num_partitions: int = 32):
    """Semi/anti filter of ``ds`` by an id set, broadcast-or-exchange
    (the ``strategy='auto'`` pattern for survivor-selection / drop-set
    subtraction): the id side — narrow int64 rows by construction — is
    materialized ONCE (count + reuse, never recomputed); while it fits
    ``max_broadcast`` rows (~8 B/row) it broadcasts via ``ray.put`` and
    ``ds`` filters locally with a vectorized ``is_in``, so the corpus
    side (typically full document rows) never crosses an exchange; past
    the budget it falls back to the hash-partitioned
    :func:`partition_join`, feeding it the already-materialized id side.
    """
    import ray

    import pyarrow.compute as pc

    from docling_translate_ray.util import collect_to_table

    assert how in ("semi", "anti")
    ids_only = ids_ds.select_columns([id_column]).materialize()
    if ids_only.count() > max_broadcast:
        return partition_join(ds, ids_only, on=[id_column], how=how,
                              num_partitions=num_partitions)
    isch = ids_only.schema()
    id_type = (isch.types[isch.names.index(id_column)]
               if isch is not None else pa.int64())
    tbl = collect_to_table(
        ids_only, empty_schema=pa.schema([(id_column, id_type)]))
    # drop nulls from the value set: pc.is_in would otherwise MATCH null
    # keys against a null set entry (skip_nulls defaults to False),
    # while the polars join on the exchange path never matches nulls —
    # the two paths must stay row-identical (parity-pinned in tests)
    ref = ray.put(tbl[id_column].combine_chunks().drop_null())

    def filter_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        mask = pc.is_in(batch[id_column], value_set=_ray.get(ref))
        if how == "anti":
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filter_batch, batch_format="pyarrow")


def broadcast_join(left_ds, right_ds, on: list[str], how: str = "inner",
                   max_broadcast: int = 2_000_000,
                   max_broadcast_bytes: int = 256 * 1024 * 1024,
                   num_partitions: int = 32):
    """Map-side equi-join, broadcast-or-exchange: the RIGHT side is
    materialized once (count + reuse); while it fits ``max_broadcast``
    rows it travels via ``ray.put`` and every left batch polars-joins
    against it locally — the left side (typically the big / wide corpus
    side) never crosses an exchange.  Past the budget it falls back to
    the hash-partitioned :func:`partition_join`, feeding it the
    already-materialized right side.  Semantics and output schema are
    identical to ``partition_join`` on the same inputs (parity-pinned in
    ``tests/test_shuffle.py``): non-key columns disjoint, output columns
    = left columns + right non-key columns, duplicate right keys fan
    out, null keys never match.  At 100 TB this is the dimension-table
    join (lang codes, per-term vocab stats, per-host aggregates under
    the budget); corpus-sized right sides take the fallback.
    """
    assert how in ("inner", "left")
    lsch = left_ds.schema()
    if lsch is None:
        return left_ds
    # materialize FIRST, read the schema from the materialized dataset
    # (free) — right_ds.schema() on a lazy shuffle output would execute
    # the pipeline once just to learn the schema, then materialize()
    # would run it again
    right = right_ds.materialize()
    rsch = right.schema()
    if rsch is None:  # mirror partition_join's empty-right contract
        if how == "left":
            return left_ds
        raise ValueError(
            "broadcast_join: right side has no schema (empty dataset) — an "
            "inner join needs the right columns; filter/short-circuit upstream"
        )
    overlap = (set(lsch.names) & set(rsch.names)) - set(on)
    assert not overlap, f"non-key columns must be disjoint, got {overlap}"

    # row cap AND byte cap: a row-count budget alone would broadcast a
    # 1.9M-row table of text-sized columns; size_bytes() on a
    # materialized dataset is metadata, not a scan
    if (right.count() > max_broadcast
            or (right.size_bytes() or 0) > max_broadcast_bytes):
        return partition_join(left_ds, right, on=on, how=how,
                              num_partitions=num_partitions)

    import ray

    from docling_translate_ray.util import collect_to_table

    rtbl = collect_to_table(
        right, empty_schema=pa.schema(list(zip(rsch.names, rsch.types))))
    ref = ray.put(rtbl)
    lcols = list(lsch.names)
    rextra = [c for c in rsch.names if c not in on]
    out_schema = pa.schema(
        [(c, t) for c, t in zip(lsch.names, lsch.types)]
        + [(c, rsch.types[rsch.names.index(c)]) for c in rextra])

    def join_batch(batch: pa.Table) -> pa.Table:
        import polars as pl
        import ray as _ray

        r = pl.from_arrow(_ray.get(ref))
        out = (pl.from_arrow(batch)
               .join(r, on=on, how=how, maintain_order="left")
               .select(lcols + rextra).to_arrow())
        # polars emits large_string/large_binary; pin the exchange-path schema
        return out.cast(out_schema)

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


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
