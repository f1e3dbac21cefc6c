"""Small shared utilities (no Ray session ownership)."""

from __future__ import annotations


def collect_to_table(ds, empty_schema=None):
    """Materialize a SMALL dataset to one Arrow table on the driver.

    The one sanctioned driver-side collection idiom (bounded inputs only:
    lineage rows, candidate sets, top-k merges).  ``empty_schema`` supplies
    the schema when the dataset yields no batches.
    """
    import pyarrow as pa

    batches = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return empty_schema.empty_table() if empty_schema is not None else pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def warm_imports() -> None:
    """``worker_process_setup_hook`` for SESSION OWNERS (conftest, bench,
    check_contract, stress tools — never the library): import the heavy
    native-extension modules once per worker process BEFORE any UDF
    deserializes.  Guards the flake class where two tasks race the first
    ``import polars`` inside a fresh worker and one observes a
    partially-initialized module ("polars has no attribute Series" —
    seen twice across the round-3 gate runs, never reproduced on
    demand).  Usage::

        ray.init(..., runtime_env={
            "env_vars": {"PYTHONPATH": "/root/repo"},
            "worker_process_setup_hook":
                "docling_translate_ray.util.warm_imports"})

    The ``PYTHONPATH`` entry is required: the hook is resolved by import
    string BEFORE the worker gains the driver's module search path, so
    without it every worker dies with ModuleNotFoundError at startup.
    """
    import duckdb  # noqa: F401
    import numpy  # noqa: F401
    import polars  # noqa: F401
    import pyarrow.compute  # noqa: F401


def auto_pool_size(frac: float = 0.5, reserve: int = 1, cap: int = 16) -> int:
    """Size an actor pool to the cluster, leaving headroom.

    Empirical sandbox finding (Ray 2.49 local mode): an actor pool whose
    ``concurrency × num_cpus`` equals the cluster's total CPUs deadlocks the
    streaming executor — the read/upstream task operators can never get a
    slot.  Always leave ``reserve`` CPUs free and take at most ``frac`` of
    the cluster for one pool so concurrent stages pipeline.
    """
    import ray

    try:
        total = int(ray.cluster_resources().get("CPU", 2))
    except Exception:
        total = 2
    return max(1, min(cap, int(total * frac), total - reserve))


def join_partitions(cap: int = 64) -> int:
    """Safe ``num_partitions`` for ``Dataset.join``.

    Empirical sandbox finding (Ray 2.49): the hash-join operator pins one
    aggregator actor per partition, each reserving a CPU — ``num_partitions
    >= cluster CPUs`` leaves no slot for the upstream map tasks and the job
    deadlocks (reproduced with a 1000-row join at num_partitions=8 on an
    8-CPU cluster).  Use at most half the cluster.
    """
    import ray

    try:
        total = int(ray.cluster_resources().get("CPU", 2))
    except Exception:
        total = 2
    return max(2, min(cap, total // 2))


def compact_partition_dirs(pdirs, sort_keys,
                           max_files_per_partition: int = 1) -> dict:
    """LSM-style maintenance shared by the persistent indexes (MinHash
    band/doc stores, inverted-index postings): merge each partition
    directory's accumulated uuid-named parquet generations into ONE file
    sorted by ``sort_keys`` (the keys present in the table; falls back
    to the first column), deduplicating exact-duplicate rows.

    Crash safety without a manifest: the merged file is renamed VISIBLE
    before the old generations are deleted — a crash can only leave
    duplicate rows, never lose rows; the next run's ``unique()`` merge
    heals the window.  Runs as one Ray task per partition directory.

    Returns ``{"partitions_compacted", "files_before", "files_after"}``.
    """
    import os
    import uuid

    import pyarrow as pa
    import ray.data

    if not pdirs:
        return {"partitions_compacted": 0, "files_before": 0,
                "files_after": 0}

    def compact_one(batch: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.parquet as pq

        done, before, after = [], [], []
        for pdir in batch["pdir"].to_pylist():
            files = sorted(f for f in os.listdir(pdir)
                           if f.endswith(".parquet"))
            if len(files) <= max_files_per_partition:
                done.append(0)
                before.append(len(files))
                after.append(len(files))
                continue
            tbl = pa.concat_tables(
                [pq.read_table(os.path.join(pdir, f)) for f in files],
                promote_options="default")
            keys = [c for c in sort_keys if c in tbl.column_names] \
                or [tbl.column_names[0]]
            merged = (pl.from_arrow(tbl).unique(keep="any")
                      .sort(keys).to_arrow())
            tmp = os.path.join(pdir, f"compact-{uuid.uuid4().hex}.parquet.tmp")
            pq.write_table(merged, tmp)
            os.rename(tmp, tmp[:-4])  # visible BEFORE deleting generations
            for f in files:
                os.remove(os.path.join(pdir, f))
            done.append(1)
            before.append(len(files))
            after.append(1)
        return pa.table({"done": pa.array(done, pa.int64()),
                         "before": pa.array(before, pa.int64()),
                         "after": pa.array(after, pa.int64())})

    stats = ray.data.from_items(
        [{"pdir": p} for p in pdirs]
    ).map_batches(compact_one, batch_format="pyarrow",
                  batch_size=1).materialize()
    return {
        "partitions_compacted": int(stats.sum("done") or 0),
        "files_before": int(stats.sum("before") or 0),
        "files_after": int(stats.sum("after") or 0),
    }
