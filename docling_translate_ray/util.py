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
