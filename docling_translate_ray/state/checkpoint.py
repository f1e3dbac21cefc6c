"""Per-partition lineage + checkpoint/resume (north-rule requirement).

The reference's only resume facility is scanning output dir names
(utils.py:126-178).  Here it is explicit and partition-granular:

* output layout: ``out/docs/bucket=<b>/*.parquet`` — one directory per
  url-hash bucket (the resume unit); a failed run leaves whole buckets
  missing, never half-written files visible to the reader (each parquet part
  is written atomically by Arrow).
* lineage: one row per bucket per run in ``out/lineage/…parquet`` —
  ``bucket, doc_count, ok_count, byte_count, failure_urls, run_id`` —
  the Benchmark/StatRecord analog (benchmark.py:73-130) made durable.
* resume: a rerun loads completed bucket ids from lineage and filters them
  out of the input with a broadcast membership probe inside ``map_batches``
  (anti-join against a small side — no shuffle).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

LINEAGE_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("doc_count", pa.int64()),
        ("ok_count", pa.int64()),
        ("error_count", pa.int64()),
        ("byte_count", pa.int64()),
        ("failure_urls", pa.list_(pa.string())),
        ("run_id", pa.string()),
    ]
)


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def docs_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "docs")


def completed_buckets(out_dir: str) -> set[int]:
    """Bucket ids with a lineage row AND an existing output directory."""
    ldir = lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return set()
    files = [os.path.join(ldir, f) for f in os.listdir(ldir) if f.endswith(".parquet")]
    if not files:
        return set()
    done: set[int] = set()
    for f in files:
        t = pq.read_table(f, columns=["bucket"])
        done.update(t["bucket"].to_pylist())
    # trust but verify: the docs partition dir must exist too
    ddir = docs_dir(out_dir)
    return {b for b in done if os.path.isdir(os.path.join(ddir, f"bucket={b}"))}


def filter_completed(ds, done: set[int]):
    """Drop rows whose ``bucket`` is already complete (broadcast anti-join)."""
    if not done:
        return ds
    frozen = frozenset(done)

    def drop(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch["bucket"], value_set=pa.array(list(frozen), pa.int32())))
        return batch.filter(mask)

    return ds.map_batches(drop, batch_format="pyarrow")


def compute_lineage(out_dir: str, run_id: str | None = None) -> pa.Table:
    """Aggregate lineage from the *written* docs output (read-back truth).

    Reads only the narrow columns (column pruning at the read) and
    groupby-aggregates per bucket — the A3/A5 aggregation analog
    (benchmark.py:73-130) expressed over durable output.
    """
    import ray.data

    run_id = run_id or uuid.uuid4().hex[:12]
    ddir = docs_dir(out_dir)
    if not os.path.isdir(ddir):  # empty input → nothing written → empty lineage
        return LINEAGE_SCHEMA.empty_table()
    ds = ray.data.read_parquet(ddir, columns=["bucket", "status", "n_chars", "url"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        ok = df["status"] == "ok"
        agg = (
            df.with_columns(
                ok.cast(pl.Int64).alias("_ok"),
                (~ok).cast(pl.Int64).alias("_err"),
                pl.when(~ok).then(df["url"]).otherwise(None).alias("_fail"),
            )
            .group_by("bucket")
            .agg(
                pl.len().alias("doc_count"),
                pl.col("_ok").sum().alias("ok_count"),
                pl.col("_err").sum().alias("error_count"),
                pl.col("n_chars").sum().alias("byte_count"),
                pl.col("_fail").drop_nulls().alias("failure_urls"),
            )
        )
        return agg.to_arrow()

    # partial per batch (combiner), final per bucket — two-level aggregation
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        fails: list[str] = []
        for lst in g["failure_urls"].to_pylist():
            fails.extend(lst or [])
        return pa.Table.from_pydict(
            {
                # hive read-back may surface the partition col as string
                "bucket": pa.array([int(g["bucket"][0].as_py())], pa.int32()),
                "doc_count": pa.array([pc.sum(g["doc_count"]).as_py()], pa.int64()),
                "ok_count": pa.array([pc.sum(g["ok_count"]).as_py()], pa.int64()),
                "error_count": pa.array([pc.sum(g["error_count"]).as_py()], pa.int64()),
                "byte_count": pa.array([pc.sum(g["byte_count"]).as_py()], pa.int64()),
                "failure_urls": pa.array([fails], pa.list_(pa.string())),
                "run_id": pa.array([run_id], pa.string()),
            },
            schema=LINEAGE_SCHEMA,
        )

    out = partials.groupby("bucket").map_groups(final, batch_format="pyarrow")
    batches = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
               for b in out.iter_batches(batch_format="pyarrow")]
    tbl = pa.concat_tables(batches) if batches else LINEAGE_SCHEMA.empty_table()
    return tbl.cast(LINEAGE_SCHEMA)


def write_lineage(out_dir: str, lineage: pa.Table, run_id: str) -> str:
    ldir = lineage_dir(out_dir)
    os.makedirs(ldir, exist_ok=True)
    path = os.path.join(ldir, f"lineage_{run_id}.parquet")
    tmp = path + ".tmp"
    pq.write_table(lineage, tmp)
    os.replace(tmp, path)  # atomic publish
    return path
