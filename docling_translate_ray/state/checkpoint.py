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


SHARD_LINEAGE_SCHEMA = pa.schema(
    [
        ("shard", pa.string()),
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
    files = [
        os.path.join(ldir, f)
        for f in os.listdir(ldir)
        if f.endswith(".parquet") and not f.startswith("shard_lineage_")
    ]
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


def write_bucketed(ds, dest_dir: str, run_id: str):
    """Consolidating bucket writer: shuffle by ``bucket``, ONE parquet file
    per bucket per run, lineage row returned from the same pass.

    Why not ``write_parquet(partition_cols=["bucket"])``: that splits every
    task's block by bucket value — measured 3,963 files for 12k docs over 64
    buckets (write tasks × buckets), which then makes any read-back pay ~4k
    file opens.  Here the ``groupby("bucket")`` exchange is the one shuffle;
    each group task atomically publishes ``bucket=<b>/part-<run_id>.parquet``
    (tmp + rename), deletes stale part files from earlier failed runs
    (idempotent per-bucket overwrite), and returns the bucket's lineage row —
    so the job needs NO second read-back pass over the data.

    Sizing: one bucket = one task's heap; choose ``n_buckets`` so corpus/n
    is a few hundred MB at most.  Returns a (tiny) lineage Dataset.
    """

    def write_group(g: pa.Table) -> pa.Table:
        bucket = int(g["bucket"][0].as_py())
        body = g.drop_columns(["bucket"])  # dirname carries the value (hive)
        bdir = os.path.join(dest_dir, f"bucket={bucket}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"part-{run_id}.parquet")
        tmp = path + ".tmp"
        pq.write_table(body, tmp, compression="zstd")
        os.replace(tmp, path)  # atomic publish
        for f in os.listdir(bdir):  # stale parts from failed runs
            if f.endswith(".parquet") and f != os.path.basename(path):
                os.remove(os.path.join(bdir, f))
        ok = pc.equal(g["status"], "ok")
        n_ok = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
        fails = [u for u, o in zip(g["url"].to_pylist(), ok.to_pylist()) if not o]
        return pa.Table.from_pydict(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "doc_count": pa.array([g.num_rows], pa.int64()),
                "ok_count": pa.array([n_ok], pa.int64()),
                "error_count": pa.array([g.num_rows - n_ok], pa.int64()),
                "byte_count": pa.array(
                    [pc.sum(g["n_chars"]).as_py() or 0], pa.int64()
                ),
                "failure_urls": pa.array([fails], pa.list_(pa.string())),
                "run_id": pa.array([run_id], pa.string()),
            },
            schema=LINEAGE_SCHEMA,
        )

    return ds.groupby("bucket").map_groups(write_group, batch_format="pyarrow")


def collect_lineage(lineage_ds, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (one-row-per-partition) lineage Dataset to Arrow."""
    schema = schema or LINEAGE_SCHEMA
    batches = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in lineage_ds.iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return schema.empty_table()
    tbl = pa.concat_tables(
        [b.select(schema.names) for b in batches], promote_options="default"
    )
    return tbl.cast(schema)


def shard_key(path: str) -> str:
    """Stable shard id for a source file: its basename without extension."""
    base = os.path.basename(path)
    return base[:-8] if base.endswith(".parquet") else base


def completed_shards(out_dir: str) -> set[str]:
    """Shard keys with a lineage row AND an existing output directory."""
    ldir = lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return set()
    files = [
        os.path.join(ldir, f)
        for f in os.listdir(ldir)
        if f.endswith(".parquet") and f.startswith("shard_lineage_")
    ]
    done: set[str] = set()
    for f in files:
        done.update(pq.read_table(f, columns=["shard"])["shard"].to_pylist())
    ddir = docs_dir(out_dir)
    return {s for s in done if os.path.isdir(os.path.join(ddir, f"shard={s}"))}


def normalize_arrow_types(tbl: pa.Table) -> pa.Table:
    """Downcast polars' large_* types to standard Arrow types before writing.

    A polars round-trip (partition_by etc.) upgrades string/binary/list to
    their large_ variants; written to parquet, a later read-back then fails
    to join against plain-typed columns (ArrowInvalid: large_string vs
    string — hit in the 192k-page scored-join stress run).  Normalizing at
    the sink keeps every durable schema canonical.
    """

    def fix(t: pa.DataType) -> pa.DataType:
        if pa.types.is_large_string(t):
            return pa.string()
        if pa.types.is_large_binary(t):
            return pa.binary()
        if pa.types.is_large_list(t) or pa.types.is_list(t):
            return pa.list_(fix(t.value_type))
        if pa.types.is_struct(t):
            return pa.struct([pa.field(f.name, fix(f.type)) for f in t])
        return t

    schema = pa.schema([pa.field(f.name, fix(f.type)) for f in tbl.schema])
    return tbl.cast(schema) if schema != tbl.schema else tbl


class ShardWriter:
    """Stateless write stage for the NO-SHUFFLE shard layout.

    Each batch is split by its ``path`` provenance column (``read_parquet(...,
    include_paths=True)``) and appended to ``dest/shard=<key>/`` as one part
    file per (batch, shard); the stage's OUTPUT is the tiny per-(batch, shard)
    lineage partial — the doc payload never crosses an exchange.  Output file
    count = O(blocks), not O(blocks × partitions).

    Downstream: ``groupby(shard)`` over the partials (rows ≈ blocks) makes
    the final lineage rows — the only exchange in the job, bytes ≈ KB.
    """

    def __init__(self, dest_dir: str, run_id: str, key_column: str = "path",
                 key_is_path: bool = True) -> None:
        self.dest = dest_dir
        self.run_id = run_id
        self.key_column = key_column
        self.key_is_path = key_is_path

    def __call__(self, batch: pa.Table) -> pa.Table:
        import uuid

        import polars as pl

        out: dict[str, list] = {k: [] for k in
                                ("shard", "doc_count", "ok_count", "error_count",
                                 "byte_count", "failure_urls", "run_id")}
        if batch.num_rows == 0:
            return pa.Table.from_pydict(out, schema=SHARD_LINEAGE_SCHEMA)
        df = pl.from_arrow(batch)
        for part in df.partition_by(self.key_column):
            raw = part[self.key_column][0]
            key = shard_key(raw) if self.key_is_path else str(raw)
            body = normalize_arrow_types(part.drop(self.key_column).to_arrow())
            sdir = os.path.join(self.dest, f"shard={key}")
            os.makedirs(sdir, exist_ok=True)
            name = f"part-{self.run_id}-{uuid.uuid4().hex[:8]}.parquet"
            path = os.path.join(sdir, name)
            pq.write_table(body, path + ".tmp", compression="zstd")
            os.replace(path + ".tmp", path)
            ok = part["status"] == "ok"
            n_ok = int(ok.sum())
            out["shard"].append(key)
            out["doc_count"].append(part.height)
            out["ok_count"].append(n_ok)
            out["error_count"].append(part.height - n_ok)
            out["byte_count"].append(int(part["n_chars"].sum()))
            out["failure_urls"].append(part.filter(~ok)["url"].to_list())
            out["run_id"].append(self.run_id)
        return pa.Table.from_pydict(out, schema=SHARD_LINEAGE_SCHEMA)


def compact_shards(dest_dir: str, min_files: int = 2) -> dict:
    """Maintenance op for the shard layout's small-files problem: merge each
    ``shard=*/`` directory with ≥ ``min_files`` part files into ONE zstd
    part file (read → concat → atomic write → remove old parts).

    Runs as a Ray task per shard (embarrassingly parallel, no exchange);
    safe to RE-RUN (idempotent), but it is an **offline maintenance op**:
    run it only while no readers scan the dest dir.  Between publishing
    the merged file and removing the old parts, a reader that lists the
    shard directory would see every row twice, and a reader that listed
    before compaction hits FileNotFound on the removed parts.  (A fully
    concurrent version would swap at directory granularity — write the
    merged output to a new shard dir and rename — at the cost of breaking
    the stable ``shard=<key>`` addressing that resume relies on.)
    Returns {shards_compacted, files_removed}.
    """
    import ray

    if not os.path.isdir(dest_dir):
        return {"shards_compacted": 0, "files_removed": 0}
    targets = []
    for d in sorted(os.listdir(dest_dir)):
        sdir = os.path.join(dest_dir, d)
        if not (d.startswith("shard=") and os.path.isdir(sdir)):
            continue
        parts = sorted(
            os.path.join(sdir, f) for f in os.listdir(sdir) if f.endswith(".parquet")
        )
        if len(parts) >= min_files:
            targets.append((sdir, parts))

    @ray.remote
    def _compact(sdir: str, parts: list[str]) -> int:
        tbl = pa.concat_tables([pq.read_table(p) for p in parts])
        out = os.path.join(sdir, "part-compacted.parquet")
        pq.write_table(tbl, out + ".tmp", compression="zstd")
        os.replace(out + ".tmp", out)
        removed = 0
        for p in parts:
            if os.path.basename(p) != "part-compacted.parquet":
                os.remove(p)
                removed += 1
        return removed

    removed = sum(ray.get([_compact.remote(s, p) for s, p in targets]))
    return {"shards_compacted": len(targets), "files_removed": removed}


def finalize_shard_lineage_local(partials: pa.Table) -> pa.Table:
    """Driver-side partials → one row per shard (rows ≈ blocks, KB-sized)."""
    import polars as pl

    if partials.num_rows == 0:
        return SHARD_LINEAGE_SCHEMA.empty_table()
    agg = (
        pl.from_arrow(partials)
        .group_by("shard")
        .agg(
            pl.col("doc_count").sum(),
            pl.col("ok_count").sum(),
            pl.col("error_count").sum(),
            pl.col("byte_count").sum(),
            pl.col("failure_urls").flatten().drop_nulls().alias("failure_urls"),
            pl.col("run_id").first(),
        )
        .sort("shard")
    )
    return agg.to_arrow().select(SHARD_LINEAGE_SCHEMA.names).cast(SHARD_LINEAGE_SCHEMA)


def write_shard_lineage(out_dir: str, lineage: pa.Table, run_id: str) -> str:
    ldir = lineage_dir(out_dir)
    os.makedirs(ldir, exist_ok=True)
    path = os.path.join(ldir, f"shard_lineage_{run_id}.parquet")
    tmp = path + ".tmp"
    pq.write_table(lineage.cast(SHARD_LINEAGE_SCHEMA), tmp)
    os.replace(tmp, path)
    return path


def load_shard_lineage(out_dir: str) -> pa.Table:
    ldir = lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return SHARD_LINEAGE_SCHEMA.empty_table()
    files = [
        os.path.join(ldir, f)
        for f in os.listdir(ldir)
        if f.endswith(".parquet") and f.startswith("shard_lineage_")
    ]
    if not files:
        return SHARD_LINEAGE_SCHEMA.empty_table()
    tbl = pa.concat_tables([pq.read_table(f) for f in files]).cast(SHARD_LINEAGE_SCHEMA)
    import polars as pl

    return (
        pl.from_arrow(tbl).unique(subset=["shard"], keep="first").sort("shard")
        .to_arrow().cast(SHARD_LINEAGE_SCHEMA)
    )


def load_lineage(out_dir: str) -> pa.Table:
    """All lineage rows across runs, one row per bucket (runs of a bucket are
    idempotent, so any run's row is authoritative)."""
    ldir = lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return LINEAGE_SCHEMA.empty_table()
    files = [
        os.path.join(ldir, f)
        for f in os.listdir(ldir)
        if f.endswith(".parquet") and not f.startswith("shard_lineage_")
    ]
    if not files:
        return LINEAGE_SCHEMA.empty_table()
    tbl = pa.concat_tables([pq.read_table(f) for f in files]).cast(LINEAGE_SCHEMA)
    import polars as pl

    return (
        pl.from_arrow(tbl).unique(subset=["bucket"], keep="first").sort("bucket")
        .to_arrow().cast(LINEAGE_SCHEMA)
    )


def compute_lineage(out_dir: str, run_id: str | None = None) -> pa.Table:
    """Aggregate lineage from the *written* docs output (read-back truth).

    Audit/repair utility — the hot path computes lineage in the write pass
    (:func:`write_bucketed`); use this to re-derive lineage when the lineage
    dir is lost or to cross-check output integrity.

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


def _hash_probe() -> str:
    """Fingerprint of the url-hash kernel actually in use: hash a fixed
    probe string through the SAME code path that assigns buckets
    (stages.extract._hash64_str = polars xxhash).  Bucket-layout resume is
    only valid while this fingerprint is stable — a polars upgrade that
    changes xxhash output would silently re-bucket every url, duplicating
    docs into new buckets while lineage marks the old ones complete."""
    from docling_translate_ray.stages.extract import _hash64_str

    probe = pa.array(["dtr-bucket-probe-v1", "잡종-βüñ"], pa.string())
    vals = _hash64_str(probe).to_pylist()
    return ":".join(f"{v & 0xFFFFFFFFFFFFFFFF:016x}" for v in vals)


def write_job_meta(out_dir: str, layout: str, n_buckets: int | None,
                   speed_mode: str = "accurate") -> None:
    """Record the partitioning parameters so a resume with INCOMPATIBLE
    parameters fails loudly instead of silently skipping wrong partitions
    (bucket ids from n_buckets=64 mean nothing under n_buckets=16; bucket
    ids from a different hash-kernel version mean nothing either — the
    probe hash pins the kernel, not just the declared library version)."""
    import json

    import polars as pl

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "job_meta.json")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "layout": layout,
                    "n_buckets": n_buckets,
                    "speed_mode": speed_mode,
                    "polars_version": pl.__version__,
                    "hash_probe": _hash_probe(),
                },
                f,
            )
        os.replace(tmp, path)


def check_job_meta(out_dir: str, layout: str, n_buckets: int | None,
                   speed_mode: str = "accurate") -> None:
    import json

    path = os.path.join(out_dir, "job_meta.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        meta = json.load(f)
    if meta.get("layout") != layout or (
        layout == "bucket" and meta.get("n_buckets") != n_buckets
    ):
        raise ValueError(
            f"resume parameter mismatch for {out_dir}: existing output was "
            f"written with layout={meta.get('layout')!r} "
            f"n_buckets={meta.get('n_buckets')}, this run requests "
            f"layout={layout!r} n_buckets={n_buckets}; use a fresh out_dir "
            "or matching parameters (bucket ids are not comparable across "
            "bucketings)"
        )
    want_mode = meta.get("speed_mode")
    if want_mode is not None and want_mode != speed_mode:
        raise ValueError(
            f"resume speed-mode mismatch for {out_dir}: existing output was "
            f"extracted with speed_mode={want_mode!r}, this run requests "
            f"{speed_mode!r} — resuming would mix fidelity profiles in one "
            "output; use a fresh out_dir or the original mode"
        )
    # meta written before the probe existed carries no fingerprint; only
    # enforce when present (old outputs stay resumable on the same install)
    want_probe = meta.get("hash_probe")
    if layout == "bucket" and want_probe is not None:
        have = _hash_probe()
        if have != want_probe:
            import polars as pl

            raise ValueError(
                f"resume hash-kernel mismatch for {out_dir}: existing "
                f"buckets were assigned by a url-hash kernel fingerprinted "
                f"{want_probe} (polars {meta.get('polars_version')}), this "
                f"environment produces {have} (polars {pl.__version__}). "
                "Resuming would re-bucket urls and duplicate documents; "
                "re-run into a fresh out_dir (or pin the original polars)."
            )


def write_lineage(out_dir: str, lineage: pa.Table, run_id: str) -> str:
    ldir = lineage_dir(out_dir)
    os.makedirs(ldir, exist_ok=True)
    path = os.path.join(ldir, f"lineage_{run_id}.parquet")
    tmp = path + ".tmp"
    pq.write_table(lineage, tmp)
    os.replace(tmp, path)  # atomic publish
    return path
