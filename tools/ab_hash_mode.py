"""Interleaved same-session A/B of the mixture QUALITY stage's text
hash: md5 (oracle-lockstep) vs xx64 (vectorized production default) —
the round-3 verdict's "per-row md5 loop on full corpus text" weak item,
measured in isolation on the stage that carries it.

The stage is identical apart from hash_mode (quality_batch + hash +
partitioned parquet write over the 960k-page extract), runs alternate
A/B/A/B (the only trustworthy comparison on this host — BASELINE.md),
and each leg streams to its own /tmp dir.

Usage: python tools/ab_hash_mode.py [n_pages] [num_cpus] [trials]
Owns its Ray session. One JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from stress_incremental import ensure_unique_corpus  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                          "worker_process_setup_hook":
                          "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa
    import ray.data

    from docling_translate_ray.functions import text_stats as fts
    from docling_translate_ray.pipelines.extract import run_extract_job

    pages = ensure_unique_corpus(n_pages)
    work = f"/tmp/dtr_ab_hash_{n_pages}"
    extract_dir = os.path.join(work, "extract")
    if not os.path.isdir(os.path.join(extract_dir, "docs")):
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work)
        run_extract_job(pages, extract_dir, layout="shard", resume=False)

    def docs_view(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url", "extracted_text"]))
        return (df.with_columns(pl.col("url").hash(7)
                                .reinterpret(signed=True).alias("doc_id"))
                .rename({"extracted_text": "text"})
                .select(["doc_id", "text"]).to_arrow())

    def quality_leg(mode: str) -> float:
        def quality_flagged(batch: pa.Table) -> pa.Table:
            out = fts.quality_batch(batch, "text")
            out = out.append_column(
                "_h", fts.text_hash_batch(batch["text"], mode=mode))
            return out.append_column(
                "qok", out["quality_ok"].combine_chunks().cast(pa.int32()))

        out_dir = os.path.join(work, f"q_{mode}")
        shutil.rmtree(out_dir, ignore_errors=True)
        docs = ray.data.read_parquet(
            os.path.join(extract_dir, "docs"),
            columns=["url", "extracted_text"],
        ).map_batches(docs_view, batch_format="pyarrow")
        t0 = time.perf_counter()
        docs.map_batches(quality_flagged, batch_format="pyarrow") \
            .write_parquet(out_dir, partition_cols=["qok"])
        return time.perf_counter() - t0

    quality_leg("xx64")  # untimed warmup (worker pool + imports)
    walls: dict[str, list[float]] = {"md5": [], "xx64": []}
    for _ in range(trials):  # strict interleave
        walls["md5"].append(round(quality_leg("md5"), 2))
        walls["xx64"].append(round(quality_leg("xx64"), 2))
    print(json.dumps({
        "n_pages": n_pages, "num_cpus": cpus,
        "md5_secs": walls["md5"], "xx64_secs": walls["xx64"],
        "md5_best": min(walls["md5"]), "xx64_best": min(walls["xx64"]),
        "speedup_xx64_over_md5": round(
            min(walls["md5"]) / min(walls["xx64"]), 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
