"""Corpus-scale cost of the zlib compressibility gate (curate stage 0d).

Two measurements at 960k pages / 32 CPUs, both over the SAME extracted
docs so the numbers are comparable:

1. **Kernel pass** — one ``compression_ratio_batch`` map_batches over
   all docs (count survivors).  The gate's intrinsic cost: per-row
   ``zlib.compress`` is GIL-releasing C, so this should scale with
   corpus bytes / (cores x ~100 MB/s).
2. **Interleaved end-to-end A/B** — ``curate_docs`` with
   ``compress_filter`` off, on, off, on (fresh work dirs, resume off).
   The decision-relevant number: what does ``--compress-filter`` add to
   a full curation run?  Interleaved legs because this host swings
   2-3x (BASELINE.md bench-discipline note).

Usage: python tools/stress_compress.py [n_pages] [num_cpus]
Owns its Ray session.  Results go to stdout as one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_curate import ensure_corpus  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

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
    import pyarrow.compute as pc

    import ray.data

    from docling_translate_ray.functions.text_stats import (
        compression_ratio_batch,
    )
    from docling_translate_ray.pipelines.curate import curate_docs
    from docling_translate_ray.pipelines.extract import run_extract_job

    pages = ensure_corpus(n_pages)
    work = f"/tmp/dtr_stress_compress_{n_pages}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    t0 = time.perf_counter()
    run_extract_job(pages, os.path.join(work, "extract"), layout="shard",
                    resume=False)
    t_extract = time.perf_counter() - t0

    def docs_view(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url", "extracted_text"]))
        return (
            df.with_columns(pl.col("url").hash(7).reinterpret(signed=True)
                            .alias("doc_id"))
            .rename({"extracted_text": "text"})
            .select(["doc_id", "text"])
            .to_arrow()
        )

    def docs_ds():
        return ray.data.read_parquet(
            os.path.join(work, "extract", "docs"),
            columns=["url", "extracted_text"],
        ).map_batches(docs_view, batch_format="pyarrow")

    # 1. kernel pass: the gate alone over every doc
    t1 = time.perf_counter()
    gated = docs_ds().map_batches(compression_ratio_batch,
                                  batch_format="pyarrow")
    agg = gated.map_batches(
        lambda b: pa.table({
            "n": [len(b)],
            "n_ok": [pc.sum(pc.cast(b["compress_ok"], pa.int64())).as_py()
                     or 0],
            "bytes": [pc.sum(b["n_bytes"]).as_py() or 0],
        }),
        batch_format="pyarrow",
    ).to_pandas()  # one tiny row per block
    n_docs = int(agg["n"].sum())
    n_ok = int(agg["n_ok"].sum())
    total_bytes = int(agg["bytes"].sum())
    t_kernel = time.perf_counter() - t1

    # 2. interleaved end-to-end A/B: curate with the gate off/on/off/on
    walls: dict[str, list[float]] = {"off": [], "on": []}
    stats_by_arm: dict[str, dict] = {}
    for leg, flag in enumerate([False, True, False, True]):
        arm = "on" if flag else "off"
        leg_dir = os.path.join(work, f"leg_{leg}")
        t = time.perf_counter()
        _, stats = curate_docs(docs_ds(), work_dir=leg_dir,
                               compress_filter=flag)
        walls[arm].append(round(time.perf_counter() - t, 1))
        stats_by_arm[arm] = stats
        shutil.rmtree(leg_dir, ignore_errors=True)

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    print(json.dumps({
        "pages": n_pages, "num_cpus": cpus,
        "extract_sec": round(t_extract, 1),
        "kernel_sec": round(t_kernel, 1),
        "kernel_docs_per_sec": round(n_docs / t_kernel, 1),
        "kernel_mb_per_sec": round(total_bytes / t_kernel / 1e6, 1),
        "n_docs": n_docs, "n_compress_ok": n_ok,
        "corpus_mb": round(total_bytes / 1e6, 1),
        "curate_off_sec": walls["off"],
        "curate_on_sec": walls["on"],
        "on_over_off": round(mean(walls["on"]) / mean(walls["off"]), 3),
        "stats_off": stats_by_arm["off"],
        "stats_on": stats_by_arm["on"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
