"""Corpus-scale stress of the data-SELECTION composite: extract 960k
pages, then run the mixture builder (quality gate → DSIR importance
scores → 50% token-budget selection → α=0.5 language rebalancing) over
the extracted docs, recording per-phase wall time and PEAK object-store
usage — the selection-family counterpart of tools/stress_curate.py.

Confirms zero driver-side materialization at scale: every stage is
parquet→parquet; the only driver state is the 256-row DSIR weight
table, the score-cardinality histogram of the budget refinement, and
the per-language quota dict.

Usage: python tools/stress_mixture.py [n_pages] [num_cpus]
Owns its Ray session. Results go to stdout as one JSON line.
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

from stress_curate import PlasmaPeak  # noqa: E402
from stress_incremental import ensure_unique_corpus  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                      "worker_process_setup_hook": "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa

    import ray.data

    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.pipelines.mixture import build_mixture

    # unique urls REQUIRED: doc_id = hash(url); the raw stress corpus
    # repeats urls across shards (per-shard page index restarts), which
    # fans out every id-keyed join downstream (n_final > n_selected)
    pages = ensure_unique_corpus(n_pages)
    work = f"/tmp/dtr_stress_mixture_{n_pages}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    mon = PlasmaPeak()
    mon.start()

    # Phase A: flagship extract (shard layout, zero shuffle)
    t0 = time.perf_counter()
    res = run_extract_job(pages, os.path.join(work, "extract"),
                          layout="shard", resume=False)
    t_extract = time.perf_counter() - t0

    # Phase B: mixture selection over the extracted docs.  int64 id from
    # the url hash (the stress_curate convention); target domain = a
    # deterministic ~5% slice of ids (a stand-in for "my curated seed
    # corpus" — DSIR only needs the indicator column).
    def docs_view(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(["url", "extracted_text", "lang"]))
        return (
            df.with_columns(pl.col("url").hash(7).reinterpret(signed=True)
                            .alias("doc_id"))
            .rename({"extracted_text": "text"})
            .with_columns((pl.col("doc_id") % 19 == 0).alias("is_target"))
            .select(["doc_id", "text", "lang", "is_target"])
            .to_arrow()
        )

    docs = ray.data.read_parquet(
        os.path.join(work, "extract", "docs"),
        columns=["url", "extracted_text", "lang"],
    ).map_batches(docs_view, batch_format="pyarrow")

    t1 = time.perf_counter()
    final, stats = build_mixture(docs, work_dir=os.path.join(work, "mix"))
    # consume the final mixture as a stream (rows never land on the driver)
    n_final = 0
    for b in final.iter_batches(batch_format="pyarrow", batch_size=8192):
        n_final += b.num_rows
    t_mixture = time.perf_counter() - t1

    # Resume demo: simulate a crash in the token-budget stage (drop its
    # .done marker) — quality + DSIR scores are paid from markers, only
    # selection onward reruns; stats must be identical
    os.remove(os.path.join(work, "mix", "selected.done"))
    t1b = time.perf_counter()
    _, stats_resumed = build_mixture(
        docs, work_dir=os.path.join(work, "mix"), resume=True)
    t_mixture_resume = time.perf_counter() - t1b
    assert stats_resumed == stats, (stats_resumed, stats)

    mon.stop()
    mon.join()  # no timeout: Thread.join(timeout) trips over the _stop
    # Event shadowing CPython's private Thread._stop on timeout paths

    print(json.dumps({
        "n_pages": n_pages, "num_cpus": cpus,
        "extract_sec": round(t_extract, 1),
        "mixture_sec": round(t_mixture, 1),
        "mixture_resume_from_selection_sec": round(t_mixture_resume, 1),
        "total_sec": round(t_extract + t_mixture, 1),
        "doc_count": res["doc_count"], "ok_count": res["ok_count"],
        "n_input": stats["n_input"], "n_quality": stats["n_quality"],
        "n_selected": stats["n_selected"], "n_final": n_final,
        "docs_per_sec_end_to_end": round(
            res["doc_count"] / (t_extract + t_mixture), 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
