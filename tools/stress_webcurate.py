"""Corpus-scale stress of the north-star first mile END TO END: n raw
Common-Crawl-style pages (url:string, html:binary — the shared
960k-page stress corpus) through ``pipelines/curate.curate_pages`` —
jusText-style boilerplate strip → quality gate → exact dedup →
MinHash-LSH near-dedup → curated rows with urls re-attached —
recording wall time, pages/s, per-stage survivor counts, the
marker-resume wall, and PEAK object-store usage.

This is the raw-HTML-in / training-text-out composite the north rule
describes; every stage is durable parquet and the input is read
exactly once (the resume leg proves it via stage markers).

Usage: python tools/stress_webcurate.py [n_pages] [num_cpus]
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

    # unique urls REQUIRED: doc_id = hash(url) and the final stage joins
    # urls back on it; the raw stress corpus repeats urls across shards
    # (per-shard page index restarts), which would fan the join out
    corpus = ensure_unique_corpus(n_pages)

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

    import ray.data

    from docling_translate_ray.pipelines.curate import curate_pages

    work_dir = f"/tmp/stress_webcurate_{n_pages}"
    shutil.rmtree(work_dir, ignore_errors=True)

    # plant duplicates so every curate stage does real work on this
    # otherwise-unique corpus: ~8% of pages become byte-copies of 4
    # canonical docs (exact-dedup load), ~5% become near-copies of one
    # base doc differing by a suffix word (MinHash load)
    import pyarrow as pa

    def plant(batch: pa.Table) -> pa.Table:
        import polars as pl

        base_p = ("<p>" + " ".join(f"w{k} common body token" for k in range(40))
                  + "</p>")
        exact = [("<html><body><p>canonical doc %d </p>" % v) + base_p
                 + "</body></html>" for v in range(4)]
        df = pl.from_arrow(batch.select(["url", "html"])).with_columns(
            (pl.col("url").hash(seed=3) % 100).alias("_h"))
        h = df["_h"].to_list()
        html = df["html"].to_list()
        out = []
        for hv, hh in zip(h, html):
            if hv < 8:
                out.append(exact[hv % 4].encode())
            elif hv < 13:
                out.append((f"<html><body>{base_p}"
                            f"<p>near variant {hv} tail word</p>"
                            "</body></html>").encode())
            else:
                out.append(hh)
        return pa.table({"url": df["url"].to_arrow().cast(pa.string()),
                         "html": pa.array(out, pa.binary())})

    pages = ray.data.read_parquet(
        corpus, columns=["url", "html"]).map_batches(
        plant, batch_format="pyarrow")

    mon = PlasmaPeak()
    mon.start()

    t0 = time.perf_counter()
    curated, stats = curate_pages(pages, work_dir=work_dir)
    n_out = 0
    for b in curated.iter_batches(batch_format="pyarrow", batch_size=8192):
        n_out += b.num_rows
    wall = time.perf_counter() - t0

    mon.stop()
    mon.join(timeout=5)
    assert stats["n_pages"] == n_pages, stats
    assert n_out == stats["n_curated"], (n_out, stats)
    # the planted dups must have exercised BOTH dedup stages
    assert stats["n_exact_unique"] < stats["n_quality_ok"], stats
    assert stats["n_curated"] < stats["n_exact_unique"], stats

    t1 = time.perf_counter()
    _, stats2 = curate_pages(pages, work_dir=work_dir, resume=True)
    resume_wall = time.perf_counter() - t1
    assert stats2 == stats, (stats, stats2)

    print(json.dumps({
        "metric": "stress_webcurate", "n_pages": n_pages, "num_cpus": cpus,
        "wall_sec": round(wall, 1),
        "pages_per_sec": int(n_pages / wall),
        "stats": stats,
        "resume_wall_sec": round(resume_wall, 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
