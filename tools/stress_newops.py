"""Corpus-scale stress of the round-4 final operator batch: table
recovery, CCNet paragraph dedup, feature-hash embedding, JSON-LD scan,
mirror detection and crawl-trap patterns over the 960k-page synthetic
crawl (the stress_crawl corpus), each timed end-to-end as its own
streaming consume with peak-plasma tracking.

What each number evidences at 100 TB:

* table_extract / jsonld_scan — pure per-batch parse lanes: wall must
  scale with bytes scanned, zero exchanges (stats assert no shuffle).
* paragraph_dedup — text crosses exactly ONE exchange (the doc-keyed
  reassembly); the dedup decision exchange carries 32-byte rows.
* hash_embed — actor-pool token hashing with the Zipf cache + one
  narrow (id, dim) merge.
* mirror_hosts (xx64) — distinct + capped pair expansion + two
  grouped_sums; the host-cap fence bounds pair fan-out.
* url_pattern_traps — one vectorized regex pass + one narrow exchange.

Usage: python tools/stress_newops.py [n_pages] [num_cpus]
Owns its Ray session. One JSON line to stdout.
"""

from __future__ import annotations

import json
import os
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
                          "worker_process_setup_hook":
                              "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa
    import ray.data

    from docling_translate_ray.functions.dedup import paragraph_dedup
    from docling_translate_ray.functions.embed import hash_embed
    from docling_translate_ray.functions.mirrors import (
        mirror_hosts,
        url_pattern_traps,
    )
    from docling_translate_ray.functions.structured import extract_jsonld
    from docling_translate_ray.functions.tables import extract_tables

    corpus_dir = ensure_unique_corpus(n_pages)

    def pages():
        return ray.data.read_parquet(corpus_dir)

    def docs():
        # (doc_id, text) view: int64 id from the url hash (xx64)
        import polars as pl

        def to_docs(b: pa.Table) -> pa.Table:
            ids = pl.Series("u", b["url"]).cast(pl.String).hash(seed=7) \
                .cast(pl.Int64, wrap_numerical=True).to_arrow()
            return pa.table({"doc_id": ids.cast(pa.int64()),
                             "text": b["text"]})

        return pages().map_batches(to_docs, batch_format="pyarrow")

    def consume(ds) -> int:
        n = 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
        return n

    results: dict[str, dict] = {}

    def run(name, fn):
        mon = PlasmaPeak()
        mon.start()
        t0 = time.perf_counter()
        rows = fn()
        dt = round(time.perf_counter() - t0, 2)
        mon.stop()
        results[name] = {"sec": dt, "rows": rows,
                         "peak_plasma_mib": round(mon.peak_mib, 1),
                         "pages_per_sec": round(n_pages / dt, 1)}
        print(f"  {name}: {dt}s, {rows} rows", file=sys.stderr)

    run("table_extract", lambda: consume(extract_tables(pages())))
    run("jsonld_scan", lambda: consume(extract_jsonld(pages())))
    run("paragraph_dedup",
        lambda: consume(paragraph_dedup(docs(), hash_mode="xx64",
                                        num_partitions=2 * cpus)))
    run("hash_embed",
        lambda: consume(hash_embed(docs(), num_partitions=2 * cpus,
                                   hash_mode="xx64")))
    run("mirror_hosts",
        lambda: consume(mirror_hosts(pages(), algo="xx64",
                                     num_partitions=2 * cpus)))
    run("url_traps",
        lambda: consume(url_pattern_traps(pages(), min_pages=1000,
                                          num_partitions=2 * cpus)))

    print(json.dumps({"metric": "round-4 final ops at corpus scale",
                      "unit": "sec", "pages": n_pages, "num_cpus": cpus,
                      "ops": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
