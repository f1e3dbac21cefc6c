"""Interleaved A/B: scratch-persisted explode vs two-consumer lineage
re-execution in paragraph_dedup / line_dedup (the round-5 fix).

Both operators fan their exploded (corpus-sized) table out to TWO
consumers — the dedup-decision chain and the reassembly chain.  Ray
re-runs lineage per consumer, so before round 5 the corpus scan +
per-doc explode (the most expensive pass) executed twice per job.  The
fix persists the exploded table to scratch parquet once; each chain
re-reads only the columns it needs.

Variant "reexec" reproduces the round-4 shape exactly by monkeypatching
``dedup._persist_exploded`` to a passthrough (each consumer re-executes
the full explode lineage) — same kernels, same exchanges, persistence
off.  Variants run interleaved (A,B,A,B) on the same host and corpus;
min-of-trials reported, the repo's standing A/B discipline.

Usage: python tools/ab_dedup_persist.py [n_pages] [num_cpus]
Owns its Ray session.  One JSON line to stdout.
"""

from __future__ import annotations

import json
import os
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
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa
    import ray.data

    from docling_translate_ray.functions import dedup as fdedup

    # Realistic web-page text shape: the stress corpus averages ~480
    # bytes / 2 paragraphs per doc, which trivializes the explode the
    # A/B is measuring; real extracted pages run KBs with dozens of
    # paragraphs.  Inflate each doc deterministically to ~12 paragraphs
    # (~3 KB) and WRITE the result to parquet once, so both variants
    # pay the same real read cost.
    base_dir = ensure_unique_corpus(n_pages)
    corpus_dir = f"/tmp/dtr_ab_paras_{n_pages}"
    marker = os.path.join(corpus_dir, "_DONE")
    if not os.path.exists(marker):
        import polars as pl

        def inflate(b: pa.Table) -> pa.Table:
            ids = pl.Series("u", b["url"]).cast(pl.String).hash(seed=7) \
                .cast(pl.Int64, wrap_numerical=True)
            base = pl.Series("t", b["text"]).cast(pl.String).fill_null("")
            # 12 paragraphs: the doc's own sentences recut with a
            # per-paragraph ordinal prefix (distinct across paragraphs,
            # shared across duplicate docs)
            text = pl.DataFrame({"t": base}).select(
                pl.concat_str([
                    pl.format("[p{}] {}", pl.lit(i), pl.col("t"))
                    for i in range(12)
                ], separator="\n\n").alias("text"))["text"]
            return pa.table({"doc_id": ids.to_arrow().cast(pa.int64()),
                             "text": text.to_arrow().cast(pa.string())})

        os.makedirs(corpus_dir, exist_ok=True)
        ray.data.read_parquet(base_dir).map_batches(
            inflate, batch_format="pyarrow").write_parquet(corpus_dir)
        open(marker, "w").write("ok")

    @ray.remote
    class ScanCounter:
        def __init__(self):
            self.n = 0

        def add(self, k: int) -> None:
            self.n += k

        def get(self) -> int:
            return self.n

    counter = ScanCounter.remote()

    def docs():
        # corpus scan instrumented: rows-through-the-read counted, so
        # "the scan paid once" is proven directly (persist: n_pages;
        # reexec: 2 × n_pages — one full lineage run per consumer)
        def count(b: pa.Table) -> pa.Table:
            counter.add.remote(b.num_rows)
            return b

        return ray.data.read_parquet(corpus_dir).map_batches(
            count, batch_format="pyarrow")

    def consume(ds) -> int:
        n = 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
        return n

    real_persist = fdedup._persist_exploded

    def no_persist(ds, prefix, scratch_dir, empty_schema):
        # round-4 shape: every consumer re-executes the explode lineage
        return lambda columns: ds.map_batches(
            lambda b: b.select(columns), batch_format="pyarrow")

    ops = {
        "paragraph_dedup": lambda: consume(
            fdedup.paragraph_dedup(docs(), hash_mode="xx64",
                                   num_partitions=2 * cpus)),
        "line_dedup": lambda: consume(
            fdedup.line_dedup(docs(), min_docs=2)),
    }
    out: dict[str, dict] = {
        o: {"persist": [], "reexec": [],
            "persist_scan_rows": 0, "reexec_scan_rows": 0} for o in ops}
    for trial in range(trials):
        order = ("persist", "reexec") if trial % 2 else ("reexec", "persist")
        for op, fn in ops.items():
            for variant in order:
                fdedup._persist_exploded = (
                    real_persist if variant == "persist" else no_persist)
                before = ray.get(counter.get.remote())
                t0 = time.perf_counter()
                rows = fn()
                dt = round(time.perf_counter() - t0, 2)
                scanned = ray.get(counter.get.remote()) - before
                out[op][variant].append(dt)
                out[op][f"{variant}_scan_rows"] = scanned
                print(f"  trial {trial} {op}/{variant}: {dt}s "
                      f"({rows} rows, corpus rows scanned {scanned})",
                      file=sys.stderr)
    fdedup._persist_exploded = real_persist

    summary = {}
    for op, r in out.items():
        best_p, best_r = min(r["persist"]), min(r["reexec"])
        summary[op] = {"persist_sec": best_p, "reexec_sec": best_r,
                       "speedup": round(best_r / best_p, 2),
                       "persist_scan_rows": r["persist_scan_rows"],
                       "reexec_scan_rows": r["reexec_scan_rows"],
                       "trials": {"persist": r["persist"],
                                  "reexec": r["reexec"]}}
    print(json.dumps({
        "metric": "explode persisted-once vs per-consumer re-execution",
        "unit": "sec", "pages": n_pages, "num_cpus": cpus,
        "ops": summary}))
    ray.shutdown()


if __name__ == "__main__":
    main()
