"""Interleaved same-session A/B of exact_dedup's content hash: md5
(oracle-lockstep) vs xx64 (the new round-5 production default on the
curate/webcurate path) — verdict r04 weak item A1, measured in
isolation on the stage that carries it.

Identical plan apart from ``hash_mode`` (combiner → one keyed exchange
→ min-id winners over the 960k-page extract view); legs alternate
A/B/A/B; winner doc_id multisets asserted equal across modes (the
selection is hash-invariant, only the key encoding differs).

Usage: python tools/ab_exact_dedup.py [n_pages] [num_cpus] [trials]
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

    from docling_translate_ray.functions.dedup import exact_dedup

    corpus = ensure_unique_corpus(n_pages)

    def docs():
        import polars as pl

        def to_docs(b: pa.Table) -> pa.Table:
            ids = pl.Series("u", b["url"]).cast(pl.String).hash(seed=7) \
                .cast(pl.Int64, wrap_numerical=True).to_arrow()
            # ~10% planted exact dups so the winner set is non-trivial
            df = pl.DataFrame({
                "doc_id": pl.Series(ids.cast(pa.int64())),
                "text": pl.Series(b["text"]).cast(pl.String).fill_null(""),
            }).with_columns(
                pl.when(pl.col("doc_id") % 10 == 0)
                .then(pl.lit("canonical planted duplicate body"))
                .otherwise(pl.col("text")).alias("text"))
            return df.to_arrow()

        return ray.data.read_parquet(corpus).map_batches(
            to_docs, batch_format="pyarrow")

    def leg(mode: str):
        t0 = time.perf_counter()
        n, id_sum = 0, 0
        for b in exact_dedup(docs(), hash_mode=mode).iter_batches(
                batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
            import pyarrow.compute as pc

            id_sum += pc.sum(b["doc_id"]).as_py() or 0
        # per-batch sums wrap at int64 and batch boundaries vary run to
        # run; mod 2^64 the total is batch-order invariant
        return round(time.perf_counter() - t0, 2), n, id_sum % (1 << 64)

    out = {"xx64": [], "md5": []}
    checks = set()
    for trial in range(trials):
        order = ("xx64", "md5") if trial % 2 == 0 else ("md5", "xx64")
        for mode in order:
            dt, n, id_sum = leg(mode)
            out[mode].append(dt)
            checks.add((n, id_sum))
            print(f"  trial {trial} {mode}: {dt}s ({n} winners)",
                  file=sys.stderr)
    assert len(checks) == 1, f"winner sets differ across modes: {checks}"

    best_x, best_m = min(out["xx64"]), min(out["md5"])
    print(json.dumps({
        "metric": "exact_dedup hash_mode xx64 vs md5",
        "unit": "sec", "pages": n_pages, "num_cpus": cpus,
        "xx64_sec": best_x, "md5_sec": best_m,
        "speedup": round(best_m / best_x, 2),
        "winners": next(iter(checks))[0], "trials": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
