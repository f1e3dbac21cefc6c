"""Corpus-scale stress of the training-shard layout: 960k synthetic
documents through ``functions/shards.train_shards`` at 256 shards
(hex_digits=2), stats-only and writer mode, recording wall time and
PEAK object-store usage — the shard-layout counterpart of
tools/stress_curate.py / stress_crawl.py.

Confirms the narrow-exchange claim at scale: in stats mode the exchange
carries ``(shard, 32-byte key, 2×int64)`` per doc — the document text
never crosses it; writer mode is the one layout that must move the text
(the shard files ARE the output) and is timed separately.  The driver
holds only the 256-row stats table.

Usage: python tools/stress_shards.py [n_docs] [num_cpus]
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


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
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

    from docling_translate_ray.functions.shards import train_shards
    from docling_translate_ray.util import collect_to_table

    # deterministic distributed corpus: ~600-char docs, sparse ids
    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        return pa.table({
            "doc_id": pa.array([i * 3 + 1 for i in ids], pa.int64()),
            "text": pa.array(
                [f"doc {i} " + (f"w{i % 997} token body " * (10 + i % 41))
                 for i in ids],
                pa.string()),
        })

    corpus_dir = f"/tmp/stress_shards_corpus_v2_{n_docs}"
    if not os.path.exists(corpus_dir):
        ray.data.range(n_docs).map_batches(
            gen, batch_format="pyarrow").write_parquet(corpus_dir)

    mon = PlasmaPeak()
    mon.start()

    # Phase A: stats-only layout (the narrow exchange)
    t0 = time.perf_counter()
    stats = collect_to_table(train_shards(
        ray.data.read_parquet(corpus_dir), hex_digits=2,
        num_partitions=2 * cpus))
    wall_stats = time.perf_counter() - t0
    assert stats.num_rows == 256, stats.num_rows
    n_total = sum(stats["n_docs"].to_pylist())
    assert n_total == n_docs, n_total

    # Phase B: writer mode — one sorted parquet file per shard
    out_dir = "/tmp/stress_shards_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    stats2 = collect_to_table(train_shards(
        ray.data.read_parquet(corpus_dir), hex_digits=2, out_dir=out_dir,
        num_partitions=2 * cpus))
    wall_write = time.perf_counter() - t0
    files = os.listdir(out_dir)
    assert len(files) == 256, len(files)
    # writer mode must report the identical stats table
    key = lambda t: sorted(tuple(r.values()) for r in t.to_pylist())  # noqa: E731
    assert key(stats2) == key(stats)
    out_bytes = sum(os.path.getsize(os.path.join(out_dir, f)) for f in files)

    mon.stop()
    mon.join(timeout=5)

    print(json.dumps({
        "metric": "stress_shards", "n_docs": n_docs, "num_cpus": cpus,
        "n_shards": 256,
        "wall_stats_sec": round(wall_stats, 1),
        "wall_write_sec": round(wall_write, 1),
        "docs_per_sec_stats": int(n_docs / wall_stats),
        "shard_files": len(files),
        "out_gib": round(out_bytes / 2**30, 2),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
