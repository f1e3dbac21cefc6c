"""Corpus-scale stress of the CCNet-style tier extraction: 960k
synthetic documents through ``functions/text_stats.quality_tiers``,
recording wall time and PEAK object-store usage — the tiering
counterpart of tools/stress_shards.py (same generated corpus).

Confirms the scale claims: the word_commonness substrate's two
exchanges stay vocabulary-bounded, the boundary histogram exchange is
keyed by the score VALUE (distinct integer means, not docs), the driver
holds only the cumsummed histogram, and the labeled output is consumed
as a stream (never collected).

Usage: python tools/stress_tiers.py [n_docs] [num_cpus]
Owns its Ray session. Results go to stdout as one JSON line.
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

    from docling_translate_ray.functions.text_stats import quality_tiers

    # same corpus as stress_shards (reused if already generated): ~600
    # chars per doc, one hot token family per id bucket so the corpus
    # vocabulary (and hence every exchange) stays bounded and skewed
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

    t0 = time.perf_counter()
    tiers = quality_tiers(ray.data.read_parquet(corpus_dir),
                          num_partitions=2 * cpus)
    counts: dict[str, int] = {}
    for b in tiers.iter_batches(batch_format="pyarrow", batch_size=8192):
        for row in b["tier"].combine_chunks().value_counts().to_pylist():
            counts[row["values"]] = counts.get(row["values"], 0) + row["counts"]
    wall = time.perf_counter() - t0
    assert sum(counts.values()) == n_docs, counts

    mon.stop()
    mon.join(timeout=5)

    print(json.dumps({
        "metric": "stress_tiers", "n_docs": n_docs, "num_cpus": cpus,
        "wall_sec": round(wall, 1),
        "docs_per_sec": int(n_docs / wall),
        "tier_counts": counts,
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
