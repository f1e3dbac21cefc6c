"""Corpus-scale stress of the bigram-LM fluency scorer: 960k synthetic
documents through ``functions/lm.bigram_lm_score`` in the hashed-key
payload mode, recording wall time and PEAK object-store usage — the LM
counterpart of tools/stress_tiers.py (same generated corpus).

Confirms the scale claims: the corpus is tokenized ONCE into the
persisted feature parquet, the V pass and the w1-keyed exchange stay
bigram-type-bounded (the corpus vocabulary is deliberately Zipf-ish and
bounded), the hashed mode ships (int64,int64) keys instead of strings,
and the scored output is consumed as a stream (never collected).

Usage: python tools/stress_lm.py [n_docs] [num_cpus] [--strings]
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
    hash_keys = "--strings" not in sys.argv

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

    from docling_translate_ray.functions.lm import bigram_lm_score

    # same corpus family as stress_shards/stress_tiers (reused if
    # already generated)
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
    scored = bigram_lm_score(
        ray.data.read_parquet(corpus_dir),
        scratch_dir=f"/tmp/stress_lm_scratch_{n_docs}",
        num_partitions=2 * cpus, hash_keys=hash_keys)
    n_out = 0
    sum_avg = 0
    for b in scored.iter_batches(batch_format="pyarrow", batch_size=8192):
        n_out += b.num_rows
        import pyarrow.compute as pc

        sum_avg += pc.sum(b["lm_avg"]).as_py()
    wall = time.perf_counter() - t0
    assert n_out == n_docs, (n_out, n_docs)

    mon.stop()
    mon.join(timeout=5)

    print(json.dumps({
        "metric": "stress_lm", "n_docs": n_docs, "num_cpus": cpus,
        "hash_keys": hash_keys,
        "wall_sec": round(wall, 1),
        "docs_per_sec": int(n_docs / wall),
        "mean_lm_avg": int(sum_avg / n_out),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
