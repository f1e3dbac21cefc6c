"""Corpus-scale stress of BPE tokenizer training: word-freq build over
960k extracted pages (the ONE corpus pass), then the DISTRIBUTED merge
loop (max_local_vocab=0 forces the generation-alternating parquet path
the tests only exercise at toy scale), cross-checked against the
driver-local loop on the same corpus — the two paths must produce the
identical merge table.

Usage: python tools/stress_bpe.py [n_pages] [num_cpus] [n_merges]
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

from stress_curate import ensure_corpus  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 6

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

    import ray.data

    from docling_translate_ray.functions.bpe import bpe_train

    pages = ensure_corpus(n_pages)

    import pyarrow as pa

    def to_text(b: pa.Table) -> pa.Table:
        # html is a BINARY column and the stress corpus contains the
        # poison rows (invalid utf-8, null bytes) on purpose — run the
        # engine's own decode ladder, not a strict cast
        from docling_translate_ray.extract_core import decode_bytes

        return pa.table({"text": pa.array(
            [decode_bytes(v) if v is not None else None
             for v in b["html"].to_pylist()], pa.string())})

    def docs():
        return ray.data.read_parquet(pages, columns=["html"]).map_batches(
            to_text, batch_format="pyarrow")

    t0 = time.perf_counter()
    dist = bpe_train(docs(), n_merges=n_merges, max_local_vocab=0)
    t_dist = time.perf_counter() - t0

    t1 = time.perf_counter()
    local = bpe_train(docs(), n_merges=n_merges)
    t_local = time.perf_counter() - t1

    assert dist.to_pylist() == local.to_pylist(), (
        dist.to_pylist(), local.to_pylist())

    print(json.dumps({
        "n_pages": n_pages, "num_cpus": cpus, "n_merges": n_merges,
        "distributed_sec": round(t_dist, 1),
        "driver_local_sec": round(t_local, 1),
        "paths_identical": True,
        "merges": [f"{m['left']}+{m['right']}:{m['n_occurrences']}"
                   for m in dist.to_pylist()],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
