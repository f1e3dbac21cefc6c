"""Corpus-scale stress of incremental IVF-PQ upsert: build the
standing index on 1M 64-dim vectors, append a 10% increment encoded by
the FROZEN base model (functions/pq.ivfpq_insert — the crawl-cadence
path), compact, and prove probe stability — recording build wall vs
insert wall (the whole point: an increment must cost encode-only, not
a retrain), pruned-query latency, and compact cost.

Reuses stress_pq's deterministic per-id vector stream and corpus cache.

Usage: python tools/stress_ivfpq_insert.py [n_base] [num_cpus]
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

DIM = 64
M = 4
K = 16
N_COARSE = 16


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_inc = n_base // 10

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

    import numpy as np
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.pq import (
        _resolve_gen,
        build_ivfpq_index,
        ivfpq_compact,
        ivfpq_insert,
        ivfpq_topk,
    )

    def gen_fn(start: int):
        def gen(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["id"].to_pylist(), dtype=np.int64) + start
            vecs = np.empty((len(ids), DIM), dtype=np.float64)
            for row, i in enumerate(ids):
                rng = np.random.RandomState((i * 2654435761) % (2**31))
                vecs[row] = rng.rand(DIM)
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(),
                                      pa.list_(pa.float64())),
            })
        return gen

    corpus_dir = f"/tmp/stress_pq_corpus_{n_base}"
    if not os.path.exists(corpus_dir):
        ray.data.range(n_base).map_batches(
            gen_fn(0), batch_format="pyarrow").write_parquet(corpus_dir)
    inc_dir = f"/tmp/stress_ivfpq_inc_{n_base}"
    if not os.path.exists(inc_dir):
        ray.data.range(n_inc).map_batches(
            gen_fn(n_base), batch_format="pyarrow").write_parquet(inc_dir)

    idx = f"/tmp/stress_ivfpq_ins_{n_base}"
    shutil.rmtree(idx, ignore_errors=True)

    mon = PlasmaPeak()
    mon.start()

    base = ray.data.read_parquet(corpus_dir)
    t0 = time.perf_counter()
    build_ivfpq_index(base, idx, n_coarse=N_COARSE, m=M, k=K,
                      iterations=2, num_partitions=2 * cpus)
    t_build = time.perf_counter() - t0

    qrow = base.filter(expr="vec_id == 5").take(1)
    qvec = list(qrow[0]["embedding"])
    t1 = time.perf_counter()
    pre = ivfpq_topk(idx, qvec, n_probe=2, k=10).to_pylist()
    t_q_pre = time.perf_counter() - t1

    t2 = time.perf_counter()
    ivfpq_insert(ray.data.read_parquet(inc_dir), idx)
    t_insert = time.perf_counter() - t2

    # row accounting: every increment row landed exactly once
    codes_root = os.path.join(_resolve_gen(idx), "codes")
    n_rows = ray.data.read_parquet(codes_root).count()
    assert n_rows == n_base + n_inc, (n_rows, n_base + n_inc)

    t3 = time.perf_counter()
    mid = ivfpq_topk(idx, qvec, n_probe=2, k=10).to_pylist()
    t_q_mid = time.perf_counter() - t3

    t4 = time.perf_counter()
    stats = ivfpq_compact(idx)
    t_compact = time.perf_counter() - t4

    t5 = time.perf_counter()
    post = ivfpq_topk(idx, qvec, n_probe=2, k=10).to_pylist()
    t_q_post = time.perf_counter() - t5
    assert post == mid, "compact changed probe results"

    mon.stop()
    mon.join(timeout=5)

    print(json.dumps({
        "metric": "stress_ivfpq_insert", "n_base": n_base,
        "n_inc": n_inc, "num_cpus": cpus,
        "m": M, "k": K, "n_coarse": N_COARSE,
        "build_sec": round(t_build, 1),
        "build_vecs_per_sec": int(n_base / t_build),
        "insert_sec": round(t_insert, 1),
        "insert_vecs_per_sec": int(n_inc / t_insert),
        "insert_speedup_vs_build": round(
            (n_inc / t_insert) / (n_base / t_build), 1),
        "query_sec_pre": round(t_q_pre, 2),
        "query_sec_post_insert": round(t_q_mid, 2),
        "query_sec_post_compact": round(t_q_post, 2),
        "pre_insert_top1_stable": pre[0] == mid[0],
        "compact_sec": round(t_compact, 1),
        "files_before": stats["files_before"],
        "files_after": stats["files_after"],
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
