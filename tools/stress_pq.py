"""Corpus-scale stress of product quantization: n synthetic 64-dim
vectors (default 1M) through ``functions/pq`` — m=4 per-subspace
integer k-means (k=16, 2 Lloyd iterations), full-corpus encode, then a
batch of asymmetric-distance top-10 queries — recording train+encode
wall, per-query latency over the codes, compression ratio, and PEAK
object-store usage.

Confirms the scale claims: training is the model-state-on-driver
combiner loop (codebooks = m·k·(64/m) ints on the driver), the encoded
corpus is narrow ``(id, m × int64)`` rows, search touches CODES ONLY
(the vectors are never re-read), and the in-corpus query's rank-1
distance equals the LUT minimum (the ADC invariant) at full scale.

Usage: python tools/stress_pq.py [n_vecs] [num_cpus]
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

DIM = 64
M = 4
K = 16


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
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

    import numpy as np
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.pq import (
        _scale_query,
        pq_topk,
        pq_train_encode,
    )

    def gen(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"].to_pylist(), dtype=np.int64)
        # per-row deterministic stream (order-free, like corpus.gen_pages)
        vecs = np.empty((len(ids), DIM), dtype=np.float64)
        for row, i in enumerate(ids):
            rng = np.random.RandomState((i * 2654435761) % (2**31))
            vecs[row] = rng.rand(DIM)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        })

    corpus_dir = f"/tmp/stress_pq_corpus_{n_vecs}"
    if not os.path.exists(corpus_dir):
        ray.data.range(n_vecs).map_batches(
            gen, batch_format="pyarrow").write_parquet(corpus_dir)

    mon = PlasmaPeak()
    mon.start()

    emb = ray.data.read_parquet(corpus_dir)
    t0 = time.perf_counter()
    codes, codebooks = pq_train_encode(
        emb, m=M, k=K, iterations=2, num_partitions=2 * cpus)
    codes_dir = f"/tmp/stress_pq_codes_{n_vecs}"
    import shutil

    shutil.rmtree(codes_dir, ignore_errors=True)
    codes.write_parquet(codes_dir)
    encode_wall = time.perf_counter() - t0

    codes_ds = ray.data.read_parquet(codes_dir)
    n_codes = codes_ds.count()
    assert n_codes == n_vecs, (n_codes, n_vecs)

    # a handful of in-corpus queries; each search scans CODES ONLY
    qids = [5, n_vecs // 3, n_vecs - 7]
    lat = []
    for qid in qids:
        qrow = emb.filter(expr=f"vec_id == {qid}").take(1)
        qvec = list(qrow[0]["embedding"])
        t1 = time.perf_counter()
        top = pq_topk(codes_ds, codebooks, qvec, k=10)
        lat.append(time.perf_counter() - t1)
        # ADC invariant: the in-corpus query's own code combo is the
        # LUT minimum, so rank-1 distance == sum of per-subspace minima
        qi = _scale_query(qvec)
        sub = DIM // M
        min_sum = 0
        for j, (cids, cmat) in enumerate(codebooks):
            d = cmat - qi[j * sub:(j + 1) * sub][None, :]
            min_sum += int(np.einsum("kd,kd->k", d, d).min())
        assert top.to_pylist()[0]["pq_dist"] == min_sum

    mon.stop()
    mon.join(timeout=5)

    raw_bytes = n_vecs * DIM * 8
    code_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(codes_dir) for f in fs)
    print(json.dumps({
        "metric": "stress_pq", "n_vecs": n_vecs, "num_cpus": cpus,
        "m": M, "k": K,
        "encode_wall_sec": round(encode_wall, 1),
        "vecs_per_sec": int(n_vecs / encode_wall),
        "query_latency_sec": [round(x, 2) for x in lat],
        "raw_mib": round(raw_bytes / 2**20, 1),
        "codes_parquet_mib": round(code_bytes / 2**20, 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
