"""Corpus-scale IVFADC evidence: residual vs raw IVF-PQ codes at 1M
clustered 64-dim vectors, ground truth planted by construction.

Corpus: 64 deterministic cluster centers; vector i = center[i % 64] +
N(0, 0.1) noise (per-row seeded, order-free).  The query is a point
near center 7, and the TRUE top-10 are ten planted twins (query +
N(0, 0.002), ids spread mid-range so code-granularity ties do not
structurally favor or bury them) — every other vector is a full
noise-radius away, so the exact answer is known without a brute-force
scan.  PQ codes quantize in m=8 subspaces of k=64; at smaller budgets whole sub-clusters tie at
one code distance at small budgets; recall is reported at R=10 AND R=100
(the IVFADC-paper convention of recall@R) alongside the sharper
signal, mean ADC error on the twins.

Both indexes get the identical budget (n_coarse=16, m=4, k=16).  The
residual index must (a) recall at least as many planted twins at
n_probe=4 and (b) approximate exact distances with lower mean ADC
error over the probed candidates — the Jégou 2011 IVFADC claim,
measured on this engine's integer formulation at corpus scale.

Usage: python tools/stress_ivfpq_residual.py [n_vecs] [num_cpus]
Owns its Ray session.  One JSON line to stdout.
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
N_CENTERS = 64
N_COARSE = 16
M = 8
K = 64
N_TWINS = 10


def _centers():
    import numpy as np

    rng = np.random.RandomState(4242)
    return rng.rand(N_CENTERS, DIM) * 4.0


def _query(centers):
    import numpy as np

    rng = np.random.RandomState(777)
    return centers[7] + rng.normal(0, 0.05, DIM)


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
        build_ivfpq_index,
        ivfpq_topk,
    )

    centers = _centers()
    qvec = _query(centers)
    tw_step = n_vecs // N_TWINS
    twin_ids = [j * tw_step + 13 for j in range(N_TWINS)]

    def gen(batch: pa.Table) -> pa.Table:
        cs = _centers()
        qv = _query(cs)
        ids = np.asarray(batch["id"].to_pylist(), dtype=np.int64)
        vecs = np.empty((len(ids), DIM), dtype=np.float64)
        for row, i in enumerate(ids):
            rng = np.random.RandomState((int(i) * 2654435761) % (2**31))
            if int(i) % (n_vecs // N_TWINS) == 13 and int(i) // (n_vecs // N_TWINS) < N_TWINS:
                vecs[row] = qv + rng.normal(0, 0.002, DIM)
            else:
                vecs[row] = cs[int(i) % N_CENTERS] + rng.normal(0, 0.1, DIM)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        })

    corpus_dir = f"/tmp/stress_ivfpqr_corpus_{n_vecs}"
    if not os.path.exists(corpus_dir):
        ray.data.range(n_vecs).map_batches(
            gen, batch_format="pyarrow").write_parquet(corpus_dir)
    emb = ray.data.read_parquet(corpus_dir)

    # exact int distances to the twins (for the ADC-error comparison we
    # sample the twins + their cluster: both indexes score them)
    qi = np.floor(qvec * 1e6 + 0.5).astype(np.int64) + 10_000_000

    mon = PlasmaPeak()
    mon.start()

    out = {"metric": "stress_ivfpq_residual", "n_vecs": n_vecs,
           "num_cpus": cpus, "n_coarse": N_COARSE, "m": M, "k": K,
           "n_probe": 4}
    for res in (False, True):
        tag = "residual" if res else "raw"
        idx = f"/tmp/stress_ivfpqr_idx_{tag}_{n_vecs}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        build_ivfpq_index(emb, idx, n_coarse=N_COARSE, m=M, k=K,
                          iterations=2, residual=res,
                          num_partitions=2 * cpus)
        build_wall = time.perf_counter() - t0
        t1 = time.perf_counter()
        top = ivfpq_topk(idx, list(qvec), n_probe=4, k=100).to_pylist()
        q_wall = time.perf_counter() - t1
        got10 = {r["vec_id"] for r in top[:N_TWINS]}
        got100 = {r["vec_id"] for r in top}
        recall10 = len(got10 & set(twin_ids)) / N_TWINS
        recall100 = len(got100 & set(twin_ids)) / N_TWINS
        # ADC error over the twins: approx distance vs exact int distance
        wide = {r["vec_id"]: r["pq_dist"]
                for r in ivfpq_topk(idx, list(qvec), n_probe=4,
                                    k=1000).to_pylist()}
        errs = []
        for t_id in twin_ids:
            if t_id not in wide:
                continue
            rng = np.random.RandomState((t_id * 2654435761) % (2**31))
            tv = _query(_centers()) + rng.normal(0, 0.002, DIM)
            ti = np.floor(tv * 1e6 + 0.5).astype(np.int64) + 10_000_000
            exact = int(((ti - qi) ** 2).sum())
            errs.append(abs(wide[t_id] - exact))
        out[tag] = {
            "build_sec": round(build_wall, 1),
            "query_sec": round(q_wall, 2),
            "recall_at_10": recall10,
            "recall_at_100": recall100,
            "mean_adc_err_twins": int(np.mean(errs)) if errs else None,
            "n_twins_scored": len(errs),
        }
        shutil.rmtree(idx, ignore_errors=True)
    mon.stop()
    mon.join(timeout=5)
    out["peak_object_store_mib"] = round(mon.peak_mib, 1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
