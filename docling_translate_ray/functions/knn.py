"""Approximate/exact nearest-neighbour search over an embedding column.

* :func:`knn_brute_force` — the correctness baseline: broadcast the query
  matrix once (``ray.put``), per-batch numpy matmul + local top-k, then a
  tiny global merge of ``k × n_batches`` candidates.  The only driver-side
  data is the merged candidate set (k rows per query).
* :func:`knn_ivf` — the scale path: vectors are assigned to ``n_centroids``
  seeded random centroids (deterministic — no iterative training, so results
  are reproducible without a fit step); a query probes only the ``n_probe``
  nearest centroid partitions.  Recall < 1 by design; the brute-force
  baseline is the oracle.

Cosine similarity is computed in float64 to match DuckDB's
``list_cosine_similarity`` (the oracle at sf0.01) to rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def knn_brute_force(ds, queries: np.ndarray, k: int = 10,
                    id_column: str = "vec_id", column: str = "embedding"):
    """Exact top-k cosine neighbours for each query row.

    Returns a (small) pyarrow Table: query_idx, vec_id, cosine, rank —
    deterministic tie-break by (−cosine, vec_id).
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return _empty_knn(id_column)
        mat = _normalize(np.array(batch[column].to_pylist(), dtype=np.float64))
        sims = qm @ mat.T  # (Q, B)
        kk = min(k, mat.shape[0])
        out_q, out_id, out_cos = [], [], []
        for qi in range(qm.shape[0]):
            row = sims[qi]
            idx = np.lexsort((ids, -row))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_cos.extend(row[idx].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                id_column: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_cos, pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow")
    # global merge: candidate set is tiny (k per query per batch)
    rows = cand.take_all()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_idx"], []).append((r["cosine"], r[id_column]))
    out_q, out_id, out_cos, out_rank = [], [], [], []
    for qi in sorted(by_q):
        top = sorted(by_q[qi], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (cos, vid) in enumerate(top):
            out_q.append(qi)
            out_id.append(vid)
            out_cos.append(cos)
            out_rank.append(rank + 1)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int64()),
            id_column: pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_cos, pa.float64()),
            "rank": pa.array(out_rank, pa.int64()),
        }
    )


def _empty_knn(id_column: str = "vec_id"):
    return pa.table(
        {
            "query_idx": pa.array([], pa.int64()),
            id_column: pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )


def _centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return _normalize(rng.randn(n_centroids, dim))


def train_centroids(ds, n_centroids: int = 16, seed: int = 42,
                    sample_rows: int = 4096, iters: int = 5,
                    column: str = "embedding") -> np.ndarray:
    """Deterministic mini-kmeans (spherical) on the corpus head.

    The IVF "fit" step: sample = first ``sample_rows`` rows (stable for a
    fixed file layout), seeded row-pick init, ``iters`` Lloyd rounds with
    cosine assignment; empty clusters keep their previous centroid.  Pure
    numpy, driver-side — the trained matrix is then broadcast like any
    small side."""
    head = ds.limit(sample_rows)
    rows = []
    for b in head.iter_batches(batch_format="pyarrow"):
        col = b[column] if hasattr(b, "column_names") else b.column(column)
        rows.extend(col.to_pylist())
    if not rows:
        raise ValueError(
            f"train_centroids: corpus sample is empty (column {column!r})"
        )
    mat = _normalize(np.array(rows, dtype=np.float64))
    n = mat.shape[0]
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(iters):
        # spherical k-means: renormalize BETWEEN iterations too, so cosine
        # assignment never favors tight (high-norm) mean vectors, and the
        # training-time partition matches the normalized serving centroids
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            n_probe: int = 4, seed: int = 42,
            id_column: str = "vec_id", column: str = "embedding",
            centroids: np.ndarray | None = None):
    """IVF-style ANN: per-batch centroid assignment → probe-filtered top-k.

    Centroids default to :func:`train_centroids` (deterministic mini-kmeans
    on the corpus head); pass ``centroids`` to reuse a trained matrix across
    queries, or ``_centroids(dim, n, seed)`` for the untrained baseline.
    Partitioning assumption: each batch filters to rows whose centroid is in
    the query's probe set, so the matmul touches ~``n_probe/n_centroids`` of
    the corpus.  Single-query only (the common serving shape); for batched
    queries run per query or fall back to brute force.
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    assert q.shape[0] == 1, "knn_ivf is single-query; use knn_brute_force for batches"
    cents = centroids if centroids is not None else train_centroids(
        ds, n_centroids=n_centroids, seed=seed, column=column
    )
    probe = set(np.argsort(-(cents @ q[0]))[:n_probe].tolist())
    q_ref = ray.put(q)
    c_ref = ray.put(cents)
    probe_ref = ray.put(probe)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, cm, pr = ray.get(q_ref), ray.get(c_ref), ray.get(probe_ref)
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return _empty_knn(id_column)
        mat = _normalize(np.array(batch[column].to_pylist(), dtype=np.float64))
        assign = np.argmax(mat @ cm.T, axis=1)
        mask = np.isin(assign, list(pr))
        if not mask.any():
            return _empty_knn(id_column)
        ids, mat = ids[mask], mat[mask]
        sims = (qm @ mat.T)[0]
        idx = np.lexsort((ids, -sims))[: min(k, len(ids))]
        return pa.table(
            {
                "query_idx": pa.array([0] * len(idx), pa.int64()),
                id_column: pa.array(ids[idx], pa.int64()),
                "cosine": pa.array(sims[idx], pa.float64()),
            }
        )

    rows = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    top = sorted(((r["cosine"], r[id_column]) for r in rows), key=lambda t: (-t[0], t[1]))[:k]
    return pa.table(
        {
            "query_idx": pa.array([0] * len(top), pa.int64()),
            id_column: pa.array([t[1] for t in top], pa.int64()),
            "cosine": pa.array([t[0] for t in top], pa.float64()),
            "rank": pa.array(list(range(1, len(top) + 1)), pa.int64()),
        }
    )
