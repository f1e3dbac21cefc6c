"""Approximate/exact nearest-neighbour search over an embedding column.

* :func:`knn_brute_force` — the correctness baseline: broadcast the query
  matrix once (``ray.put``), per-batch numpy matmul + local top-k, then a
  tiny global merge of ``k × n_batches`` candidates.  The only driver-side
  data is the merged candidate set (k rows per query).
* :func:`build_ivf_index` / :func:`knn_ivf_query` — the scale path: a
  ONE-TIME build stage assigns every vector to its nearest trained centroid
  and writes **centroid-partitioned parquet** (hive layout,
  ``cpart=<id>/``); a query then physically reads only its ``n_probe``
  partitions (pruned read — the other ``n_centroids - n_probe`` partition
  directories are never opened).  Recall < 1 by design; the brute-force
  baseline is the oracle.  :func:`knn_ivf` wraps build+query over a temp
  index for the ad-hoc case and supports batched queries.

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


def _merge_topk(cand_ds, k: int, id_column: str) -> pa.Table:
    """Tiny global merge of per-batch candidates (k per query per batch):
    the only driver-side data in any knn path.  Fully vectorized — one
    polars sort + per-query head(k), no Python row loop (the round-2
    version iterated k × n_batches candidate rows in a dict loop)."""
    import polars as pl

    from docling_translate_ray.util import collect_to_table

    cand = collect_to_table(cand_ds, empty_schema=_empty_knn(id_column).schema)
    out = (
        pl.from_arrow(cand)
        .sort(["query_idx", "cosine", id_column], descending=[False, True, False])
        .with_columns(
            (pl.int_range(pl.len()).over("query_idx") + 1)
            .cast(pl.Int64)
            .alias("rank")
        )
        .filter(pl.col("rank") <= k)
        .to_arrow()
    )
    return pa.table(
        {
            "query_idx": out["query_idx"].cast(pa.int64()),
            id_column: out[id_column].cast(pa.int64()),
            "cosine": out["cosine"].cast(pa.float64()),
            "rank": out["rank"].cast(pa.int64()),
        }
    )


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
    return _merge_topk(cand, k, id_column)


def cosine_pairs(ds, threshold: float = 0.4, id_column: str = "vec_id",
                 column: str = "embedding", max_rows: int = 200_000):
    """EXACT all-pairs cosine-similar pairs at/above ``threshold`` — the
    brute-force oracle :func:`..dedup.embedding_near_dup`'s recall is
    judged against, and an operator in its own right for small/medium
    embedding sets.

    Shape: the normalized corpus matrix is broadcast ONCE (``ray.put``,
    zero-copy numpy on read) and each batch multiplies its own rows
    against it, emitting only the upper triangle (``id_a < id_b``) above
    threshold — distributed O(n·B) per batch, driver sees pairs only.
    O(n²) total work is inherent to the exact answer, so like
    ``ngram_jaccard_pairs`` this is FENCED at ``max_rows``; at corpus
    scale use the banded-LSH ``embedding_near_dup``.
    """
    import ray

    from docling_translate_ray.util import collect_to_table

    side = collect_to_table(ds.select_columns([id_column, column]))
    if side.num_rows > max_rows:
        raise ValueError(
            f"cosine_pairs is an exact all-pairs tool fenced at {max_rows} "
            f"rows (got {side.num_rows}); use embedding_near_dup at scale"
        )
    ids = np.asarray(side[id_column].to_pylist(), dtype=np.int64)
    mat = _normalize(np.array(side[column].to_pylist(), dtype=np.float64))
    ref = ray.put((ids, mat))

    def emit_pairs(batch: pa.Table) -> pa.Table:
        b_ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if b_ids.size == 0:
            return empty
        b_mat = _normalize(np.array(batch[column].to_pylist(), dtype=np.float64))
        a_ids, a_mat = ray.get(ref)
        sims = b_mat @ a_mat.T  # (B, n)
        bi, aj = np.nonzero(
            (sims >= threshold) & (b_ids[:, None] < a_ids[None, :])
        )
        return pa.table(
            {
                "id_a": pa.array(b_ids[bi], pa.int64()),
                "id_b": pa.array(a_ids[aj], pa.int64()),
            }
        )

    return ds.map_batches(emit_pairs, batch_format="pyarrow")


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


_CENTROIDS_FILE = "centroids.parquet"
_VECTORS_SUBDIR = "vectors"
_PART_COL = "cpart"


class _AssignCentroid:
    """Actor-pool stage: centroid matrix fetched ONCE per actor; per batch a
    single (B, C) matmul assigns every vector its partition id."""

    def __init__(self, c_ref, column: str) -> None:
        import ray

        self._cents = ray.get(c_ref)
        self._column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(_PART_COL, pa.array([], pa.int32())) \
                        .append_column("centroid_id", pa.array([], pa.int64()))
        mat = _normalize(np.array(batch[self._column].to_pylist(), dtype=np.float64))
        assign = np.argmax(mat @ self._cents.T, axis=1).astype(np.int32)
        # centroid id is stored BOTH as the hive partition key (pruned
        # reads) and as a plain data column (hive writers drop partition
        # cols from the files; explicit-file reads need it per row)
        return batch.append_column(_PART_COL, pa.array(assign, pa.int32())) \
                    .append_column("centroid_id", pa.array(assign.astype(np.int64), pa.int64()))


def build_ivf_index(ds, index_dir: str, n_centroids: int = 16, seed: int = 42,
                    id_column: str = "vec_id", column: str = "embedding",
                    centroids: np.ndarray | None = None) -> np.ndarray:
    """ONE-TIME IVF build: train centroids, assign every vector ONCE, write
    centroid-partitioned parquet (``index_dir/vectors/cpart=<c>/``) plus the
    centroid matrix (``index_dir/centroids.parquet``).

    This is a real index: queries (:func:`knn_ivf_query`) physically read
    only their ``n_probe`` partition directories — the corpus is never
    rescanned per query, and assignment is never recomputed.  Returns the
    trained centroid matrix.
    """
    import os

    import pyarrow.parquet as pq

    import ray

    from docling_translate_ray.util import auto_pool_size

    import shutil

    cents = centroids if centroids is not None else train_centroids(
        ds, n_centroids=n_centroids, seed=seed, column=column
    )
    os.makedirs(index_dir, exist_ok=True)
    # a rebuild replaces the whole index: stale vector files from a prior
    # generation would otherwise sit beside the new ones (the writer names
    # parts by uuid) and every query would rank BOTH generations
    shutil.rmtree(os.path.join(index_dir, _VECTORS_SUBDIR), ignore_errors=True)
    pq.write_table(
        pa.table({"centroid_id": pa.array(range(cents.shape[0]), pa.int64()),
                  "centroid": pa.array(cents.tolist(), pa.list_(pa.float64()))}),
        os.path.join(index_dir, _CENTROIDS_FILE),
    )
    c_ref = ray.put(cents)
    assigned = ds.select_columns([id_column, column]).map_batches(
        _AssignCentroid,
        fn_constructor_kwargs={"c_ref": c_ref, "column": column},
        batch_format="pyarrow",
        concurrency=auto_pool_size(),
    )
    assigned.write_parquet(
        os.path.join(index_dir, _VECTORS_SUBDIR), partition_cols=[_PART_COL]
    )
    return cents


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, _CENTROIDS_FILE)).sort_by("centroid_id")
    return np.array(t["centroid"].to_pylist(), dtype=np.float64)


def _probe_ids(cents: np.ndarray, q: np.ndarray, n_probe: int) -> list[np.ndarray]:
    """Per-query top-``n_probe`` centroid ids (deterministic order)."""
    sims = q @ cents.T  # (Q, C)
    return [np.argsort(-sims[i], kind="stable")[:n_probe] for i in range(q.shape[0])]


def _probe_paths(index_dir: str, probe_union) -> list[str]:
    """Parquet files of exactly the probed partitions — the pruned read
    list (files under the other ``n_centroids - n_probe`` partition
    directories are never listed, let alone opened)."""
    import os

    out: list[str] = []
    for c in sorted(int(x) for x in probe_union):
        pdir = os.path.join(index_dir, _VECTORS_SUBDIR, f"{_PART_COL}={c}")
        if os.path.isdir(pdir):
            out.extend(
                os.path.join(pdir, f)
                for f in sorted(os.listdir(pdir))
                if f.endswith(".parquet")
            )
    return out


def knn_ivf_query(index_dir: str, queries: np.ndarray, k: int = 10,
                  n_probe: int = 4, id_column: str = "vec_id",
                  column: str = "embedding"):
    """Batched IVF query against a built index: pruned read of the union of
    the queries' probe partitions → per-batch top-k (each query ranks only
    vectors whose partition is in ITS OWN probe set) → tiny merge.
    """
    import ray
    import ray.data

    q = _normalize(np.asarray(queries, dtype=np.float64))
    cents = load_ivf_centroids(index_dir)
    probes = _probe_ids(cents, q, n_probe)
    union = sorted({int(c) for p in probes for c in p})
    paths = _probe_paths(index_dir, union)
    if not paths:
        return _merge_topk(ray.data.from_arrow(_empty_knn(id_column)), k, id_column)
    ds = ray.data.read_parquet(paths, columns=[id_column, column, "centroid_id"])
    q_ref = ray.put(q)
    probe_ref = ray.put([set(p.tolist()) for p in probes])

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, prs = ray.get(q_ref), ray.get(probe_ref)
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        if ids.size == 0:
            return _empty_knn(id_column)
        cid = np.asarray(batch["centroid_id"].to_pylist(), dtype=np.int64)
        mat = _normalize(np.array(batch[column].to_pylist(), dtype=np.float64))
        sims = qm @ mat.T  # (Q, B)
        out_q, out_id, out_cos = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cid, list(prs[qi]))
            if not mask.any():
                continue
            m_ids, row = ids[mask], sims[qi][mask]
            idx = np.lexsort((m_ids, -row))[: min(k, len(m_ids))]
            out_q.extend([qi] * len(idx))
            out_id.extend(m_ids[idx].tolist())
            out_cos.extend(row[idx].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                id_column: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_cos, pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow")
    return _merge_topk(cand, k, id_column)


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            n_probe: int = 4, seed: int = 42,
            id_column: str = "vec_id", column: str = "embedding",
            centroids: np.ndarray | None = None,
            index_dir: str | None = None):
    """IVF ANN, ad-hoc shape: build (or reuse) the physical index, then run
    the pruned-partition query.  Supports batched queries.

    Pass ``index_dir`` pointing at an existing :func:`build_ivf_index`
    output to skip the build (the serving path); otherwise a temp index is
    built and removed.  Recall < 1 by design — pytest asserts ≥ 0.9 vs the
    brute-force oracle.
    """
    import shutil
    import tempfile

    if index_dir is not None:
        return knn_ivf_query(index_dir, queries, k=k, n_probe=n_probe,
                             id_column=id_column, column=column)
    tmp = tempfile.mkdtemp(prefix="dtr_ivf_")
    try:
        build_ivf_index(ds, tmp, n_centroids=n_centroids, seed=seed,
                        id_column=id_column, column=column, centroids=centroids)
        return knn_ivf_query(tmp, queries, k=k, n_probe=n_probe,
                             id_column=id_column, column=column)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------- k-means
# integer-exact Lloyd iterations (the oracle-backed companion to the IVF
# trainer's float spherical k-means): vectors are scaled to int64
# millionths with a positive offset so BOTH engines' integer floor
# division agree (DuckDB // truncates toward zero on negatives, polars /
# python floor — nonnegative operands make them identical), distances are
# offset-invariant, and every argmin tie breaks on the lowest centroid id.

_KM_SCALE = 1_000_000
_KM_OFFSET = 10_000_000


def _to_int_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(col), -1)
    return np.floor(mat * _KM_SCALE + 0.5).astype(np.int64) + _KM_OFFSET


def kmeans_int(ds, k: int = 4, iterations: int = 2,
               id_column: str = "vec_id", column: str = "embedding",
               keep_vectors: bool = False, return_centroids: bool = False):
    """Distributed Lloyd k-means with integer-exact arithmetic.

    * init: centroids = the vectors with ``id < k`` (deterministic);
    * assign: broadcast the (k, dim) int64 centroid matrix (``ray.put``
      once per round), per batch a numpy ``(V-C)²`` argmin with ties to
      the lowest centroid id;
    * update: per-batch partial ``(cid, count, per-dim sums)`` rows — the
      combiner — merged on the driver (``k × dim`` ints per batch, the
      standard model-state-on-driver shape every distributed k-means
      uses); new centroid = per-dim ``sum // count`` (floor); clusters
      emptied by a round simply vanish (later rounds assign over the
      survivors), mirroring the SQL oracle's inner join.

    Returns a Dataset of ``(id_column, cluster_id:int64)`` after the
    final assignment pass; with ``keep_vectors=True`` the embedding
    column rides along too (same pass, no extra exchange — consumers
    like :func:`docling_translate_ray.functions.semdedup.semdedup` need
    the vectors grouped by cluster downstream).  With
    ``return_centroids=True`` returns ``(assignments, (cids, cmat))``
    — the exact int codebook the final assignment used.
    """
    import ray

    from docling_translate_ray.util import collect_to_table

    narrow = ds.select_columns([id_column, column])
    seed_rows = narrow.filter(expr=f"{id_column} < {k}").take_all()
    seed_rows.sort(key=lambda r: r[id_column])
    seed = pa.table({
        id_column: pa.array([r[id_column] for r in seed_rows], pa.int64()),
        column: pa.array([list(r[column]) for r in seed_rows]),
    })
    cids = np.asarray(seed[id_column].to_pylist(), dtype=np.int64)
    cmat = _to_int_matrix(seed, column)

    def assign(mat: np.ndarray, cids_now: np.ndarray, cmat_now: np.ndarray):
        # (B, K) squared L2 distances in int64; offset cancels out
        d = mat[:, None, :] - cmat_now[None, :, :]
        dist = np.einsum("bkd,bkd->bk", d, d)
        best = np.argmin(dist, axis=1)  # first minimum = lowest index;
        # cids_now is sorted ascending, so ties break on lowest cid
        return cids_now[best]

    partial_schema = pa.schema([
        ("cid", pa.int64()), ("cnt", pa.int64()),
        ("sums", pa.list_(pa.int64())),
    ])

    for _ in range(iterations):
        ref = ray.put((cids, cmat))

        def partials(batch: pa.Table) -> pa.Table:
            cn, cm = ray.get(ref)
            if batch.num_rows == 0:
                return partial_schema.empty_table()
            mat = _to_int_matrix(batch, column)
            a = assign(mat, cn, cm)
            rows_c, rows_n, rows_s = [], [], []
            for cid in np.unique(a):
                sel = mat[a == cid]
                rows_c.append(int(cid))
                rows_n.append(int(sel.shape[0]))
                rows_s.append(sel.sum(axis=0).tolist())
            return pa.table({
                "cid": pa.array(rows_c, pa.int64()),
                "cnt": pa.array(rows_n, pa.int64()),
                "sums": pa.array(rows_s, pa.list_(pa.int64())),
            })

        part = collect_to_table(
            narrow.map_batches(partials, batch_format="pyarrow"),
            empty_schema=partial_schema,
        )
        agg: dict[int, tuple[int, np.ndarray]] = {}
        for cid, cnt, sums in zip(part["cid"].to_pylist(),
                                  part["cnt"].to_pylist(),
                                  part["sums"].to_pylist()):
            n0, s0 = agg.get(cid, (0, 0))
            agg[cid] = (n0 + cnt, s0 + np.asarray(sums, dtype=np.int64))
        cids = np.array(sorted(agg), dtype=np.int64)
        cmat = np.stack([agg[c][1] // agg[c][0] for c in cids])

    final_ref = ray.put((cids, cmat))

    def final_assign(batch: pa.Table) -> pa.Table:
        cn, cm = ray.get(final_ref)
        empty = pa.schema(
            [(id_column, pa.int64()), ("cluster_id", pa.int64())]
            + ([(column, pa.list_(pa.float64()))] if keep_vectors else [])
        )
        if batch.num_rows == 0:
            return empty.empty_table()
        mat = _to_int_matrix(batch, column)
        cols = {
            id_column: batch[id_column].combine_chunks().cast(pa.int64()),
            "cluster_id": pa.array(assign(mat, cn, cm), pa.int64()),
        }
        if keep_vectors:
            cols[column] = batch[column].combine_chunks().cast(
                pa.list_(pa.float64()))
        return pa.table(cols)

    assigned = narrow.map_batches(final_assign, batch_format="pyarrow")
    if return_centroids:
        # the (cids, int-matrix) codebook the final assignment used —
        # consumers like functions/pq.py need the SAME centroids (one
        # more update step would diverge from the assignment)
        return assigned, (cids, cmat)
    return assigned
