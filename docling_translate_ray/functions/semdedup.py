"""Semantic deduplication (SemDeDup) — cluster embeddings with k-means,
then drop, inside every cluster, any vector that has a higher-priority
near neighbour (cosine ≥ threshold).

Model: Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — k-means partitions the
corpus so the quadratic near-dup search runs only WITHIN a cluster
(cluster size is the knob: k ≈ n / target_cluster_size keeps each
cluster's all-pairs matmul bounded no matter the corpus size).  The
keep rule here is the deterministic variant the repo's oracles can
express: within a cluster, a vector is dropped iff some LOWER-id vector
of the same cluster is cosine-≥-threshold to it (priority = ascending
id; the paper keeps one representative per duplicate group — this rule
keeps the lowest-id member of every group and is exactly reproducible
in SQL with an EXISTS over i < j pairs).

Scale shape: clustering is :func:`..functions.knn.kmeans_int`
(integer-exact Lloyd — broadcast centroids, combiner partials, k×dim
ints on the driver); the ONLY corpus-sized exchange after that is one
cluster-keyed shuffle carrying (id, cluster_id, vector).  Pruning is
partition-local: a chunked ``mat @ mat.T`` against lower-id rows only,
O(cluster²) flops but O(chunk × cluster) memory.  ``max_cluster_rows``
fences the quadratic stage the way the repo fences every exact tool —
a cluster past the bound fails loudly (pick a larger k) instead of
silently OOMing a worker.

Reference parity note: the reference repo (docling-translate) has no
semantic dedup; this is part of the beyond-reference training-data
operator suite (SURVEY.md §2 "LLM-data ops").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

def _out_schema(id_column: str) -> pa.Schema:
    return pa.schema([
        (id_column, pa.int64()),
        ("cluster_id", pa.int64()),
        ("kept", pa.bool_()),
    ])


def _prune_cluster(ids: np.ndarray, mat: np.ndarray, threshold: float,
                   chunk: int = 1024) -> np.ndarray:
    """kept[j] = no i<j in this cluster with cos(i, j) >= threshold.

    ``ids`` must be sorted ascending; rows of ``mat`` in the same order.
    Chunked so peak memory is O(chunk × n) for an n-row cluster.
    """
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0  # zero vectors: cos defined as 0 ≤ thr
    unit = mat / norms[:, None]
    n = len(ids)
    kept = np.ones(n, dtype=bool)
    for lo in range(1, n, chunk):
        hi = min(lo + chunk, n)
        # rows lo..hi vs ALL earlier rows 0..hi (mask to strictly-lower)
        sims = unit[lo:hi] @ unit[:hi].T  # (hi-lo, hi)
        col = np.arange(hi)
        row = np.arange(lo, hi)
        lower = col[None, :] < row[:, None]
        kept[lo:hi] = ~((sims >= threshold) & lower).any(axis=1)
    return kept


def semdedup(ds, k: int = 4, iterations: int = 2, threshold: float = 0.9,
             id_column: str = "vec_id", column: str = "embedding",
             num_partitions: int = 32, max_cluster_rows: int = 500_000):
    """SemDeDup over ``(id_column, column)``: returns one row per input
    vector — ``(vec_id, cluster_id, kept)`` — where ``kept`` is False iff
    a lower-id vector of the same k-means cluster is cosine-≥-threshold.

    The drop decision compares float64 cosines against ``threshold`` on
    both engines (numpy normalized-dot here, DuckDB
    ``list_cosine_similarity`` in the oracle); callers must pick a
    threshold with real margin to the data (the planted-twin view used
    by the driver query has cos ≥ 0.999 for true pairs vs ≤ 0.52 for
    everything else — see ``plant_embedding_twins_batch``).
    """
    import polars as pl

    from docling_translate_ray.functions.knn import kmeans_int
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    assigned = kmeans_int(ds, k=k, iterations=iterations,
                          id_column=id_column, column=column,
                          keep_vectors=True)

    def prune_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _out_schema(id_column).empty_table()
        df = pl.from_arrow(part).sort([id_column])
        out_ids: list[np.ndarray] = []
        out_cids: list[np.ndarray] = []
        out_kept: list[np.ndarray] = []
        # a partition holds whole clusters (key = cluster_id); loop the
        # handful of clusters that landed here, vectorized inside each
        for (cid,), grp in df.group_by(["cluster_id"], maintain_order=True):
            if grp.height > max_cluster_rows:
                raise ValueError(
                    f"semdedup cluster {cid} has {grp.height} rows "
                    f"(> max_cluster_rows={max_cluster_rows}); increase k "
                    "so clusters stay bounded — the within-cluster search "
                    "is quadratic by design")
            ids = grp[id_column].to_numpy().astype(np.int64)
            mat = np.array(grp[column].to_list(), dtype=np.float64)
            out_ids.append(ids)
            out_cids.append(np.full(len(ids), cid, dtype=np.int64))
            out_kept.append(_prune_cluster(ids, mat, threshold))
        return pa.table({
            id_column: pa.array(np.concatenate(out_ids), pa.int64()),
            "cluster_id": pa.array(np.concatenate(out_cids), pa.int64()),
            "kept": pa.array(np.concatenate(out_kept), pa.bool_()),
        })

    return hash_partition_apply(
        assigned, ["cluster_id"], prune_partition,
        num_partitions=num_partitions,
    )
