"""Bitext mining — mutual-nearest-neighbour alignment of two embedding
sides (parallel-corpus candidate pairs for translation training data).

Model: the margin/mutual-kNN mining behind CCMatrix / CCAligned /
LASER (Schwenk et al. 2019-2021): embed both language sides into one
space, take each source sentence's nearest target and keep the pair
only if it is MUTUAL (each side is the other's top-1).  Mutuality is a
rank decision — ``ORDER BY cos DESC, id`` — which is the same
order-robust comparison the ``knn_topk`` oracle already hash-matches
(float cosines differ between kernels in the last ulps, ranks do not
when neighbours aren't degenerate).

Physical shape: top-1 search here is the fenced exact tool — the
smaller side is collected ONCE to a driver matrix (loud failure past
``max_side_rows``, the repo's exact-tool convention), broadcast via
``ray.put``, and the other side streams through a chunked matmul per
batch; then the two best-pair tables (narrow ``(src_id, tgt_id)``
int64 rows) meet in ONE hash-partitioned semi-join for the mutuality
test.  At 10^12-document scale the broadcast stage is replaced by an
ANN probe per side (``functions.knn.build_ivf_index`` +
``knn_ivf_query`` — centroid-partitioned parquet, pruned reads); the
mutual-join stage is unchanged and is the part that must scale.

Reference parity note: the reference repo translates with a model; it
has no mining stage.  Beyond-reference training-data operator suite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PAIR_SCHEMA = pa.schema([
    ("src_id", pa.int64()),
    ("tgt_id", pa.int64()),
])


def _collect_matrix(ds, id_column: str, column: str, max_side_rows: int):
    rows = ds.select_columns([id_column, column]).take_all()
    if len(rows) > max_side_rows:
        raise ValueError(
            f"bitext_mine side has {len(rows)} rows "
            f"(> max_side_rows={max_side_rows}) — the broadcast exact path "
            "is fenced; use the IVF index (functions/knn.build_ivf_index) "
            "for candidate generation at this scale")
    rows.sort(key=lambda r: r[id_column])
    ids = np.array([r[id_column] for r in rows], dtype=np.int64)
    mat = np.array([r[column] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms[:, None]


def _best_against(ds, other_ref, id_column: str, column: str,
                  out_src: str, out_tgt: str):
    """Stream ``ds``; per row emit its top-1 neighbour in the broadcast
    other side (ties on cosine break to the LOWEST other-id — argmax
    returns the first maximum over ids sorted ascending, matching the
    oracle's ``ORDER BY cos DESC, id``)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        o_ids, o_unit = ray.get(other_ref)
        if batch.num_rows == 0:
            return pa.schema([(out_src, pa.int64()),
                              (out_tgt, pa.int64())]).empty_table()
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        mat = np.array(batch[column].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        sims = (mat / norms[:, None]) @ o_unit.T  # (B, n_other)
        best = o_ids[np.argmax(sims, axis=1)]
        return pa.table({out_src: pa.array(ids, pa.int64()),
                         out_tgt: pa.array(best, pa.int64())})

    return ds.select_columns([id_column, column]).map_batches(
        fn, batch_format="pyarrow")


def bitext_mine(ds_src, ds_tgt, id_column: str = "vec_id",
                column: str = "embedding", num_partitions: int = 32,
                max_side_rows: int = 2_000_000):
    """Mutual-top-1 pairs between two embedding datasets: returns a
    Dataset of ``(src_id, tgt_id)`` where tgt is src's nearest target
    AND src is tgt's nearest source (cosine, ties to the lower id)."""
    import ray

    from docling_translate_ray.stages.shuffle import partition_join

    src_ref = ray.put(_collect_matrix(ds_src, id_column, column,
                                      max_side_rows))
    tgt_ref = ray.put(_collect_matrix(ds_tgt, id_column, column,
                                      max_side_rows))

    best_st = _best_against(ds_src, tgt_ref, id_column, column,
                            "src_id", "tgt_id")
    best_ts = _best_against(ds_tgt, src_ref, id_column, column,
                            "tgt_id", "src_id")

    return partition_join(best_st, best_ts, on=["src_id", "tgt_id"],
                          how="semi", num_partitions=num_partitions)
