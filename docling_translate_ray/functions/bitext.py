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


# ---------------------------------------------------------------------------
# Gale-Church sentence alignment — the stage AFTER mining: given paired
# documents, align their sentence sequences into beads.

_GC_PENALTY = {  # -100·log(P(match type)/P(1-1)), Gale & Church 1993 tbl 5
    (1, 1): 0, (1, 0): 450, (0, 1): 450,
    (2, 1): 230, (1, 2): 230, (2, 2): 440,
}
_GC_MOVES = ((1, 1), (1, 0), (0, 1), (2, 1), (1, 2), (2, 2))
_GC_C = 1.0     # expected tgt chars per src char
_GC_S2 = 6.8    # variance per src char
_GC_BIG = 2500  # cost floor for vanishing probabilities

_BEAD_SCHEMA = pa.schema([
    ("pair_id", pa.int64()),
    ("bead_id", pa.int64()),
    ("src_lo", pa.int64()),
    ("src_n", pa.int64()),
    ("tgt_lo", pa.int64()),
    ("tgt_n", pa.int64()),
    ("bead", pa.string()),
])


def _gc_match_cost(l1: int, l2: int) -> float:
    """-100·log P(length delta) under the Gale-Church normal model."""
    import math

    if l1 == 0 and l2 == 0:
        return 0.0
    mean = (l1 + l2 / _GC_C) / 2.0
    z = (_GC_C * l1 - l2) / math.sqrt(_GC_S2 * mean)
    pd = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(z) / math.sqrt(2.0))))
    if pd > 0.0:
        return min(-100.0 * math.log(pd), _GC_BIG)
    return _GC_BIG


def _gc_align_one(src_lens: list[int], tgt_lens: list[int]):
    """Full O(n·m) DP over one sentence-length pair; returns beads as
    (src_lo, src_n, tgt_lo, tgt_n) in reading order.  Ties break to the
    earliest move in ``_GC_MOVES`` (strict improvement required), so the
    output is deterministic."""
    n, m = len(src_lens), len(tgt_lens)
    inf = float("inf")
    cost = [[inf] * (m + 1) for _ in range(n + 1)]
    back = [[None] * (m + 1) for _ in range(n + 1)]
    cost[0][0] = 0.0
    ps = [0]
    for v in src_lens:
        ps.append(ps[-1] + v)
    pt = [0]
    for v in tgt_lens:
        pt.append(pt[-1] + v)
    for i in range(n + 1):
        for j in range(m + 1):
            base = cost[i][j]
            if base == inf:
                continue
            for di, dj in _GC_MOVES:
                ni, nj = i + di, j + dj
                if ni > n or nj > m:
                    continue
                c = (base + _GC_PENALTY[(di, dj)]
                     + _gc_match_cost(ps[ni] - ps[i], pt[nj] - pt[j]))
                if c < cost[ni][nj]:
                    cost[ni][nj] = c
                    back[ni][nj] = (di, dj)
    beads = []
    i, j = n, m
    while i > 0 or j > 0:
        di, dj = back[i][j]
        i, j = i - di, j - dj
        beads.append((i, di, j, dj))
    beads.reverse()
    return beads


def gale_church_align(ds, id_column: str = "pair_id",
                      src_column: str = "src_sents",
                      tgt_column: str = "tgt_sents",
                      max_sentences: int = 5_000,
                      emit_text: bool = False,
                      passthrough: list[str] | None = None):
    """Align each row's two sentence lists into Gale-Church beads.

    Model: Gale & Church 1993, "A Program for Aligning Sentences in
    Bilingual Corpora" — dynamic programming over CHARACTER lengths
    with a normal model of length ratios (c=1, s²=6.8) and the paper's
    prior penalties for 1-1/1-0/0-1/2-1/1-2/2-2 beads.  Costs are
    floats but the DP runs wholly inside one task per pair with strict-
    improvement tie-breaking, so results are deterministic and
    partition-invariant; cross-engine float lockstep is NOT required
    because no hash-compared oracle exists for a DP (driver entry is
    rows-only; pytest pins golden beads + structural invariants).

    Physical shape: pure per-batch ``map_batches`` — each pair's DP is
    an independent unit of work (the row loop IS the work, not a
    disguised aggregation), so the operator scales linearly with pairs
    and never shuffles.  The DP is O(n·m) per pair; ``max_sentences``
    fences the exact tool loudly (the repo's convention) — production
    alignment of book-length pairs pre-splits on anchors first.

    Output: ``(pair_id, bead_id, src_lo, src_n, tgt_lo, tgt_n, bead)``
    where bead ∈ {"1-1","1-0","0-1","2-1","1-2","2-2"} and the beads
    partition both sentence ranges in order.  With ``emit_text=True``
    two more columns carry the space-joined bead text (``src_text``,
    ``tgt_text``) — the aligned sentence pairs a translation-training
    corpus actually consumes (deletion/insertion beads emit the empty
    string on the absent side, so downstream keeps or drops them by
    ``bead``).  ``passthrough`` columns are replicated onto every bead
    row of their pair (join-free lineage for composite pipelines).
    """
    passthrough = list(passthrough or [])

    def fn(batch: pa.Table) -> pa.Table:
        schema = _BEAD_SCHEMA
        if emit_text:
            schema = pa.schema(list(schema)
                               + [pa.field("src_text", pa.string()),
                                  pa.field("tgt_text", pa.string())])
        if passthrough:
            schema = pa.schema(
                list(schema) + [batch.schema.field(c) for c in passthrough])
        ids = batch[id_column].to_pylist()
        srcs = batch[src_column].to_pylist()
        tgts = batch[tgt_column].to_pylist()
        pcols = {c: batch[c].to_pylist() for c in passthrough}
        out = {k: [] for k in schema.names}
        for ridx, (pid, ss, ts) in enumerate(zip(ids, srcs, tgts)):
            ss = ss or []
            ts = ts or []
            if len(ss) > max_sentences or len(ts) > max_sentences:
                raise ValueError(
                    f"gale_church_align: pair {pid} has "
                    f"{len(ss)}×{len(ts)} sentences (> max_sentences="
                    f"{max_sentences}) — the O(n·m) exact DP is fenced; "
                    "pre-split on anchor points first")
            beads = _gc_align_one([len(s or "") for s in ss],
                                  [len(t or "") for t in ts])
            for b, (slo, sn, tlo, tn) in enumerate(beads):
                out["pair_id"].append(pid)
                out["bead_id"].append(b)
                out["src_lo"].append(slo)
                out["src_n"].append(sn)
                out["tgt_lo"].append(tlo)
                out["tgt_n"].append(tn)
                out["bead"].append(f"{sn}-{tn}")
                if emit_text:
                    out["src_text"].append(
                        " ".join(s or "" for s in ss[slo:slo + sn]))
                    out["tgt_text"].append(
                        " ".join(t or "" for t in ts[tlo:tlo + tn]))
                for c in passthrough:
                    out[c].append(pcols[c][ridx])
        return pa.table(out, schema=schema)

    return ds.select_columns(
        [id_column, src_column, tgt_column] + passthrough
    ).map_batches(fn, batch_format="pyarrow")
