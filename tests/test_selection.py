"""Tests for the data-selection operator family: SemDeDup
(functions/semdedup), DSIR importance scoring (functions/dsir) and
temperature language rebalancing (functions/sampling).

Ground truth is hand-computed in each test with an INDEPENDENT
formulation (explicit loops / dict models), never by re-running the
kernel's own code path.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

from docling_translate_ray.functions.dsir import dsir_score
from docling_translate_ray.functions.sampling import lang_rebalance
from docling_translate_ray.functions.semdedup import _prune_cluster, semdedup


def _to_table(ds) -> pa.Table:
    from docling_translate_ray.util import collect_to_table

    return collect_to_table(ds)


# ------------------------------------------------------------- semdedup


def _two_cluster_corpus():
    """8 vectors in 2 tight direction-clusters; within each cluster the
    later vectors are near-parallel (cos ~ 1) to the first."""
    rng = np.random.default_rng(7)
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    vecs, ids = [], []
    for i, base in enumerate([base_a] * 4 + [base_b] * 4):
        v = base * (1.0 + i) + rng.normal(0, 1e-3, 4)
        vecs.append(v.tolist())
        ids.append(i)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    })


def test_prune_cluster_keeps_lowest_id_per_group():
    # 4 rows: 0 and 2 are duplicates (cos=1); 1 and 3 are distinct
    mat = np.array([
        [1.0, 0.0],
        [0.0, 1.0],
        [2.0, 0.0],   # parallel to row 0 → dropped
        [1.0, 1.0],   # cos 0.707 to rows 0/2 → kept at thr 0.9
    ])
    kept = _prune_cluster(np.arange(4), mat, threshold=0.9)
    assert kept.tolist() == [True, True, False, True]


def test_prune_cluster_chunked_matches_unchunked():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(257, 8))
    mat[50] = mat[10] * 2.0   # plant a dup across the chunk boundary
    mat[200] = mat[199] * 0.5
    ids = np.arange(257)
    a = _prune_cluster(ids, mat, threshold=0.95, chunk=16)
    b = _prune_cluster(ids, mat, threshold=0.95, chunk=10_000)
    assert a.tolist() == b.tolist()
    assert not a[50] and not a[200]


def test_prune_cluster_zero_vectors_kept():
    mat = np.zeros((3, 4))
    mat[0, 0] = 1.0
    kept = _prune_cluster(np.arange(3), mat, threshold=0.9)
    # zero vectors: cosine defined 0 < threshold → all kept
    assert kept.tolist() == [True, True, True]


def test_semdedup_two_clusters():
    import ray.data

    got = _to_table(
        semdedup(ray.data.from_arrow(_two_cluster_corpus()),
                 k=2, iterations=2, threshold=0.99)
    ).to_pandas().set_index("vec_id").sort_index()
    # two clusters found, each of size 4
    assert got.groupby("cluster_id").size().tolist() == [4, 4]
    # cluster members agree with construction
    assert len(set(got.loc[[0, 1, 2, 3], "cluster_id"])) == 1
    assert len(set(got.loc[[4, 5, 6, 7], "cluster_id"])) == 1
    # within each cluster only the lowest id survives (all near-parallel)
    assert got["kept"].tolist() == [True, False, False, False,
                                    True, False, False, False]


def test_semdedup_cluster_size_fence():
    import ray.data

    with pytest.raises(ValueError, match="max_cluster_rows"):
        _to_table(semdedup(ray.data.from_arrow(_two_cluster_corpus()),
                           k=2, iterations=1, max_cluster_rows=2))


# ----------------------------------------------------------------- dsir


def test_dsir_score_matches_dict_model(tmp_path):
    import ray.data

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta beta", "alpha gamma", "", "delta delta alpha",
        ]),
        "is_target": pa.array([True, False, False, False]),
    })
    got = _to_table(
        dsir_score(ray.data.from_arrow(docs), scratch_dir=str(tmp_path / "f"))
    ).to_pandas().set_index("doc_id").sort_index()

    # independent dict model
    bucket = lambda w: hashlib.md5(w.encode()).hexdigest()[:2]
    n_r: dict[str, int] = {}
    n_t: dict[str, int] = {}
    rows = [(0, "alpha beta beta", True), (1, "alpha gamma", False),
            (2, "", False), (3, "delta delta alpha", False)]
    for _, text, tgt in rows:
        for w in text.split():
            b = bucket(w)
            n_r[b] = n_r.get(b, 0) + 1
            if tgt:
                n_t[b] = n_t.get(b, 0) + 1
    N_r, N_t = sum(n_r.values()), sum(n_t.values())
    S = {b: ((n_t.get(b, 0) + 1) * 1_000_000 * (N_r + 256))
         // ((n_r[b] + 1) * (N_t + 256)) for b in n_r}
    for doc_id, text, _ in rows:
        toks = text.split()
        if not toks:
            assert doc_id not in got.index  # zero-token docs absent
            continue
        want = sum(S[bucket(w)] for w in toks)
        assert got.loc[doc_id, "dsir_score"] == want
        assert got.loc[doc_id, "n_tokens"] == len(toks)
    # the target doc's own tokens score higher than a disjoint doc's
    assert got.loc[0, "dsir_score"] / got.loc[0, "n_tokens"] > \
        got.loc[3, "dsir_score"] / got.loc[3, "n_tokens"]


def test_dsir_scratch_is_cleaned_between_runs(tmp_path):
    import ray.data

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b", "c"]),
        "is_target": pa.array([True, False]),
    })
    d = str(tmp_path / "f")
    first = _to_table(dsir_score(ray.data.from_arrow(docs), scratch_dir=d))
    again = _to_table(dsir_score(ray.data.from_arrow(docs), scratch_dir=d))
    assert first.num_rows == again.num_rows == 2  # no stale-file doubling


# ------------------------------------------------------- lang_rebalance


def test_lang_rebalance_quota_and_rank(tmp_path):
    import ray.data

    # 9 'en' docs (isqrt=3 → quota 6 at scale 2), 2 'ko' docs (quota 2)
    texts = [f"text number {i}" for i in range(9)] + ["ko one", "ko two"]
    langs = ["en"] * 9 + ["ko"] * 2
    docs = pa.table({
        "doc_id": pa.array(list(range(11)), pa.int64()),
        "lang": pa.array(langs),
        "text": pa.array(texts),
    })
    got = _to_table(
        lang_rebalance(ray.data.from_arrow(docs), quota_scale=2,
                       hash_mode="md5")
    ).to_pandas()

    en_expect = sorted(
        range(9), key=lambda i: (hashlib.md5(texts[i].encode()).hexdigest(), i)
    )[: math.isqrt(9) * 2]
    assert sorted(got[got["lang"] == "en"]["doc_id"]) == sorted(en_expect)
    # ko smaller than quota → kept whole
    assert sorted(got[got["lang"] == "ko"]["doc_id"]) == [9, 10]

    # default (vectorized xx64): same quotas, same deterministic-rank
    # rule against the recomputed polars hash — only the hash differs
    import polars as pl

    got_xx = _to_table(
        lang_rebalance(ray.data.from_arrow(docs), quota_scale=2)
    ).to_pandas()
    hx = (pl.Series(texts[:9]).hash(seed=3).cast(pl.String)
          .str.zfill(20).to_list())
    en_expect_xx = sorted(range(9), key=lambda i: (hx[i], i))[:6]
    assert sorted(got_xx[got_xx["lang"] == "en"]["doc_id"]) == \
        sorted(en_expect_xx)
    assert sorted(got_xx[got_xx["lang"] == "ko"]["doc_id"]) == [9, 10]


def test_lang_rebalance_tie_break_on_id():
    import ray.data

    # identical texts → identical md5; rank must fall back to doc_id
    docs = pa.table({
        "doc_id": pa.array([5, 3, 8, 1], pa.int64()),
        "lang": pa.array(["xx"] * 4),
        "text": pa.array(["same"] * 4),
    })
    got = _to_table(
        lang_rebalance(ray.data.from_arrow(docs), quota_scale=1)
    ).to_pandas()
    # isqrt(4)=2 → quota 2; lowest ids win the tie
    assert sorted(got["doc_id"]) == [1, 3]


# ---------------------------------------------------------- bitext_mine


def _sides():
    import ray.data

    # src 0,2,4 / tgt 1,3,5 in 2-d direction space:
    #   src0 ~ tgt1 (mutual), src2 ~ tgt3 (mutual),
    #   src4 points between but nearest tgt3 — NOT mutual (tgt3's best
    #   source is src2), so src4 must be absent from the result
    src = pa.table({
        "vec_id": pa.array([0, 2, 4], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [0.0, 1.0], [0.35, 1.0]], pa.list_(pa.float64())),
    })
    tgt = pa.table({
        "vec_id": pa.array([1, 3, 5], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.05], [0.05, 1.0], [1.0, 1.0]], pa.list_(pa.float64())),
    })
    return ray.data.from_arrow(src), ray.data.from_arrow(tgt)


def test_bitext_mutual_top1():
    from docling_translate_ray.functions.bitext import bitext_mine

    src, tgt = _sides()
    got = _to_table(bitext_mine(src, tgt)).to_pandas()
    pairs = sorted(map(tuple, got[["src_id", "tgt_id"]].values.tolist()))
    # independent model: full cosine matrix by hand
    import itertools

    s = {0: [1.0, 0.0], 2: [0.0, 1.0], 4: [0.35, 1.0]}
    t = {1: [1.0, 0.05], 3: [0.05, 1.0], 5: [1.0, 1.0]}
    cos = {
        (a, b): np.dot(s[a], t[b])
        / (np.linalg.norm(s[a]) * np.linalg.norm(t[b]))
        for a, b in itertools.product(s, t)
    }
    best_st = {a: min(t, key=lambda b: (-cos[(a, b)], b)) for a in s}
    best_ts = {b: min(s, key=lambda a: (-cos[(a, b)], a)) for b in t}
    want = sorted((a, b) for a, b in best_st.items() if best_ts[b] == a)
    assert pairs == want
    assert (4, 3) not in pairs  # the non-mutual pair is excluded


def test_bitext_side_fence():
    from docling_translate_ray.functions.bitext import bitext_mine

    src, tgt = _sides()
    with pytest.raises(ValueError, match="max_side_rows"):
        bitext_mine(src, tgt, max_side_rows=2)


# -------------------------------------------------------------- mixture


def test_build_mixture_stats_and_stage_flow(tmp_path):
    import ray.data

    from docling_translate_ray.pipelines.mixture import build_mixture

    good = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field")
    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([good + f" variant {i}" for i in range(6)]
                         + ["!!!", "x"]),  # 2 fail the quality gate
        "lang": pa.array(["en"] * 4 + ["ko"] * 2 + ["en", "ko"]),
        "is_target": pa.array([True] + [False] * 7),
    })
    final, stats = build_mixture(
        ray.data.from_arrow(docs), work_dir=str(tmp_path / "w"),
        budget_pct=100)
    got = _to_table(final).to_pandas()
    assert stats["n_input"] == 8
    assert stats["n_quality"] == 6          # "!!!" and "x" rejected
    assert stats["n_selected"] == 6         # 100% budget keeps them all
    # quota at scale 8 exceeds both lang sizes → rebalance keeps all 6
    assert sorted(got["doc_id"]) == [0, 1, 2, 3, 4, 5]
    assert set(got.columns) == {"doc_id", "lang", "n_tokens", "dsir_score"}


def test_build_mixture_empty_when_nothing_survives(tmp_path):
    import ray.data

    from docling_translate_ray.pipelines.mixture import build_mixture

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["!!!", "??"]),  # both fail quality
        "lang": pa.array(["en", "en"]),
        "is_target": pa.array([True, False]),
    })
    final, stats = build_mixture(
        ray.data.from_arrow(docs), work_dir=str(tmp_path / "w"))
    assert stats == {"n_input": 2, "n_quality": 0, "n_selected": 0}
    assert _to_table(final).num_rows == 0


# ------------------------------------------------------ bpe_pair_counts


def test_bpe_pair_counts_dict_model():
    import ray.data

    from docling_translate_ray.functions.bpe import bpe_pair_counts

    texts = ["aaa bc bc", "ab 한국어 x", None, "  "]
    docs = pa.table({"text": pa.array(texts, pa.string())})
    got = bpe_pair_counts(ray.data.from_arrow(docs), k=100).to_pandas()

    # independent model: pairs with multiplicity over \S+ tokens
    acc: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split():
            for i in range(len(w) - 1):
                acc[w[i:i + 2]] = acc.get(w[i:i + 2], 0) + 1
    want = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(map(tuple, got.values.tolist())) == want
    # multiplicity: "aaa" contributes "aa" twice
    assert acc["aa"] == 2
    # unicode pairs are code-point based
    assert "한국" in acc


def test_lang_rebalance_rejects_bad_scale():
    import ray.data

    docs = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "lang": pa.array(["en"]),
        "text": pa.array(["x"]),
    })
    with pytest.raises(ValueError, match="quota_scale"):
        lang_rebalance(ray.data.from_arrow(docs), quota_scale=0)
