"""Tests for the training-data-pipeline operator family
(functions/: dedup, knn, text_stats, multimodal).

Oracles: DuckDB SQL where the op is SQL-expressible (exact dedup, token
count, quality formulas, md5 fingerprints, brute-force knn), hand-built
ground truth otherwise (minhash/simhash/embedding near-dup on corpora with
planted duplicates).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from docling_translate_ray.functions import dedup as dd
from docling_translate_ray.functions import knn as knn_mod
from docling_translate_ray.functions import multimodal as mm
from docling_translate_ray.functions import text_stats as ts

SF = "/root/testdata/sf0.001"


def _docs_ds():
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet")


def _to_table(ds) -> pa.Table:
    batches = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


# ------------------------------------------------------------------ exact dedup


def test_exact_dedup_matches_duckdb():
    got = _to_table(dd.exact_dedup(_docs_ds(),
                                   hash_mode="md5")).sort_by("content_md5")
    want = duckdb.sql(
        f"""
        SELECT md5(text) AS content_md5, min(doc_id) AS doc_id,
               count(*)::BIGINT AS n_dups
        FROM read_parquet('{SF}/documents.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).arrow()
    assert got.num_rows == want.num_rows
    assert got["content_md5"].to_pylist() == want["content_md5"].to_pylist()
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["n_dups"].to_pylist() == want["n_dups"].to_pylist()


def test_exact_dedup_finds_planted_duplicates():
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": ["aaa bbb", "ccc", "aaa bbb", "ddd", "aaa bbb"],
        }
    )
    got = _to_table(dd.exact_dedup(ray.data.from_arrow(tbl)))
    by_id = {r["doc_id"]: r["n_dups"] for r in got.to_pylist()}
    assert by_id[0] == 3  # canonical = min id, counted 3 times
    assert by_id[1] == 1 and by_id[3] == 1
    assert got.num_rows == 3


# ------------------------------------------------------------------ minhash LSH


def _near_dup_corpus() -> pa.Table:
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while seven other animals watch from the tall green grass nearby"
    )
    mutated = base.replace("seven", "eight")  # ~1-word edit: jaccard >> 0.7
    other = (
        "completely different text about database query engines and "
        "distributed shuffle execution with arrow record batches"
    )
    return pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "text": [base, mutated, other, base],
        }
    )


def test_minhash_lsh_dedup_planted():
    import ray.data

    ds = ray.data.from_arrow(_near_dup_corpus())
    got = _to_table(dd.minhash_lsh_dedup(ds, threshold=0.5, concurrency=2))
    labels = {r["doc_id"]: r["canonical_id"] for r in got.to_pylist()}
    # 10, 11, 13 form a cluster with canonical 10; 12 is not near anything
    assert labels.get(11) == 10
    assert labels.get(13) == 10
    assert labels.get(10) == 10
    assert 12 not in labels


def test_dedup_keep_best_retention_policy():
    """Keep-best retention: the LONGEST member of a near-dup cluster
    survives (not the min id), ties go to the smaller id, and docs
    outside any cluster all survive."""
    import ray.data

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while seven other animals watch from the tall green grass nearby"
    )
    longer = base + " extra words"  # superset: high jaccard, MORE tokens
    other = (
        "completely different text about database query engines and "
        "distributed shuffle execution with arrow record batches"
    )
    tbl = pa.table({
        "doc_id": pa.array([1, 5, 9, 20], pa.int64()),
        "text": [base, base, longer, other],
    })
    got = _to_table(dd.dedup_keep_best(
        ray.data.from_arrow(tbl), threshold=0.5, concurrency=2))
    survivors = {r["doc_id"]: r["n_tokens"] for r in got.to_pylist()}
    # cluster {1, 5, 9}: 9 has the most tokens and wins despite max id
    assert set(survivors) == {9, 20}
    assert survivors[9] == len(longer.split())
    assert survivors[20] == len(other.split())


def test_dedup_keep_best_tie_breaks_to_min_id_and_passes_uniques():
    import ray.data

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while seven other animals watch from the tall green grass nearby"
    )
    tbl = pa.table({
        "doc_id": pa.array([7, 3], pa.int64()),
        "text": [base, base],  # identical → equal n_tokens → min id wins
    })
    got = _to_table(dd.dedup_keep_best(
        ray.data.from_arrow(tbl), threshold=0.5, concurrency=2))
    assert [r["doc_id"] for r in got.to_pylist()] == [3]

    uniq = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["alpha beta gamma delta epsilon",
                 "completely unrelated corpus about shuffle engines"],
    })
    got = _to_table(dd.dedup_keep_best(
        ray.data.from_arrow(uniq), threshold=0.5, concurrency=2))
    assert sorted(r["doc_id"] for r in got.to_pylist()) == [1, 2]


def test_minhash_transitive_closure():
    """A~B and B~C (but A≁C) must still form ONE cluster under min id."""
    import ray.data

    w = [f"w{i}" for i in range(60)]
    a = " ".join(w[:40])        # shares 30/40-ish with b
    b_ = " ".join(w[10:50])     # shares with both
    c = " ".join(w[20:60])      # shares with b, distant from a
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [a, b_, c],
        }
    )
    thr = 0.4
    assert dd.jaccard(a, b_) >= thr and dd.jaccard(b_, c) >= thr
    assert dd.jaccard(a, c) < thr
    got = _to_table(dd.minhash_lsh_dedup(ray.data.from_arrow(tbl),
                                         threshold=thr, concurrency=2))
    labels = {r["doc_id"]: r["canonical_id"] for r in got.to_pylist()}
    assert labels == {1: 1, 2: 1, 3: 1}  # one cluster, canonical = min id


def test_minhash_param_validation():
    import pytest as _pt
    import ray.data

    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                       "text": ["x"]}))
    with _pt.raises(ValueError):
        dd.minhash_lsh_dedup(ds, num_perm=8, num_bands=16)
    with _pt.raises(ValueError):
        dd.simhash_near_dup(ds, max_hamming=5)


def test_minhash_signature_jaccard_estimate():
    mh = dd.MinHasher(num_perm=128)
    t = _near_dup_corpus()
    s0 = mh.signature(t["text"][0].as_py())
    s1 = mh.signature(t["text"][1].as_py())
    s2 = mh.signature(t["text"][2].as_py())
    est_near = float(np.mean(s0 == s1))
    est_far = float(np.mean(s0 == s2))
    true_near = dd.jaccard(t["text"][0].as_py(), t["text"][1].as_py())
    assert abs(est_near - true_near) < 0.2
    assert est_far < 0.1


def test_minhash_batch_kernel_bit_identical_to_scalar():
    """signatures_batch (the flat per-perm segment-min kernel) must be
    BIT-identical to the per-document scalar path for every edge shape:
    empty, null, below-k-shingle, long, unicode whitespace — and across
    chunk boundaries (chunk cap forced tiny)."""
    mh = dd.MinHasher()
    texts = ["", None, "one", "one two", "one two three",
             "a b\tc  d\n e", "x " * 400] + [
        f"doc {i} alpha beta gamma delta {i % 7} " * (1 + i % 5)
        for i in range(200)
    ]
    ref = np.stack([mh.signature(t) for t in texts])
    assert np.array_equal(mh.signatures_batch(texts), ref)
    mh._CHUNK_SHINGLES = 17  # force many flat chunks mid-document-set
    assert np.array_equal(mh.signatures_batch(texts), ref)


# ------------------------------------------------------------------ simhash


def test_simhash_near_dup_planted():
    import ray.data

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [base, base, "unrelated words entirely different content here"],
        }
    )
    got = _to_table(dd.simhash_near_dup(ray.data.from_arrow(tbl), concurrency=2))
    labels = {r["doc_id"]: r["canonical_id"] for r in got.to_pylist()}
    assert labels.get(2) == 1  # identical docs: hamming 0
    assert 3 not in labels


def test_simhash_hamming_tracks_similarity():
    sh = dd.SimHasher()
    a = sh.simhash("the quick brown fox jumps over the lazy dog " * 10)
    b = sh.simhash("the quick brown fox jumps over the lazy cat " * 10)
    c = sh.simhash("entirely unrelated corpus of database words shuffle arrow")
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


# ------------------------------------------------------------------ embedding


def test_embedding_near_dup_planted():
    import ray.data

    rng = np.random.RandomState(7)
    v0 = rng.randn(32)
    v1 = v0 + rng.randn(32) * 0.01  # cosine ~ 1
    v2 = rng.randn(32)
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [v0.tolist(), v1.tolist(), v2.tolist()], pa.list_(pa.float64())
            ),
        }
    )
    got = _to_table(dd.embedding_near_dup(ray.data.from_arrow(tbl), threshold=0.95))
    labels = {r["vec_id"]: r["canonical_id"] for r in got.to_pylist()}
    assert labels.get(1) == 0
    assert 2 not in labels


# ------------------------------------------------------------------ knn


def _embeddings_ds():
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def _exact_topk_numpy(queries: np.ndarray, k: int):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = np.asarray(queries, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = q @ mat.T
    out = []
    for qi in range(q.shape[0]):
        idx = np.lexsort((ids, -sims[qi]))[:k]
        out.append(list(zip(ids[idx].tolist(), sims[qi][idx].tolist())))
    return out


def test_knn_brute_force_matches_numpy():
    import pyarrow.parquet as pq

    first = pq.read_table(f"{SF}/embeddings.parquet").slice(0, 2)
    queries = np.array(first["embedding"].to_pylist(), dtype=np.float64)
    got = knn_mod.knn_brute_force(_embeddings_ds(), queries, k=5)
    want = _exact_topk_numpy(queries, k=5)
    rows = got.to_pylist()
    for qi in range(2):
        got_ids = [r["vec_id"] for r in rows if r["query_idx"] == qi]
        want_ids = [vid for vid, _ in want[qi]]
        assert got_ids == want_ids
        got_cos = [r["cosine"] for r in rows if r["query_idx"] == qi]
        for gc, (_, wc) in zip(got_cos, want[qi]):
            assert abs(gc - wc) < 1e-9


def test_knn_ivf_is_subset_with_recall():
    import pyarrow.parquet as pq

    first = pq.read_table(f"{SF}/embeddings.parquet").slice(0, 1)
    queries = np.array(first["embedding"].to_pylist(), dtype=np.float64)
    exact = {vid for vid, _ in _exact_topk_numpy(queries, k=10)[0]}
    approx = knn_mod.knn_ivf(
        _embeddings_ds(), queries, k=10, n_centroids=8, n_probe=6
    )
    got = set(approx["vec_id"].to_pylist())
    # with 6/8 probes recall should be high; require at least half
    assert len(got & exact) >= 5
    # ranks are dense 1..n and cosines sorted desc
    cos = approx["cosine"].to_pylist()
    assert cos == sorted(cos, reverse=True)


def test_exact_dedup_repartition_invariant():
    import ray.data

    base = ray.data.read_parquet(f"{SF}/documents.parquet")
    a = _to_table(dd.exact_dedup(base.repartition(2))).sort_by("content_hash")
    b = _to_table(dd.exact_dedup(base.repartition(7))).sort_by("content_hash")
    assert a.equals(b)


def test_exact_dedup_hash_modes_agree_on_groups():
    # xx64 (production) and md5 (oracle) must produce the same winner
    # set — same ids, same n_dups — differing only in the key encoding
    ds = _docs_ds()
    xx = _to_table(dd.exact_dedup(ds)).sort_by("doc_id")
    md = _to_table(dd.exact_dedup(ds, hash_mode="md5")).sort_by("doc_id")
    assert xx.column_names == ["content_hash", "doc_id", "n_dups"]
    assert md.column_names == ["content_md5", "doc_id", "n_dups"]
    assert xx["doc_id"].to_pylist() == md["doc_id"].to_pylist()
    assert xx["n_dups"].to_pylist() == md["n_dups"].to_pylist()


def test_knn_repartition_invariant():
    import pyarrow.parquet as pq
    import ray.data

    first = pq.read_table(f"{SF}/embeddings.parquet").slice(0, 1)
    q = np.array(first["embedding"].to_pylist(), dtype=np.float64)
    base = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    a = knn_mod.knn_brute_force(base.repartition(2), q, k=8)
    b = knn_mod.knn_brute_force(base.repartition(5), q, k=8)
    assert a["vec_id"].to_pylist() == b["vec_id"].to_pylist()
    assert a["rank"].to_pylist() == b["rank"].to_pylist()


def test_minhash_repartition_invariant():
    import ray.data

    base = ray.data.read_parquet(f"{SF}/documents.parquet")
    a = {(r["doc_id"], r["canonical_id"])
         for r in _to_table(dd.minhash_lsh_dedup(base.repartition(2), concurrency=2)).to_pylist()}
    b = {(r["doc_id"], r["canonical_id"])
         for r in _to_table(dd.minhash_lsh_dedup(base.repartition(6), concurrency=2)).to_pylist()}
    assert a == b


# ------------------------------------------------------------------ text stats


def test_token_count_matches_duckdb():
    got = _to_table(
        _docs_ds().map_batches(ts.token_count_batch, batch_format="pyarrow")
    ).sort_by("doc_id")
    want = duckdb.sql(
        f"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT
                   AS n_tokens
        FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id
        """
    ).arrow()
    assert got["n_tokens"].to_pylist() == want["n_tokens"].to_pylist()


def test_fingerprint_md5_matches_duckdb():
    got = _to_table(
        _docs_ds().map_batches(ts.fingerprint_batch, batch_format="pyarrow")
    ).sort_by("doc_id")
    want = duckdb.sql(
        f"SELECT doc_id, md5(text) AS fp_md5 FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).arrow()
    assert got["fp_md5"].to_pylist() == want["fp_md5"].to_pylist()
    # rolling fingerprint: deterministic + order-sensitive
    fb = ts.fingerprint_batch(pa.table({"text": ["a b c", "c b a", "a b c"]}))
    rolls = fb["fp_roll"].to_pylist()
    assert rolls[0] == rolls[2] and rolls[0] != rolls[1]


def test_quality_matches_duckdb():
    got = _to_table(
        _docs_ds().map_batches(ts.quality_batch, batch_format="pyarrow")
    ).sort_by("doc_id")
    want = duckdb.sql(
        f"""
        WITH q AS (
          SELECT doc_id, length(text) AS n_chars,
                 CASE WHEN trim(text)='' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                 length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS np,
                 length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS nu,
                 length(text) - length(regexp_replace(text, '\\S', '', 'g')) AS nonws
          FROM read_parquet('{SF}/documents.parquet'))
        SELECT doc_id, n_chars,
               np / greatest(n_chars, 1) AS punct_ratio,
               nu / greatest(n_chars, 1) AS upper_ratio,
               nonws / greatest(n_tokens, 1) AS mean_token_len
        FROM q ORDER BY doc_id
        """
    ).arrow()
    assert got["n_chars"].to_pylist() == want["n_chars"].to_pylist()
    for col in ("punct_ratio", "upper_ratio", "mean_token_len"):
        g = got[col].to_pylist()
        w = want[col].to_pylist()
        assert all(abs(a - b) < 1e-12 for a, b in zip(g, w)), col


def test_token_count_bpe():
    b = ts.token_count_bpe_batch(pa.table({"text": ["abc de9f!?", "", "a1"]}))
    # abc|de|9|f|!? → 5 ; "" → 0 ; a|1 → 2
    assert b["n_tokens_bpe"].to_pylist() == [5, 0, 2]


def test_gopher_quality_rules():
    good = "the quick brown fox jumps over and over across the lazy sleepy dog today"
    bullets = "- one\n- two\n- three"
    symbols = "# # # # tag soup of hashes and more hashes everywhere ..."
    b = ts.gopher_quality_batch(pa.table({"text": [good, bullets, symbols, ""]}))
    rows = b.to_pylist()
    assert rows[0]["gopher_ok"] is True
    assert rows[1]["bullet_ratio"] == 1.0 and rows[1]["gopher_ok"] is False
    assert rows[2]["symbol_ratio"] > 0.1 and rows[2]["gopher_ok"] is False
    assert rows[3]["n_words"] == 0 and rows[3]["gopher_ok"] is False


def test_langid_heuristic():
    li = ts.LangId()
    assert li.detect_one("the cat sat on the mat and it is warm") == "en"
    assert li.detect_one("der Hund ist nicht zu Hause und die Katze") == "de"
    assert li.detect_one("안녕하세요 세계 여러분 모두 환영합니다") == "ko"
    assert li.detect_one("") == "und"
    batch = pa.table({"text": ["the cat is here", "el perro es un animal"]})
    out = li(batch)
    assert out["lang_pred"].to_pylist() == ["en", "es"]


# ------------------------------------------------------------------ multimodal


def test_media_featurizer_deterministic():
    import ray.data

    tbl = mm.gen_media(30, seed=42)
    assert tbl.schema.equals(mm.MEDIA_SCHEMA)
    ds = ray.data.from_arrow(tbl)
    out = _to_table(
        ds.map_batches(
            mm.MediaFeaturizer,
            fn_constructor_kwargs={"dim": 8},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
    ).sort_by("media_id")
    assert out.num_rows == 30
    assert out["payload_bytes"].to_pylist() == [
        len(p) for p in tbl.sort_by("media_id")["payload"].to_pylist()
    ]
    feats = out["features"].to_pylist()
    assert all(len(f) == 8 for f in feats)
    # same payload → same features (pure function of bytes)
    f2 = mm.MediaFeaturizer(dim=8)(tbl.slice(0, 5))
    assert f2["features"].to_pylist() == feats[:5]


def test_media_codecs_roundtrip_and_real_features():
    import numpy as np

    # BMP: pure-numpy encode/decode roundtrip (incl. non-4-multiple widths)
    for w, h in [(3, 2), (17, 5), (32, 32)]:
        img = np.random.RandomState(w * h).randint(
            0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (mm.decode_bmp(mm.encode_bmp(img)) == img).all()
    # WAV: stdlib encode/decode roundtrip
    samples = (np.sin(np.linspace(0, 20, 400)) * 5000).astype(np.int16)
    got, rate = mm.decode_wav(mm.encode_wav(samples, rate=8000))
    assert rate == 8000 and (got == samples).all()
    # features are REAL pixel/sample statistics, not payload hashes
    flat = np.full((4, 4, 3), 100, dtype=np.uint8)
    f = mm.MediaFeaturizer(dim=8)
    feats = f._decode(mm.encode_bmp(flat), "image")
    assert feats[0] == 4 and feats[1] == 4          # width, height
    assert feats[2] == 100.0 and feats[3] == 0.0    # mean, std
    afeat = f._decode(mm.encode_wav(samples), "audio")
    assert afeat[0] == len(samples) and afeat[1] == 8000
    assert abs(afeat[2] - np.sqrt((samples.astype(float) ** 2).mean())) < 1e-6


def test_media_featurizer_video_stub_and_invalid_payloads():
    f = mm.MediaFeaturizer(dim=8, video_fake=False)
    with pytest.raises(NotImplementedError):
        f._decode(b"abc", "video")
    with pytest.raises(ValueError):
        f._decode(b"not a bmp", "image")
    with pytest.raises(ValueError):
        f._decode(b"not a wav", "audio")


def test_frame_sample_plan():
    assert mm.frame_sample_plan(0) == []
    assert mm.frame_sample_plan(3500, 1000) == [0, 1000, 2000, 3000]


def test_media_resizer():
    import ray.data

    tbl = mm.gen_media(24, seed=42)
    out = _to_table(
        ray.data.from_arrow(tbl).map_batches(
            mm.MediaResizer,
            fn_constructor_kwargs={"max_w": 64, "max_h": 64},
            batch_format="pyarrow", batch_size=8, concurrency=2,
        )
    ).sort_by("media_id")
    src = tbl.sort_by("media_id").to_pylist()
    for before, after in zip(src, out.to_pylist()):
        if before["kind"] == "image":
            assert after["meta"]["width"] <= 64 and after["meta"]["height"] <= 64
            # aspect preserved (within integer rounding)
            if before["meta"]["width"] > 64 or before["meta"]["height"] > 64:
                r0 = before["meta"]["width"] / before["meta"]["height"]
                r1 = after["meta"]["width"] / after["meta"]["height"]
                assert abs(r0 - r1) / r0 < 0.25
            # REAL resize: the re-encoded BMP decodes to exactly the
            # dimensions the meta struct claims
            img = mm.decode_bmp(after["payload"])
            assert img.shape[0] == after["meta"]["height"]
            assert img.shape[1] == after["meta"]["width"]
        else:
            assert after["payload"] == before["payload"]  # non-images untouched
    with pytest.raises(ValueError):
        mm.MediaResizer()._resize(b"x", 4, 4)  # not a BMP


def test_frame_sampler_explodes_videos():
    import ray.data

    tbl = mm.gen_media(24, seed=42)
    frames = _to_table(
        ray.data.from_arrow(tbl).map_batches(
            mm.FrameSampler,
            fn_constructor_kwargs={"every_ms": 5000},
            batch_format="pyarrow", batch_size=8, concurrency=2,
        )
    )
    vids = {r["media_id"]: r["meta"]["duration_ms"]
            for r in tbl.to_pylist() if r["kind"] == "video"}
    expect = sum(len(mm.frame_sample_plan(d, 5000)) for d in vids.values())
    assert frames.num_rows == expect > 0
    assert set(frames["media_id"].to_pylist()) <= set(vids)
    # frames are deterministic per (payload, ts)
    one = frames.to_pylist()[0]
    again = mm.FrameSampler(every_ms=5000)(tbl)
    match = [r for r in again.to_pylist()
             if r["media_id"] == one["media_id"] and r["frame_ts_ms"] == one["frame_ts_ms"]]
    assert match and match[0]["frame"] == one["frame"]


def test_rep_signals_kernel():
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "spam spam spam spam spam spam",          # pure repetition
                "the quick brown fox jumps over a dog",   # all distinct
                "",                                        # empty
                "go go stop",                              # partial repeat
            ],
        }
    )
    out = ts.rep_signals_batch(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # spam doc: 6 words 1 distinct; 5 2grams all identical
    assert rows[0]["n_words"] == 6
    assert rows[0]["dup_word_frac"] == 5 / 6
    assert rows[0]["dup_2gram_frac"] == 4 / 5
    assert rows[0]["top_2gram_frac"] == 1.0
    assert not rows[0]["rep_ok"]
    # distinct doc passes every gate
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[1]["dup_2gram_frac"] == 0.0
    assert rows[1]["top_2gram_frac"] == 1 / 7
    # empty doc: all-zero signals, 0/0 guards -> passes frac gates except top
    assert rows[2]["n_words"] == 0
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top_2gram_frac"] == 0.0
    # go go stop: 3 words 2 distinct; 2grams ('go go','go stop') distinct
    assert rows[3]["dup_word_frac"] == 1 / 3
    assert rows[3]["dup_2gram_frac"] == 0.0
    assert rows[3]["top_2gram_frac"] == 1 / 2


def test_cosine_pairs_exact():
    import ray.data

    # planted geometry: v0≈v1 (cos≈0.995), v2 orthogonal, v3 = -v0
    vecs = [
        [1.0, 0.0, 0.0],
        [0.995, 0.0998, 0.0],
        [0.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0],
    ]
    tbl = pa.table({"vec_id": [0, 1, 2, 3],
                    "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    out = _to_table(knn_mod.cosine_pairs(ray.data.from_arrow(tbl), threshold=0.9))
    assert sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist())) == [(0, 1)]
    # threshold below the orthogonal pair picks up nothing extra at 0.5
    out2 = _to_table(knn_mod.cosine_pairs(ray.data.from_arrow(tbl), threshold=0.5))
    assert sorted(zip(out2["id_a"].to_pylist(), out2["id_b"].to_pylist())) == [(0, 1)]
    # partition invariance
    out3 = _to_table(
        knn_mod.cosine_pairs(ray.data.from_arrow(tbl).repartition(3), threshold=0.9)
    )
    assert sorted(out3.to_pylist(), key=str) == sorted(out.to_pylist(), key=str)
    # the O(n^2) fence raises
    with pytest.raises(ValueError):
        knn_mod.cosine_pairs(ray.data.from_arrow(tbl), threshold=0.9, max_rows=2)


def test_token_quantiles_matches_quantile_disc():
    import ray.data

    # adversarial multiset: heavy ties + a huge outlier + an empty doc
    texts = (["a b c"] * 7 + ["a"] * 5 + ["x " * 100] * 3 + [""] * 2
             + ["one two three four five six seven"])
    tbl = pa.table({"text": texts})
    got = ts.token_quantiles(ray.data.from_arrow(tbl).repartition(4))
    want = duckdb.sql(
        """
        WITH t AS (SELECT CASE WHEN trim(text)='' THEN 0
                        ELSE len(regexp_split_to_array(trim(text),'\\s+')) END AS n
                   FROM tbl)
        SELECT 'p25' AS q, quantile_disc(n, 0.25) AS v FROM t
        UNION ALL SELECT 'p50', quantile_disc(n, 0.50) FROM t
        UNION ALL SELECT 'p75', quantile_disc(n, 0.75) FROM t
        UNION ALL SELECT 'p90', quantile_disc(n, 0.90) FROM t
        UNION ALL SELECT 'p99', quantile_disc(n, 0.99) FROM t
        """
    ).fetchall()
    assert dict(zip(got["quantile"].to_pylist(), got["n_tokens"].to_pylist())) == dict(want)
    # empty corpus -> null quantiles, no crash
    empty = ts.token_quantiles(ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())})))
    assert empty["n_tokens"].to_pylist() == [None] * 5


def test_pack_sequences_prefix_sum():
    import ray.data

    from docling_translate_ray.functions.packing import pack_sequences

    # sparse, NON-contiguous ids across several range buckets
    ids = [3, 10, 251, 252, 700, 1200]
    texts = ["a b c", "d e", "f g h i", "", "j", "k l m n o p"]
    tbl = pa.table({"doc_id": ids, "text": texts})
    out = _to_table(
        pack_sequences(ray.data.from_arrow(tbl), capacity=5, bucket_width=250)
    ).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # hand-computed exclusive prefix in id order: 3,2,4,0,1,6 tokens
    expect = {3: 0, 10: 3, 251: 5, 252: 9, 700: 9, 1200: 10}
    assert {i: rows[i]["tok_offset"] for i in ids} == expect
    assert rows[251]["seq_id"] == 1 and rows[251]["seq_offset"] == 0
    assert rows[252]["seq_id"] == 1 and rows[252]["seq_offset"] == 4
    assert rows[1200]["seq_id"] == 2 and rows[1200]["seq_offset"] == 0
    # partition invariance (different input layout + partition counts)
    out2 = _to_table(
        pack_sequences(
            ray.data.from_arrow(tbl).repartition(4), capacity=5,
            bucket_width=250, num_partitions=7,
        )
    ).sort_by("doc_id")
    assert out2.to_pylist() == out.to_pylist()
    # empty input
    empty = _to_table(
        pack_sequences(
            ray.data.from_arrow(pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "text": pa.array([], pa.string())})),
            capacity=5,
        )
    )
    assert empty.num_rows == 0
    with pytest.raises(ValueError):
        pack_sequences(ray.data.from_arrow(tbl), capacity=0)


def test_decontaminate_strategies_agree():
    import ray.data

    from docling_translate_ray.functions.decontam import decontaminate

    corpus = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "alpha beta gamma delta epsilon zeta",   # shares 5-gram w/ eval
                "one two three four five six seven",     # clean
                "short doc",                              # < n words, never flagged
                "alpha beta gamma delta DIFFERENT tail", # only 4-gram overlap
                "",                                       # empty
            ],
        }
    )
    eval_set = pa.table(
        {"text": ["prefix alpha beta gamma delta epsilon end",
                  "totally unrelated benchmark question here today"]}
    )
    expect = {0: True, 1: False, 2: False, 3: False, 4: False}
    for strat in ("broadcast", "join"):
        out = _to_table(
            decontaminate(
                ray.data.from_arrow(corpus), ray.data.from_arrow(eval_set),
                n=5, strategy=strat, num_partitions=4,
            )
        )
        got = {r["doc_id"]: r["contaminated"] for r in out.to_pylist()}
        assert got == expect, (strat, got)
    # empty eval set: nothing flagged, both paths
    for strat in ("broadcast", "join"):
        out = _to_table(
            decontaminate(
                ray.data.from_arrow(corpus),
                ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())})),
                n=5, strategy=strat,
            )
        )
        assert not any(r["contaminated"] for r in out.to_pylist())
        assert out.num_rows == 5
    with pytest.raises(ValueError):
        decontaminate(ray.data.from_arrow(corpus),
                      ray.data.from_arrow(eval_set), strategy="nope")


def test_chunk_docs_overlap_properties():
    from docling_translate_ray.functions.packing import chunk_docs_batch

    toks = [f"w{i}" for i in range(150)]
    tbl = pa.table(
        {"doc_id": [0, 1, 2], "text": [" ".join(toks), "a b c", ""]}
    )
    out = chunk_docs_batch(tbl, window=64, stride=48)
    rows = [r for r in out.to_pylist() if r["doc_id"] == 0]
    # 150 tokens, stride 48 -> chunks start at 0,48,96,144 (4 chunks)
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in rows] == [64, 64, 54, 6]
    # each chunk is the exact token window
    for r in rows:
        s = r["chunk_id"] * 48
        assert r["chunk_text"] == " ".join(toks[s : s + 64])
    # stride-prefix reconstruction: first `stride` tokens of each chunk
    # (all of the last) tile the doc exactly
    rebuilt = []
    for r in rows:
        rebuilt.extend(r["chunk_text"].split(" ")[:48])
    assert rebuilt == toks
    # short doc -> one chunk; empty doc -> none
    assert [r["chunk_id"] for r in out.to_pylist() if r["doc_id"] == 1] == [0]
    assert not [r for r in out.to_pylist() if r["doc_id"] == 2]
    with pytest.raises(ValueError):
        chunk_docs_batch(tbl, window=8, stride=9)


def test_token_quantiles_grouped():
    import ray.data

    tbl = pa.table(
        {
            "text": ["a"] * 3 + ["a b c d"] * 5 + ["x y"] * 4,
            "lang": ["en"] * 3 + ["en"] * 5 + ["ko"] * 4,
        }
    )
    got = ts.token_quantiles(
        ray.data.from_arrow(tbl).repartition(3), group_column="lang"
    )
    want = duckdb.sql(
        """
        WITH t AS (SELECT lang, len(regexp_split_to_array(trim(text), '\\s+')) AS n FROM tbl)
        SELECT lang, 'p25' AS q, quantile_disc(n, 0.25) AS v FROM t GROUP BY lang
        UNION ALL SELECT lang, 'p50', quantile_disc(n, 0.50) FROM t GROUP BY lang
        UNION ALL SELECT lang, 'p75', quantile_disc(n, 0.75) FROM t GROUP BY lang
        UNION ALL SELECT lang, 'p90', quantile_disc(n, 0.90) FROM t GROUP BY lang
        UNION ALL SELECT lang, 'p99', quantile_disc(n, 0.99) FROM t GROUP BY lang
        """
    ).fetchall()
    got_set = set(zip(got["lang"].to_pylist(), got["quantile"].to_pylist(),
                      got["n_tokens"].to_pylist()))
    assert got_set == set(want)
    assert got.num_rows == 10  # 2 langs x 5 quantiles


def test_inverted_index_pruned_lookup(tmp_path):
    import shutil

    import ray.data

    from docling_translate_ray.functions import index as fidx

    filler = " ".join(f"filler{i}" for i in range(40))  # spread partitions
    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [f"apple banana apple {filler}", "banana cherry",
                     "apple date"],
        }
    )
    idx = str(tmp_path / "idx")
    fidx.build_inverted_index(ray.data.from_arrow(docs), idx, num_partitions=8)
    got = _to_table(fidx.lookup_postings(idx, ["apple", "cherry", "nope"]))
    rows = sorted((r["term"], r["doc_id"], r["tf"]) for r in got.to_pylist())
    assert rows == [("apple", 1, 2), ("apple", 3, 1), ("cherry", 2, 1)]
    # PRUNED-READ PROOF: delete every partition dir the probe set does not
    # touch — the answer must be unchanged (those dirs are never read)
    import os

    probed = {int(p) for p in fidx._term_partitions(
        ["apple", "cherry", "nope"], 8)}
    pdir = os.path.join(idx, "postings")
    removed = 0
    for d in os.listdir(pdir):
        part = int(d.split("=")[1])
        if part not in probed:
            shutil.rmtree(os.path.join(pdir, d))
            removed += 1
    assert removed > 0  # the probe really is a subset
    again = _to_table(fidx.lookup_postings(idx, ["apple", "cherry", "nope"]))
    assert sorted((r["term"], r["doc_id"], r["tf"]) for r in again.to_pylist()) == rows
    # rebuild wipes stale generations
    fidx.build_inverted_index(ray.data.from_arrow(docs), idx, num_partitions=8)
    rebuilt = _to_table(fidx.lookup_postings(idx, ["apple"]))
    assert sorted(r["doc_id"] for r in rebuilt.to_pylist()) == [1, 3]
    # miss-only lookup: empty but schema'd
    none = _to_table(fidx.lookup_postings(idx, ["zzz"]))
    assert none.num_rows == 0


def test_inverted_index_insert_matches_full_build(tmp_path):
    import ray.data

    from docling_translate_ray.functions import index as fidx

    filler = " ".join(f"filler{i}" for i in range(40))
    base = pa.table({
        "doc_id": [1, 2],
        "text": [f"apple banana apple {filler}", "banana cherry"],
    })
    inc = pa.table({
        "doc_id": [3, 4],
        "text": ["apple date", f"cherry cherry {filler}"],
    })
    both = pa.concat_tables([base, inc])

    idx = str(tmp_path / "idx_incr")
    fidx.build_inverted_index(ray.data.from_arrow(base), idx, num_partitions=8)
    fidx.inverted_index_insert(ray.data.from_arrow(inc), idx)

    full = str(tmp_path / "idx_full")
    fidx.build_inverted_index(ray.data.from_arrow(both), full, num_partitions=8)

    terms = ["apple", "banana", "cherry", "date", "filler7"]
    rows = lambda d: sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in _to_table(fidx.lookup_postings(d, terms)).to_pylist())
    assert rows(idx) == rows(full)  # insert ≡ full rebuild
    # ranked retrieval equal too (same postings → same integer scores)
    rank = lambda d: sorted(
        tuple(r.values())
        for r in _to_table(fidx.search_rank(d, ["apple", "cherry"],
                                            n_docs=4)).to_pylist())
    assert rank(idx) == rank(full)


def test_inverted_index_compact_lookup_equivalent(tmp_path):
    """Postings compaction: insert generations merge to one term-sorted
    file per tpart dir; lookups and ranked retrieval are unchanged;
    a second compact is a no-op."""
    import os

    import ray.data

    from docling_translate_ray.functions import index as fidx

    filler = " ".join(f"filler{i}" for i in range(40))
    idx = str(tmp_path / "idx")
    fidx.build_inverted_index(ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": [f"apple banana apple {filler}", "banana cherry"],
    })), idx, num_partitions=8)
    fidx.inverted_index_insert(ray.data.from_arrow(pa.table({
        "doc_id": [3], "text": ["apple date"]})), idx)
    fidx.inverted_index_insert(ray.data.from_arrow(pa.table({
        "doc_id": [4], "text": [f"cherry cherry {filler}"]})), idx)

    terms = ["apple", "banana", "cherry", "date", "filler7"]
    rows = lambda: sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in _to_table(fidx.lookup_postings(idx, terms)).to_pylist())
    rank = lambda: sorted(
        tuple(r.values())
        for r in _to_table(fidx.search_rank(idx, ["apple", "cherry"],
                                            n_docs=4)).to_pylist())
    before_rows, before_rank = rows(), rank()
    assert before_rows and before_rank

    stats = fidx.inverted_index_compact(idx)
    assert stats["partitions_compacted"] > 0
    base = os.path.join(idx, "postings")
    for d in os.listdir(base):
        pdir = os.path.join(base, d)
        if os.path.isdir(pdir):
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            assert len(files) == 1, (pdir, files)
    assert rows() == before_rows
    assert rank() == before_rank
    assert fidx.inverted_index_compact(idx)["partitions_compacted"] == 0


def test_bm25_rank_integer_exact_and_sane(tmp_path):
    """bm25_rank == the pure-python integer formula doc-for-doc; the
    milli scores track float BM25 (same integer idf analog) within
    rounding; longer docs score lower at equal tf; dl rides postings
    through build AND insert."""
    import ray.data

    from docling_translate_ray.functions import index as fidx

    pad = lambda n: " ".join(f"pad{i}" for i in range(n))
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "apple apple apple banana " + pad(6),   # dl 10, tf(apple)=3
            "apple banana " + pad(38),              # dl 40, tf(apple)=1
            "apple banana",                         # dl 2,  tf(apple)=1
            "cherry " + pad(9),                     # dl 10, no apple
        ],
    })
    idx = str(tmp_path / "bm25")
    fidx.build_inverted_index(ray.data.from_arrow(docs), idx,
                              num_partitions=8)

    # dl plumbing: every posting row carries its doc's total token count
    got_dl = {(r["doc_id"], r["term"]): r["dl"] for r in _to_table(
        fidx.lookup_postings(idx, ["apple", "cherry"], with_dl=True)
    ).to_pylist()}
    assert got_dl == {(1, "apple"): 10, (2, "apple"): 40, (3, "apple"): 2,
                      (4, "cherry"): 10}

    n_docs, avgdl = 4, (10 + 40 + 2 + 10) // 4
    out = {r["doc_id"]: (r["score_milli"], r["n_terms_matched"])
           for r in _to_table(fidx.bm25_rank(
               idx, ["apple", "banana"], n_docs=n_docs, avgdl=avgdl,
           )).to_pylist()}

    def ref_milli(tf, dl, df, k1m=1200, bm=750, S=1000):
        num = tf * (k1m + S) * S * S * avgdl
        den = tf * S * S * avgdl + k1m * ((S - bm) * avgdl + bm * dl)
        return (n_docs - df) * (num // den)

    # df(apple)=3, df(banana)=3
    want = {
        1: (ref_milli(3, 10, 3) + ref_milli(1, 10, 3), 2),
        2: (ref_milli(1, 40, 3) + ref_milli(1, 40, 3), 2),
        3: (ref_milli(1, 2, 3) + ref_milli(1, 2, 3), 2),
    }
    assert out == want

    # float-BM25 agreement (same idf analog) within 1 milli per term
    import math  # noqa: F401

    def ref_float(tf, dl, df, k1=1.2, b=0.75):
        return (n_docs - df) * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / avgdl)) * 1000
    for doc, (tf_a, dl_) in {1: (3, 10), 2: (1, 40), 3: (1, 2)}.items():
        approx = ref_float(tf_a, dl_, 3) + ref_float(1, dl_, 3)
        assert abs(out[doc][0] - approx) < (n_docs - 3) * 2 + 2

    # length normalization: doc 3 (short) > doc 2 (long), same tf
    assert out[3][0] > out[2][0]
    # saturation: tf 3 scores less than 3x tf 1 at equal dl
    assert want[1][0] < 3 * (ref_milli(1, 10, 3) + ref_milli(1, 10, 3))

    # insert path stores dl identically to a full rebuild
    inc = pa.table({"doc_id": [5], "text": ["apple " + pad(19)]})
    fidx.inverted_index_insert(ray.data.from_arrow(inc), idx)
    got5 = {r["doc_id"]: r["dl"] for r in _to_table(
        fidx.lookup_postings(idx, ["apple"], with_dl=True)).to_pylist()}
    assert got5[5] == 20 and got5[1] == 10

    # avgdl guard
    import pytest

    with pytest.raises(ValueError):
        fidx.bm25_rank(idx, ["apple"], n_docs=4, avgdl=0)


def test_hll_approx_distinct_accuracy_and_invariance():
    import polars as pl
    import ray.data

    from docling_translate_ray.functions import sketch as sk

    # accuracy across cardinalities (rel err ~1.04/sqrt(4096) ~ 1.6%)
    for n in (100, 5_000, 60_000):
        vals = pl.Series([f"item-{i}" for i in range(n)])
        regs = sk.hll_register_batch(vals, 12)
        est = sk.hll_estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)
    # merge = elementwise max: sketch(union) == max(sketch(a), sketch(b)),
    # including overlap (idempotence)
    a = pl.Series([f"x{i}" for i in range(3000)])
    b = pl.Series([f"x{i}" for i in range(1500, 4500)])
    ra, rb = sk.hll_register_batch(a, 12), sk.hll_register_batch(b, 12)
    ru = sk.hll_register_batch(pl.concat([a, b]), 12)
    assert (np.maximum(ra, rb) == ru).all()
    # Dataset path: layout-independent
    tbl = pa.table({"v": [f"k{i % 2500}" for i in range(10_000)]})
    e1 = sk.approx_distinct(ray.data.from_arrow(tbl), "v")
    e2 = sk.approx_distinct(ray.data.from_arrow(tbl).repartition(7), "v")
    assert e1["n_distinct_est"].to_pylist() == e2["n_distinct_est"].to_pylist()
    assert abs(e1["n_distinct_est"][0].as_py() - 2500) / 2500 < 0.05
    # empty dataset -> estimate 0
    e0 = sk.approx_distinct(
        ray.data.from_arrow(pa.table({"v": pa.array([], pa.string())})), "v"
    )
    assert e0["n_distinct_est"].to_pylist() == [0]
    with pytest.raises(ValueError):
        sk.approx_distinct(ray.data.from_arrow(tbl), "v", precision=8)


def test_pii_scrub_kernel():
    t = pa.table(
        {
            "text": [
                "mail me at john.doe+spam@sub.example.co.uk or call +1-555-0199 ok",
                "two mails a@b.io c.d@e.org and +44-123-4567",
                "no pii here",
                "",
            ]
        }
    )
    out = ts.pii_scrub_batch(t)
    rows = out.to_pylist()
    assert rows[0]["text_redacted"] == "mail me at <EMAIL> or call <PHONE> ok"
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1
    assert rows[1]["text_redacted"] == "two mails <EMAIL> <EMAIL> and <PHONE>"
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 1
    assert rows[2]["text_redacted"] == "no pii here"
    assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0
    assert rows[3]["text_redacted"] == ""


def test_cooccurrence_lift_ranking():
    import ray.data

    # "new york" always adjacent (high lift); "the cat/dog" spread over a
    # frequent unigram "the" (low lift)
    rows = (["new york is big and the cat sat on the mat today ok"] * 6
            + ["the dog sat by the door while new york slept deeply"] * 6)
    tbl = pa.table({"text": rows})
    got = ts.cooccurrence_lift(
        ray.data.from_arrow(tbl).repartition(3), k=10, min_count=5
    )
    want = duckdb.sql(
        """
        WITH tok AS (SELECT regexp_extract_all(text, '[^ ]+') AS ws FROM tbl),
        uni AS (SELECT w, count(*)::BIGINT AS c FROM (SELECT unnest(ws) AS w FROM tok) GROUP BY w),
        n AS (SELECT sum(c)::BIGINT AS n FROM uni),
        big AS (SELECT w1, w2, count(*)::BIGINT AS c_xy FROM (
            SELECT ws[i] AS w1, ws[i+1] AS w2 FROM tok, unnest(range(1, len(ws))) AS t(i))
          GROUP BY w1, w2),
        l AS (SELECT b.w1, b.w2, b.c_xy,
                (b.c_xy::DOUBLE * n.n::DOUBLE) / (u1.c::DOUBLE * u2.c::DOUBLE) AS lift
              FROM big b JOIN uni u1 ON b.w1=u1.w JOIN uni u2 ON b.w2=u2.w CROSS JOIN n
              WHERE b.c_xy >= 5)
        SELECT w1, w2, c_xy, lift,
               row_number() OVER (ORDER BY lift DESC, w1, w2) AS rank
        FROM l QUALIFY rank <= 10
        """
    ).arrow()
    assert got.num_rows == want.num_rows
    for col in ("w1", "w2", "c_xy", "lift", "rank"):
        assert got[col].to_pylist() == want[col].to_pylist(), col
    # always-adjacent "new york" outranks every pair diluted by the
    # frequent unigram "the"
    pairs = list(zip(got["w1"].to_pylist(), got["w2"].to_pylist()))
    ny = pairs.index(("new", "york"))
    for p in (("the", "cat"), ("the", "dog"), ("the", "mat"), ("the", "door")):
        if p in pairs:
            assert pairs.index(p) > ny, p


# ---------------------------------------------------------- image near-dup


def test_ahash_scale_and_noise_invariant():
    rng = np.random.RandomState(0)
    flat = np.full(64, 32, dtype=np.uint8)
    flat[rng.choice(64, size=24, replace=False)] = 224
    pattern = flat.reshape(8, 8)

    def render(scale: int, noise_seed: int) -> int:
        img = np.repeat(np.repeat(pattern, scale, 0), scale, 1)
        img = img[:, :, None].repeat(3, axis=2).astype(np.int16)
        nrng = np.random.RandomState(noise_seed)
        img = np.clip(img + nrng.randint(-8, 9, size=img.shape), 0, 255)
        return mm.ahash64(mm.decode_bmp(mm.encode_bmp(img.astype(np.uint8))))

    # same pattern at different scales / noise draws → identical hash
    assert render(2, 1) == render(5, 2) == render(3, 3)
    # an independent random pattern → far beyond any near-dup radius
    flat2 = np.full(64, 32, dtype=np.uint8)
    flat2[rng.choice(64, size=30, replace=False)] = 224
    img2 = np.repeat(np.repeat(flat2.reshape(8, 8), 3, 0), 3, 1)
    other = mm.ahash64(img2[:, :, None].repeat(3, 2).astype(np.uint8))
    assert bin(render(2, 1) ^ other).count("1") > 10


def _bruteforce_clusters(ids, sigs, max_hamming):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(sigs[i] ^ sigs[j])).count("1") <= max_hamming:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for i in ids:
        r = find(i)
        if r != i or any(find(j) == i for j in ids if j != i):
            out[i] = r
    return out  # only members of non-singleton clusters, like the op


def test_image_near_dup_matches_bruteforce():
    import ray.data

    tbl = mm.gen_image_corpus(40, 12, seed=7)
    got = _to_table(mm.image_near_dup(ray.data.from_arrow(tbl), concurrency=2))
    labels = {r["media_id"]: r["canonical_id"] for r in got.to_pylist()}

    sigs = np.array(
        [mm.ahash64(mm.decode_image(p.as_py())) for p in tbl["payload"]],
        dtype=np.uint64,
    )
    expect = _bruteforce_clusters(tbl["media_id"].to_pylist(), sigs, 3)
    assert labels == expect
    assert len(expect) >= 12  # every planted dup is in a cluster


def test_ahasher_drops_non_images():
    tbl = mm.gen_media(12, seed=42)  # mixed image/audio/video
    out = mm.AHasher()(tbl)
    assert out.num_rows == sum(1 for k in tbl["kind"].to_pylist() if k == "image")
    assert out.column_names == ["media_id", "ahash"]


def test_audio_hash_gain_and_noise_invariant():
    rng = np.random.RandomState(5)
    env = np.zeros(64, dtype=bool)
    env[rng.choice(64, size=24, replace=False)] = True

    def render(gain: float, noise_seed: int) -> int:
        nrng = np.random.RandomState(noise_seed)
        sigma = np.where(env, 3000.0, 300.0).repeat(125)
        samples = np.clip(nrng.randn(64 * 125) * sigma * gain,
                          -32000, 32000).astype(np.int16)
        return mm.audio_hash64(mm.decode_wav(mm.encode_wav(samples))[0])

    assert render(1.0, 1) == render(0.4, 2) == render(2.0, 3)
    # an independent envelope is far beyond the near-dup radius
    env2 = np.zeros(64, dtype=bool)
    env2[rng.choice(64, size=30, replace=False)] = True
    sigma2 = np.where(env2, 3000.0, 300.0).repeat(125)
    other = mm.audio_hash64(
        (np.random.RandomState(9).randn(64 * 125) * sigma2).astype(np.int16))
    assert bin(render(1.0, 1) ^ other).count("1") > 10


def test_audio_near_dup_matches_bruteforce():
    import ray.data

    tbl = mm.gen_audio_corpus(40, 12, seed=7)
    got = _to_table(mm.audio_near_dup(ray.data.from_arrow(tbl), concurrency=2))
    labels = {r["media_id"]: r["canonical_id"] for r in got.to_pylist()}

    sigs = np.array(
        [mm.audio_hash64(mm.decode_wav(p.as_py())[0]) for p in tbl["payload"]],
        dtype=np.uint64,
    )
    expect = _bruteforce_clusters(tbl["media_id"].to_pylist(), sigs, 3)
    assert labels == expect
    assert len(expect) >= 12


def test_audio_hasher_drops_non_audio():
    tbl = mm.gen_media(12, seed=42)
    out = mm.AudioHasher()(tbl)
    assert out.num_rows == sum(1 for k in tbl["kind"].to_pylist() if k == "audio")
    assert out.column_names == ["media_id", "audio_hash"]


# ---------------------------------------------------- incremental MinHash index


_IDX_CORPUS = [
    "the quick brown fox jumps over the lazy dog every single day",
    "the quick brown fox jumps over the lazy dog every single night",
    "completely different text about ray data streaming execution engines",
    "another unrelated document discussing parquet partitioning strategy",
    "yet more unique content on minhash locality sensitive hashing",
    "final doc with nothing in common with any of the others here",
]
_IDX_INCOMING = [
    (100, "the quick brown fox jumps over the lazy dog every single day"),
    (101, "completely different text about ray data streaming execution machines"),
    (102, "totally novel incoming page that matches nothing in the index"),
]


def _idx_corpus_ds():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(_IDX_CORPUS)), pa.int64()),
        "text": pa.array(_IDX_CORPUS, pa.string()),
    }))


def _idx_incoming_ds(rows=None):
    import ray.data

    rows = rows if rows is not None else _IDX_INCOMING
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _brute_cross_pairs(corpus, incoming, threshold_pct=70, k=3):
    out = set()
    for i, ta in enumerate(corpus):
        sa = frozenset(dd.word_shingles(ta, k))
        for nid, tb in incoming:
            sb = frozenset(dd.word_shingles(tb, k))
            union = len(sa | sb)
            if union == 0 or 100 * len(sa & sb) >= threshold_pct * union:
                out.add((i, nid))
    return out


def test_minhash_index_probe_matches_brute_force(tmp_path):
    idx = str(tmp_path / "idx")
    dd.build_minhash_index(_idx_corpus_ds(), idx, num_partitions=8,
                           doc_partitions=4, concurrency=2)
    got = {(r["index_id"], r["new_id"])
           for r in _to_table(dd.minhash_index_probe(
               _idx_incoming_ds(), idx, threshold=0.7, concurrency=2)).to_pylist()}
    assert got == _brute_cross_pairs(_IDX_CORPUS, _IDX_INCOMING)
    assert got  # non-vacuous


def test_minhash_index_probe_reads_only_probed_band_partitions(tmp_path):
    """The physical pruning proof (cf. the IVF partition-prune test):
    deleting every band partition the probe does NOT touch leaves the
    answer unchanged — the probe never opens them."""
    import os
    import shutil

    from docling_translate_ray.functions.dedup import (
        _BPART_COL, _INDEX_BANDS_SUBDIR, _add_bpart, _index_band_rows,
        _load_index_meta,
    )

    idx = str(tmp_path / "idx")
    dd.build_minhash_index(_idx_corpus_ds(), idx, num_partitions=16,
                           doc_partitions=4, concurrency=2)
    one = [_IDX_INCOMING[0]]
    baseline = {(r["index_id"], r["new_id"])
                for r in _to_table(dd.minhash_index_probe(
                    _idx_incoming_ds(one), idx, concurrency=2)).to_pylist()}
    meta = _load_index_meta(idx)
    needed = set()
    for b in _index_band_rows(_idx_incoming_ds(one), meta, 2) \
            .iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        needed.update(t[_BPART_COL].to_pylist())
    bands_dir = os.path.join(idx, _INDEX_BANDS_SUBDIR)
    removed = 0
    for d in os.listdir(bands_dir):
        if int(d.split("=")[1]) not in needed:
            shutil.rmtree(os.path.join(bands_dir, d))
            removed += 1
    assert removed > 0  # the prune is real, not vacuous
    again = {(r["index_id"], r["new_id"])
             for r in _to_table(dd.minhash_index_probe(
                 _idx_incoming_ds(one), idx, concurrency=2)).to_pylist()}
    assert again == baseline and baseline


def test_minhash_index_insert_is_live_and_append_safe(tmp_path):
    import os

    idx = str(tmp_path / "idx")
    dd.build_minhash_index(_idx_corpus_ds(), idx, num_partitions=8,
                           doc_partitions=4, concurrency=2)
    docs_dir = os.path.join(idx, "docs")
    n_files_before = sum(len(fs) for _, _, fs in os.walk(docs_dir))
    dd.minhash_index_insert(_idx_incoming_ds([
        (7, "totally novel incoming page that matches nothing in the index"),
    ]), idx, concurrency=2)
    # append wrote NEW files; the old generation is untouched
    assert sum(len(fs) for _, _, fs in os.walk(docs_dir)) > n_files_before
    got = {(r["index_id"], r["new_id"])
           for r in _to_table(dd.minhash_index_probe(
               _idx_incoming_ds(), idx, concurrency=2)).to_pylist()}
    want = _brute_cross_pairs(_IDX_CORPUS, _IDX_INCOMING) | {(7, 102)}
    assert got == want


def test_minhash_index_compact_probe_equivalent(tmp_path):
    """LSM compaction: after several insert generations, compact merges
    each partition directory to ONE file and the probe answer is
    unchanged; a leftover duplicate generation (the crash window) is
    healed by the unique() merge."""
    import os
    import shutil

    idx = str(tmp_path / "idx")
    dd.build_minhash_index(_idx_corpus_ds(), idx, num_partitions=8,
                           doc_partitions=4, concurrency=2)
    dd.minhash_index_insert(_idx_incoming_ds([
        (7, "totally novel incoming page that matches nothing in the index"),
    ]), idx, concurrency=2)
    dd.minhash_index_insert(_idx_incoming_ds([
        (8, "a second insert generation with fully unique page content"),
    ]), idx, concurrency=2)
    baseline = {(r["index_id"], r["new_id"])
                for r in _to_table(dd.minhash_index_probe(
                    _idx_incoming_ds(), idx, concurrency=2)).to_pylist()}
    assert baseline  # non-vacuous

    # simulate the crash window: one partition keeps a duplicate generation
    bands_dir = os.path.join(idx, "bands")
    some_pdir = sorted(os.path.join(bands_dir, d) for d in os.listdir(bands_dir)
                       if os.path.isdir(os.path.join(bands_dir, d)))[0]
    a_file = sorted(f for f in os.listdir(some_pdir) if f.endswith(".parquet"))[0]
    shutil.copy(os.path.join(some_pdir, a_file),
                os.path.join(some_pdir, "dup-generation.parquet"))

    stats = dd.minhash_index_compact(idx)
    assert stats["partitions_compacted"] > 0
    assert stats["files_after"] <= stats["files_before"]
    # every partition directory is now a single file
    for sub in ("bands", "docs"):
        base = os.path.join(idx, sub)
        for d in os.listdir(base):
            pdir = os.path.join(base, d)
            if os.path.isdir(pdir):
                files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
                assert len(files) == 1, (pdir, files)
    again = {(r["index_id"], r["new_id"])
             for r in _to_table(dd.minhash_index_probe(
                 _idx_incoming_ds(), idx, concurrency=2)).to_pylist()}
    assert again == baseline

    # idempotent: a second compact is a no-op
    stats2 = dd.minhash_index_compact(idx)
    assert stats2["partitions_compacted"] == 0
    assert stats2["files_before"] == stats2["files_after"]


def test_minhash_index_probe_requires_built_index(tmp_path):
    with pytest.raises(FileNotFoundError):
        dd.minhash_index_probe(_idx_incoming_ds(), str(tmp_path / "nope"))


def test_minhash_index_probe_paths_agree(tmp_path):
    """Broadcast (zero-shuffle) and tagged-union exchange candidate paths
    return identical pairs — the strategy switch is physical only."""
    idx = str(tmp_path / "idx")
    dd.build_minhash_index(_idx_corpus_ds(), idx, num_partitions=8,
                           doc_partitions=4, concurrency=2)
    a = {(r["index_id"], r["new_id"])
         for r in _to_table(dd.minhash_index_probe(
             _idx_incoming_ds(), idx, concurrency=2)).to_pylist()}
    b = {(r["index_id"], r["new_id"])
         for r in _to_table(dd.minhash_index_probe(
             _idx_incoming_ds(), idx, concurrency=2,
             broadcast_band_rows=0)).to_pylist()}
    assert a == b and a


# ------------------------------------------------------- token-budget select


def _budget_ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "score": pa.array([r[1] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
    }))


def _window_rule(rows, budget):
    """The global sort rule the distributed plan must reproduce."""
    run, out = 0, set()
    for did, score, nt in sorted(rows, key=lambda r: (-r[1], r[0])):
        run += nt
        if run <= budget:
            out.add(did)
    return out


def test_token_budget_select_matches_window_rule():
    from docling_translate_ray.functions.packing import token_budget_select

    rows = [(i, (i * 7) % 13, (i % 5) + 1) for i in range(40)]
    total = sum(r[2] for r in rows)
    for budget in (0, 1, total // 3, total // 2, total - 1, total, total + 5):
        got = {r["doc_id"] for r in token_budget_select(
            _budget_ds(rows), budget_tokens=budget).take_all()}
        assert got == _window_rule(rows, budget), f"budget={budget}"


def test_token_budget_select_boundary_ties_break_by_id():
    from docling_translate_ray.functions.packing import token_budget_select

    # all docs share one score: selection = by-id prefix of the cumsum
    rows = [(i, 5, 10) for i in range(10)]
    got = sorted(r["doc_id"] for r in token_budget_select(
        _budget_ds(rows), budget_tokens=35).take_all())
    assert got == [0, 1, 2]  # 3 * 10 <= 35 < 4 * 10


def test_token_budget_select_validation():
    from docling_translate_ray.functions.packing import token_budget_select

    with pytest.raises(ValueError):
        token_budget_select(_budget_ds([(1, 1, 1)]))
    with pytest.raises(ValueError):
        token_budget_select(_budget_ds([(1, 1, 1)]), budget_tokens=1,
                            budget_pct=10)
    with pytest.raises(ValueError):
        token_budget_select(
            _budget_ds([(i, 7, 1) for i in range(50)]),
            budget_tokens=10, max_boundary_rows=5,
        ).take_all()


def test_dedup_keep_best_repartition_invariant():
    import ray.data

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank while seven other animals watch from the grass")
    tbl = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": [base, base + " longer tail", base,
                 *[f"unique document number {i} with its own words zz{i}"
                   for i in range(9)]],
    })

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    a = rows(dd.dedup_keep_best(ray.data.from_arrow(tbl), threshold=0.5,
                                concurrency=2, num_partitions=4))
    b = rows(dd.dedup_keep_best(ray.data.from_arrow(tbl).repartition(5),
                                threshold=0.5, concurrency=2,
                                num_partitions=9))
    assert a == b
    # winner of the {0,1,2} cluster is doc 1 (most tokens)
    assert 1 in {r[0] for r in a} and 0 not in {r[0] for r in a}


def _bpe_reference(texts, n_merges):
    """Pure-Python canonical BPE trainer (Sennrich) — the lockstep
    reference for bpe_train: same tokenizer, same tie-break, same
    greedy merge."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in (t or "").split():
            wf[w] += 1
    vocab = {w: list(w) for w in wf if len(w) > 1}
    merges = []
    for r in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wf[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((r, a, b, n))
        from docling_translate_ray.functions.bpe import merge_word

        vocab = {w: s2 for w, s in vocab.items()
                 for s2 in [merge_word(s, a, b, a + b)] if len(s2) > 1}
    return merges


def test_bpe_train_matches_reference_and_is_partition_invariant():
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.bpe import bpe_train

    texts = [
        "aaaa aaa aa the the the cat sat on the mat",  # repeated-run words
        "the then there these theme",                  # shared prefixes
        "中中中 中文 中文 中文 🙂🙂 🙂🙂",               # CJK + emoji pairs
        "tie tie dye dye",                             # count ties -> lexicographic
        None, "", "x",                                 # null/empty/1-symbol words
    ]
    want = _bpe_reference(texts, 8)
    assert len(want) >= 5  # the fixture genuinely trains several merges

    # local path (default budget), distributed path (budget forced to 0),
    # and partition variation must all agree with the reference
    for nparts, max_local in ((1, 2_000_000), (7, 0), (7, 2_000_000)):
        ds = ray.data.from_arrow(pa.table({
            "text": pa.array(texts, pa.string())})).repartition(nparts)
        got = bpe_train(ds, n_merges=8, num_partitions=4,
                        max_local_vocab=max_local)
        rows = list(zip(got["merge_rank"].to_pylist(),
                        got["left"].to_pylist(),
                        got["right"].to_pylist(),
                        got["n_occurrences"].to_pylist()))
        assert rows == want, (nparts, rows, want)

    # canonical run semantics: merging (a,a) over "aaaa" must produce
    # the aa+aa split, i.e. the FIRST merge of the run-heavy fixture
    # counts "aaaa"->2 + "aaa"->1 + "aa"->1 pairs at rank where (a,a)
    # appears — already covered by reference equality above; pin the
    # kernel directly too:
    from docling_translate_ray.functions.bpe import merge_word

    assert merge_word(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert merge_word(list("aaa"), "a", "a", "aa") == ["aa", "a"]


def _bpe_encode_reference(texts, merges):
    """Pure-Python lockstep reference for bpe_encode: per word, apply the
    trained merges in rank order with the canonical greedy kernel."""
    from docling_translate_ray.functions.bpe import merge_word

    out = []
    for t in texts:
        words = (t or "").split()
        n_bpe = 0
        for w in words:
            syms = list(w)
            for a, b in merges:
                if len(syms) > 1 and a in syms and b in syms:
                    syms = merge_word(syms, a, b, a + b)
            n_bpe += len(syms)
        out.append((len(words), sum(len(w) for w in words), n_bpe))
    return out


def test_bpe_encode_matches_reference_and_training_state():
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.bpe import (
        BPEEncoder, bpe_encode, bpe_train, merge_word,
    )

    texts = [
        "aaaa aaa aa the the the cat sat on the mat",
        "the then there these theme",
        "中中中 中文 中文 中文 🙂🙂 🙂🙂",
        "tie tie dye dye",
        None, "", "x",
    ]
    train_ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())}))
    merges_tbl = bpe_train(train_ds, n_merges=8)
    merges = list(zip(merges_tbl["left"].to_pylist(),
                      merges_tbl["right"].to_pylist()))
    assert len(merges) >= 5

    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = sorted(
        (r["doc_id"], r["n_words"], r["n_chars_nonws"], r["n_bpe_tokens"])
        for r in bpe_encode(ray.data.from_arrow(docs).repartition(3),
                            merges_tbl, concurrency=2).take_all()
    )
    want = [(i, *row) for i, row in
            enumerate(_bpe_encode_reference(texts, merges))]
    assert got == want

    # a word from the training set must encode to its training-time
    # final symbol count: "the" is fully merged after 8 merges here
    enc = BPEEncoder(merges)
    assert enc._encoded_len("the") == 1
    # merges shrink, never grow, the sequence; unseen words still encode
    assert 1 <= enc._encoded_len("thethe") <= len("thethe")
    assert enc._encoded_len("zq") == 2  # pair never trained

    # memo path: second call hits the cache and must agree
    first = enc._encoded_len("theme")
    assert enc._encoded_len("theme") == first
    # direct kernel sanity on the canonical run semantics
    assert merge_word(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]


def test_bpe_encode_empty_and_table_or_pairs_input():
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.bpe import bpe_encode

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["ab ab", None], pa.string()),
    })
    # list-of-pairs input is accepted like the bpe_train table
    rows = sorted(
        (r["doc_id"], r["n_bpe_tokens"])
        for r in bpe_encode(ray.data.from_arrow(docs), [("a", "b")],
                            concurrency=1).take_all()
    )
    assert rows == [(1, 2), (2, 0)]  # "ab ab" -> 2 merged tokens; null -> 0


def _tiers_oracle(tbl):
    """DuckDB lockstep for quality_tiers (same SQL as the driver oracle,
    RE2 \\S stand-in is fine here: the fixture is ASCII)."""
    import duckdb

    con = duckdb.connect()
    con.register("documents", tbl)
    return sorted(tuple(r.values()) for r in con.execute("""
        WITH tf AS (
          SELECT doc_id, word AS term, count(*)::BIGINT AS tf FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(text, '[^ \t\n]+')) AS word
            FROM documents)
          GROUP BY doc_id, word),
        corpus AS (
          SELECT term, sum(tf)::BIGINT AS corpus_n FROM tf GROUP BY term),
        m AS (
          SELECT tf.doc_id,
                 (sum(tf.tf * corpus.corpus_n)::BIGINT
                  // sum(tf.tf)::BIGINT) AS int_mean
          FROM tf JOIN corpus USING (term) GROUP BY tf.doc_id),
        b AS (SELECT quantile_disc(int_mean, 1.0/3) AS b1,
                     quantile_disc(int_mean, 2.0/3) AS b2 FROM m)
        SELECT m.doc_id, m.int_mean,
               CASE WHEN m.int_mean <= b.b1 THEN 'tail'
                    WHEN m.int_mean <= b.b2 THEN 'middle'
                    ELSE 'head' END AS tier
        FROM m, b
    """).fetch_arrow_table().to_pylist())


def test_quality_tiers_matches_duckdb_and_extract_mode():
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.text_stats import quality_tiers

    # adversarial: heavy tie mass at the boundaries (many identical
    # docs), a zero-token doc (must be absent), rare-junk tail docs
    texts = (
        ["the the the common words here"] * 4
        + ["middling text with some shared words here"] * 6
        + [f"zzq{i}x qqj{i}w jjk{i}v" for i in range(8)]
        + ["", "   ", None]
    )
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    want = _tiers_oracle(tbl)
    assert {w[2] for w in want} == {"tail", "middle", "head"}

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    got = rows(quality_tiers(ray.data.from_arrow(tbl)))
    assert got == want
    # layout invariance
    got2 = rows(quality_tiers(ray.data.from_arrow(tbl).repartition(5),
                              num_partitions=7))
    assert got2 == want
    # zero-token docs are absent
    absent = {len(texts) - 3, len(texts) - 2, len(texts) - 1}
    assert absent.isdisjoint({r[0] for r in got})

    # extraction mode returns exactly the labeled subset
    head = rows(quality_tiers(ray.data.from_arrow(tbl), extract="head"))
    assert head == [w for w in want if w[2] == "head"] and head

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quality_tiers(ray.data.from_arrow(tbl), extract="best")


def test_quality_tiers_empty_and_degenerate():
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.text_stats import quality_tiers

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert quality_tiers(ray.data.from_arrow(empty)).take_all() == []

    # all docs identical -> one distinct score -> everything is one tier
    # ("tail": int_mean <= b1 == b2) — quantile_disc agrees by the rule
    same = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c"] * 3, pa.string()),
    })
    got = quality_tiers(ray.data.from_arrow(same)).take_all()
    assert {r["tier"] for r in got} == {"tail"}
    assert sorted(r["doc_id"] for r in got) == [1, 2, 3]


# ------------------------------------------------------------------ PNG codec


def test_png_roundtrip_all_filters_and_channels():
    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
        for ftype in range(5):
            data = mm.encode_png(img, filter_type=ftype)
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
            back = mm.decode_png(data)
            assert back.shape == img.shape and (back == img).all(), \
                (ch, ftype)


def test_png_decode_rejects_garbage_and_corruption():
    import pytest

    with pytest.raises(ValueError):
        mm.decode_png(b"not a png at all")
    good = bytearray(mm.encode_png(
        np.zeros((4, 4, 3), np.uint8), filter_type=1))
    good[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError):
        mm.decode_png(bytes(good))


def test_decode_image_sniffs_bmp_and_png_and_drops_alpha():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert (mm.decode_image(mm.encode_bmp(rgb)) == rgb).all()
    assert (mm.decode_image(mm.encode_png(rgb)) == rgb).all()
    rgba = np.concatenate(
        [rgb, np.full((6, 5, 1), 255, np.uint8)], axis=2)
    assert (mm.decode_image(mm.encode_png(rgba)) == rgb).all()
    gray = rgb[:, :, 0]
    assert (mm.decode_image(mm.encode_png(gray))
            == gray[:, :, None].repeat(3, 2)).all()
    import pytest

    with pytest.raises(ValueError):
        mm.decode_image(b"GIF89a...")


def test_png_rows_cluster_with_bmp_duplicates(ray_session):
    # gen_image_corpus mixes containers: a PNG dup of a BMP base must
    # land in the same near-dup cluster (the hash sees pixels)
    import ray.data

    tbl = mm.gen_image_corpus(15, 6, seed=7)
    payloads = [p.as_py() for p in tbl["payload"]]
    assert any(p[:8] == b"\x89PNG\r\n\x1a\n" for p in payloads)
    assert any(p[:2] == b"BM" for p in payloads)
    got = _to_table(mm.image_near_dup(ray.data.from_arrow(tbl),
                                      concurrency=2))
    labels = {r["media_id"]: r["canonical_id"] for r in got.to_pylist()}
    sigs = [mm.ahash64(mm.decode_image(p)) for p in payloads]

    def ham(a, b):
        return bin(a ^ b).count("1")

    # brute-force closure over ALL pairs ≤ 3 bits, regardless of format
    import itertools
    parent = list(range(len(sigs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(range(len(sigs)), 2):
        if ham(sigs[a], sigs[b]) <= 3:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    roots = Counter(find(i) for i in range(len(sigs)))
    want = {i: find(i) for i in range(len(sigs)) if roots[find(i)] > 1}
    assert labels == want
