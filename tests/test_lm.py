"""bigram_lm_score (functions/lm): pure-Python lockstep, partition
invariance, hash-key payload mode, and edge totality."""

import pyarrow as pa
import pytest

SCALE = 1_000_000


def _reference(docs):
    """20-line pure-Python model of the op's contract."""
    from collections import Counter

    c2: Counter = Counter()
    feats = {}
    for d, t in docs:
        ws = (t or "").split()
        bg = list(zip(ws, ws[1:]))
        if bg:
            feats[d] = Counter(bg)
            c2.update(bg)
    c1: Counter = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    v = len({w1 for (w1, _) in c2})
    s = {k: ((c + 1) * SCALE) // (c1[k[0]] + v) for k, c in c2.items()}
    out = {}
    for d, f in feats.items():
        n = sum(f.values())
        sc = sum(c * s[k] for k, c in f.items())
        out[d] = (n, sc, sc // n)
    return out


def _table(docs):
    return pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })


def _run(docs, tmp_path, **kw):
    import ray.data

    from docling_translate_ray.functions.lm import bigram_lm_score

    out = bigram_lm_score(
        ray.data.from_arrow(_table(docs)),
        scratch_dir=str(tmp_path / "lm_scratch"), **kw
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return {
        int(r.doc_id): (int(r.n_bigrams), int(r.lm_score), int(r.lm_avg))
        for r in out.itertuples()
    }


DOCS = [
    (0, "a b a b c"),
    (1, "a b"),
    (2, "z"),            # 1 token -> absent
    (3, None),           # null -> absent
    (4, "c c c"),
    (5, ""),             # empty -> absent
    (6, "b c b c b"),
]


def test_pinned_and_reference_lockstep(tmp_path):
    got = _run(DOCS, tmp_path, num_partitions=4)
    assert got == _reference(DOCS)
    # spot-pin one row so the contract can't drift silently with the
    # reference helper: doc 0 = bigrams ab,ba,ab,bc over the corpus
    assert got[0] == (4, got[0][1], got[0][1] // 4)
    assert set(got) == {0, 1, 4, 6}


def test_partition_invariance(tmp_path):
    a = _run(DOCS, tmp_path / "a", num_partitions=1)
    b = _run(DOCS, tmp_path / "b", num_partitions=7)
    assert a == b


def test_hash_keys_parity_and_payload_schema(tmp_path):
    import pyarrow.parquet as pq

    a = _run(DOCS, tmp_path / "s", num_partitions=4)
    b = _run(DOCS, tmp_path / "h", num_partitions=4, hash_keys=True)
    assert a == b
    # the persisted feature table (= the exchange payload) must carry
    # int64 keys in hashed mode — the 100 TB narrow-payload contract
    files = list((tmp_path / "h" / "lm_scratch").glob("*.parquet"))
    assert files
    sch = pq.read_schema(files[0])
    assert sch.field("w1").type == pa.int64()
    assert sch.field("w2").type == pa.int64()
    sch_s = pq.read_schema(
        next((tmp_path / "s" / "lm_scratch").glob("*.parquet")))
    assert sch_s.field("w1").type == pa.string()


def test_all_empty_corpus(tmp_path):
    import ray.data

    from docling_translate_ray.functions.lm import bigram_lm_score

    out = bigram_lm_score(
        ray.data.from_arrow(_table([(0, ""), (1, None), (2, "one")])),
        scratch_dir=str(tmp_path / "lm_scratch"), num_partitions=2)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "n_bigrams", "lm_score",
                                  "lm_avg"]


def test_fuzz_reference_lockstep(tmp_path):
    """Randomized corpora (seeded): whole-table equality with the
    pure-Python reference, including repeated-token runs and unicode."""
    import random

    rng = random.Random(11)
    vocab = ["a", "b", "ab", "käse", "字", "x1", "-", "a"]
    for trial in range(3):
        docs = []
        for d in range(rng.randrange(1, 25)):
            n = rng.randrange(0, 12)
            docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
        got = _run(docs, tmp_path / f"t{trial}", num_partitions=3)
        assert got == _reference(docs), docs


def test_score_bounds(tmp_path):
    got = _run(DOCS, tmp_path, num_partitions=4)
    for n, sc, avg in got.values():
        assert 0 <= sc <= n * SCALE
        assert avg == sc // n
