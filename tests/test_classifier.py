"""Trained NB-analog classifier (functions/classifier.py): planted-truth
separability (disjoint class vocabularies → held-out accuracy 1.0),
exact weight parity against a pure-python reference of the integer
formulation, and the unseen-bucket default path."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from docling_translate_ray.functions.classifier import _SCALE, nb_classify

_B = 256  # md5[:2] buckets (classifier default)


def _corpus(n: int = 80) -> pa.Table:
    # disjoint class vocabularies → linearly separable in bucket space
    pos_words = ["alpha", "bravo", "charlie", "delta"]
    neg_words = ["zulu", "yankee", "xray", "whiskey"]
    ids, texts, labels, is_train = [], [], [], []
    for i in range(n):
        words = pos_words if i % 2 == 0 else neg_words
        # vary length/composition deterministically
        toks = [words[(i + j) % len(words)] for j in range(3 + i % 5)]
        ids.append(i)
        texts.append(" ".join(toks))
        labels.append(i % 2 == 0)
        is_train.append(i < n // 2)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": texts, "label": labels,
                     "is_train": is_train})


def _pure_python_nb(tbl: pa.Table) -> dict[int, tuple[int, int, bool]]:
    """Sequential reference of the exact integer formulation."""
    rows = tbl.to_pylist()
    bucket = lambda w: hashlib.md5(w.encode()).hexdigest()[:2]
    n_pos: dict[str, int] = {}
    n_all: dict[str, int] = {}
    for r in rows:
        if not r["is_train"]:
            continue
        for w in r["text"].split():
            b = bucket(w)
            n_all[b] = n_all.get(b, 0) + 1
            if r["label"]:
                n_pos[b] = n_pos.get(b, 0) + 1
    np_tot = sum(n_pos.values())
    nn_tot = sum(n_all.values()) - np_tot

    def s_pair(p: int, g: int) -> tuple[int, int]:
        return (((p + 1) * _SCALE * (nn_tot + _B)) // ((g + 1) * (np_tot + _B)),
                ((g + 1) * _SCALE * (np_tot + _B)) // ((p + 1) * (nn_tot + _B)))

    out = {}
    for r in rows:
        if r["is_train"] or not r["text"].split():
            continue
        sp = sn = 0
        for w in r["text"].split():
            b = bucket(w)
            p = n_pos.get(b, 0)
            g = n_all.get(b, 0) - p
            wp, wn = s_pair(p, g)
            sp += wp
            sn += wn
        out[r["doc_id"]] = (sp, sn, sp > sn)
    return out


def test_planted_truth_separable_accuracy_and_reference_parity(ray_session):
    import ray.data

    tbl = _corpus()
    got = nb_classify(ray.data.from_arrow(tbl).repartition(4),
                      scratch_dir="/tmp/dtr_test_nb").take_all()
    assert len(got) == 40  # the held-out half, all with tokens
    # disjoint vocabularies: the learned filter must be perfect
    assert all(r["pred"] == r["label"] for r in got)
    # and every integer score must equal the sequential reference
    ref = _pure_python_nb(tbl)
    for r in got:
        sp, sn, pred = ref[r["doc_id"]]
        assert (r["score_pos"], r["score_neg"], r["pred"]) == (sp, sn, pred)


def test_unseen_bucket_default_and_tie_breaks_negative(ray_session):
    import ray.data

    base = _corpus(40)
    # a held-out doc whose vocabulary was never seen in training: every
    # bucket falls back to the all-smoothing default pair; with a
    # balanced-ish train split the two defaults differ only via class
    # totals, and pred must follow score_pos > score_neg exactly
    extra = pa.table({"doc_id": pa.array([999], pa.int64()),
                      "text": ["novel unseen vocabulary entirely"],
                      "label": [False], "is_train": [False]})
    tbl = pa.concat_tables([base, extra])
    got = {r["doc_id"]: r for r in nb_classify(
        ray.data.from_arrow(tbl).repartition(3),
        scratch_dir="/tmp/dtr_test_nb2").take_all()}
    ref = _pure_python_nb(tbl)
    sp, sn, pred = ref[999]
    r = got[999]
    assert (r["score_pos"], r["score_neg"], r["pred"]) == (sp, sn, pred)
    assert r["n_tokens"] == 4


def test_zero_token_docs_absent(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": ["alpha", "", "zulu", None],
                    "label": [True, True, False, False],
                    "is_train": [True, False, True, False]})
    got = nb_classify(ray.data.from_arrow(tbl),
                      scratch_dir="/tmp/dtr_test_nb3").take_all()
    # held-out = {1 (empty), 3 (null)} — both tokenless, so absent
    assert got == []
