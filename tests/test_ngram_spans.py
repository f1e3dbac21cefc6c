"""Duplicated n-gram span masking: handmade corpora pin the semantics."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from docling_translate_ray.functions.ngram_spans import dup_span_mask


def _run(texts, n=3, min_docs=2):
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = dup_span_mask(
        ray.data.from_arrow(tbl).repartition(3),
        n=n, min_docs=min_docs, num_partitions=4,
    )
    return {r["doc_id"]: (r["cleaned_text"], r["n_kept"], r["n_dropped"])
            for r in out.take_all()}


def test_shared_trigram_masked_in_both_docs():
    res = _run([
        "x a b c y",      # 'a b c' shared → a,b,c masked
        "z a b c w",
        "totally unrelated words here",
    ])
    assert res[0] == ("x y", 2, 3)
    assert res[1] == ("z w", 2, 3)
    assert res[2] == ("totally unrelated words here", 4, 0)


def test_within_doc_repeat_alone_not_masked():
    # the trigram repeats INSIDE doc 0 but appears in only 1 distinct doc
    res = _run([
        "a b c a b c",
        "different text entirely okay",
    ])
    assert res[0] == ("a b c a b c", 6, 0)


def test_overlapping_spans_union_coverage():
    # docs share the 4-token run 'a b c d' → two overlapping trigrams;
    # coverage is the union, each token dropped once
    res = _run([
        "p a b c d q",
        "r a b c d s",
    ])
    assert res[0] == ("p q", 2, 4)
    assert res[1] == ("r s", 2, 4)


def test_fully_masked_doc_yields_empty_text():
    res = _run(["a b c", "a b c"])
    assert res[0] == ("", 0, 3)
    assert res[1] == ("", 0, 3)


def test_docs_shorter_than_n_pass_through():
    res = _run(["a b", "a b", "c"])
    assert res[0] == ("a b", 2, 0)
    assert res[1] == ("a b", 2, 0)
    assert res[2] == ("c", 1, 0)

def test_key_modes_agree_and_hash_payload_is_int64():
    """Round-3 scale fix: the dup-detection exchange carries (key:int64,
    doc, pos) — never gram strings — and at test scale (no 64-bit
    collisions) hash64 output is bit-identical to the string plan."""
    from docling_translate_ray.functions.ngram_spans import make_gram_batch_fn

    texts = [
        f"common run one two three four five tail{i} extra words {i}"
        for i in range(6)
    ] + ["nothing shared in this document at all"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })

    # payload schema: hash mode exchanges int64 keys, string mode strings
    hashed = make_gram_batch_fn("text", "doc_id", 5, "hash64")(tbl)
    stringy = make_gram_batch_fn("text", "doc_id", 5, "string")(tbl)
    assert hashed.schema.field("gram").type == pa.int64()
    assert pa.types.is_string(stringy.schema.field("gram").type) or \
        pa.types.is_large_string(stringy.schema.field("gram").type)
    assert hashed.num_rows == stringy.num_rows
    # exchange-bytes A/B: int64 keys are >= 4x narrower than gram strings
    ratio = stringy["gram"].nbytes / hashed["gram"].nbytes
    assert ratio >= 4.0, f"gram key narrowing only {ratio:.1f}x"

    def run(mode):
        out = dup_span_mask(
            ray.data.from_arrow(tbl).repartition(3),
            n=5, num_partitions=4, key_mode=mode,
        )
        return sorted((r["doc_id"], r["cleaned_text"], r["n_kept"], r["n_dropped"])
                      for r in out.take_all())

    assert run("hash64") == run("string")
