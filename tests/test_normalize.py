"""Unicode normalization: engine parity, idempotence, flag semantics."""

from __future__ import annotations

import unicodedata

import pyarrow as pa

import ray.data

from docling_translate_ray.functions.normalize import normalize_docs

ADVERSARIAL = [
    "e\u0301 cafe\u0301",          # decomposed accents -> composed
    "a\x00b\x1fc\x7f",             # C0 + DEL stripped
    "x  y   z",                    # space runs collapse
    " lead trail ",                # edge spaces trim
    "\xa0nbsp\xa0",                # NBSP is NOT a space: untouched
    "tab\tkeep\nnl\rcr",           # tab/newline/CR survive
    None,
    "",
    "\ufb01 ligature",             # NFC keeps compatibility chars (not NFKC)
    "\uff76\uff80\uff76\uff85",    # half-width forms untouched under NFC
    "  ",                          # all-space -> empty
    "e\u0301\u0302 double mark",   # stacked combining marks
]


def _norm_ref(t):
    """Reference implementation via unicodedata (row-at-a-time)."""
    import re

    if t is None:
        return None
    t = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", t)
    t = unicodedata.normalize("NFC", t)
    t = re.sub(r" {2,}", " ", t)
    return t.strip(" ")


def _run(texts):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    out = normalize_docs(ds).to_pandas().sort_values("doc_id")
    return out


def test_matches_unicodedata_reference():
    out = _run(ADVERSARIAL)
    got = [None if v is None else v for v in out["text_norm"]]
    assert got == [_norm_ref(t) for t in ADVERSARIAL]


def test_changed_flag_null_safe():
    out = _run(ADVERSARIAL)
    by_id = dict(zip(out["doc_id"], out["changed"]))
    assert by_id[0]          # decomposed -> composed
    assert by_id[1]          # control strip
    assert not by_id[4]      # NBSP untouched
    assert not by_id[6]      # null vs null -> False (IS DISTINCT FROM)
    assert not by_id[7]      # "" vs "" -> False


def test_idempotent():
    once = _run(ADVERSARIAL)["text_norm"].tolist()
    twice = _run(once)["text_norm"].tolist()
    assert once == twice


def test_fuzz_totality_and_idempotence():
    """Random unicode soup: never raises, always idempotent."""
    import random

    rng = random.Random(11)
    pool = (list(range(0x20, 0x7f)) + [0x301, 0x302, 0xa0, 0x1, 0x7f, 0x9,
                                       0xa, 0xfb01, 0xff76, 0x4e2d, 0x1f600])
    texts = ["".join(chr(rng.choice(pool)) for _ in range(rng.randrange(40)))
             for _ in range(300)]
    once = _run(texts)["text_norm"].tolist()
    assert all(v is not None for v in once)
    assert _run(once)["text_norm"].tolist() == once
