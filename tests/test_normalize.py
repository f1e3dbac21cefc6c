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


def test_nfc_engines_agree_on_composition_hotspots():
    """polars (rust unicode-normalization) and DuckDB (utf8proc) NFC must
    agree or the oracle breaks on exotic text.  A full sweep over every
    assigned codepoint + base×combining pairs + Hangul jamo triples found
    ZERO divergences (session-4 audit); this pins the composition
    hotspots as a fast regression guard against version skew."""
    import duckdb
    import polars as pl

    bases = [chr(c) for c in list(range(0x41, 0x7B))
             + [0x3B1, 0x430, 0x1100, 0x1161, 0x3042, 0x4E2D]]
    marks = [chr(c) for c in range(0x300, 0x370)]
    vals = [b + m for b in bases for m in marks]
    vals += [chr(0x1100 + i) + chr(0x1161 + j) + chr(0x11A8)
             for i in range(19) for j in range(21)]
    p = pl.Series(vals).str.normalize("NFC").to_list()
    d = [r[0] for r in duckdb.connect().execute(
        "SELECT nfc_normalize(v) FROM (SELECT unnest(?) v)", [vals]).fetchall()]
    assert p == d


# ---- mojibake repair ------------------------------------------------


def test_mojibake_table_shape():
    from docling_translate_ray.functions.normalize import (
        MOJIBAKE_TABLE, MOJIBAKE_TARGETS, _cp1252_garble)

    assert len(MOJIBAKE_TABLE) == len(set(MOJIBAKE_TARGETS))
    gs = [g for g, _ in MOJIBAKE_TABLE]
    # no garble contains another (replace chain can't shadow a match)
    assert not [(a, b) for a in gs for b in gs if a != b and a in b]
    # frozen order: longest first, then lexicographic
    assert gs == sorted(gs, key=lambda g: (-len(g), g))
    for g, f in MOJIBAKE_TABLE:
        assert _cp1252_garble(f) == g
        assert len(f) == 1 and len(g) in (2, 3)


def test_mojibake_repairs_garbled_text():
    import pyarrow as pa

    from docling_translate_ray.functions.normalize import (
        MOJIBAKE_SAMPLE, _cp1252_garble, fix_mojibake_batch)

    garbled = _cp1252_garble(MOJIBAKE_SAMPLE)
    assert garbled != MOJIBAKE_SAMPLE
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array([garbled, "plain ascii", None])})
    rows = fix_mojibake_batch(t).to_pylist()
    assert rows[0]["text_fixed"] == MOJIBAKE_SAMPLE
    assert rows[0]["chars_removed"] == len(garbled) - len(MOJIBAKE_SAMPLE)
    assert rows[1] == {"doc_id": 1, "text_fixed": "plain ascii",
                       "chars_removed": 0}
    assert rows[2] == {"doc_id": 2, "text_fixed": "", "chars_removed": 0}


def test_mojibake_sql_chain_lockstep():
    """DuckDB's generated replace chain agrees with the polars kernel
    char-for-char — including on ADVERSARIAL self-referential input
    where a garble forms across a replacement boundary (the documented
    order-dependence: both sides run the same frozen order)."""
    import duckdb
    import pyarrow as pa

    from docling_translate_ray.functions.normalize import (
        MOJIBAKE_SAMPLE, MOJIBAKE_TABLE, _cp1252_garble,
        fix_mojibake_batch, mojibake_sql_expr, mojibake_sql_literal)

    garbled = _cp1252_garble(MOJIBAKE_SAMPLE)
    cases = [garbled, "clean", "", "Ã", "â€",          # bare prefixes
             "ââ‚¬¦",                                   # cascade case
             "".join(g for g, _ in MOJIBAKE_TABLE),     # every garble
             "Ã©" * 50 + "â€¦" * 50]
    t = pa.table({"doc_id": pa.array(range(len(cases)), pa.int64()),
                  "text": pa.array(cases, pa.string())})
    got = fix_mojibake_batch(t).to_pylist()
    con = duckdb.connect()
    for i, case in enumerate(cases):
        lit = mojibake_sql_literal(case) if case else "''"
        want, = con.execute(
            f"SELECT {mojibake_sql_expr(lit)}").fetchone()
        assert got[i]["text_fixed"] == want, (i, case)
        assert got[i]["chars_removed"] == len(case) - len(want)


def test_mojibake_dataset_wrapper(ray_session):
    import pyarrow as pa
    import ray.data

    from docling_translate_ray.functions.normalize import (
        MOJIBAKE_SAMPLE, _cp1252_garble, fix_mojibake_docs)

    garbled = _cp1252_garble(MOJIBAKE_SAMPLE)
    t = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([garbled if i % 3 == 0 else f"doc {i}"
                          for i in range(100)]),
    })
    rows = fix_mojibake_docs(ray.data.from_arrow(t)).take_all()
    assert len(rows) == 100
    for r in rows:
        if r["doc_id"] % 3 == 0:
            assert r["text_fixed"] == MOJIBAKE_SAMPLE
            assert r["chars_removed"] > 0
        else:
            assert r["chars_removed"] == 0
