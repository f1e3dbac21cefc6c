"""Declared-charset decoding (functions/charset.py): BOM / meta /
ladder precedence, alias resolution, lying declarations, the
vectorized-router fast path, and the poisoned-batch degraded path."""

import pyarrow as pa


def _run(blobs):
    from docling_translate_ray.functions.charset import decode_pages_batch

    t = pa.table({
        "doc_id": pa.array(range(len(blobs)), pa.int64()),
        "content": pa.array(blobs, pa.binary()),
    })
    return decode_pages_batch(t).to_pylist()


def test_bom_rungs_and_precedence_over_meta():
    import codecs

    out = _run([
        codecs.BOM_UTF8 + "hello".encode("utf-8"),
        codecs.BOM_UTF16_LE + "hi".encode("utf-16-le"),
        codecs.BOM_UTF16_BE + "hi".encode("utf-16-be"),
        # BOM must beat a (lying) declaration
        codecs.BOM_UTF8 + b'<meta charset="shift_jis">ok',
    ])
    assert [(r["codec"], r["evidence"], r["text"]) for r in out] == [
        ("utf-8", "bom", "hello"),
        ("utf-16-le", "bom", "hi"),
        ("utf-16-be", "bom", "hi"),
        ("utf-8", "bom", '<meta charset="shift_jis">ok'),
    ]


def test_declared_charsets_and_aliases():
    from docling_translate_ray.functions.charset import CHARSET_SAMPLES

    out = _run([
        ('<meta charset="ISO-8859-1">' + CHARSET_SAMPLES["cp1252"])
        .encode("cp1252"),
        ('<meta http-equiv="Content-Type" content="text/html; '
         'charset=Shift_JIS">' + CHARSET_SAMPLES["shift_jis"])
        .encode("shift_jis"),
        ("<meta charset='euc-kr'>" + CHARSET_SAMPLES["cp949"])
        .encode("cp949"),
        b'<meta charset="utf-8">plain',
    ])
    assert [(r["codec"], r["evidence"]) for r in out] == [
        ("cp1252", "meta"), ("shift_jis", "meta"),
        ("cp949", "meta"), ("utf-8", "meta")]
    assert out[0]["text"].endswith(CHARSET_SAMPLES["cp1252"])
    assert out[1]["text"].endswith(CHARSET_SAMPLES["shift_jis"])
    assert out[2]["text"].endswith(CHARSET_SAMPLES["cp949"])


def test_declaration_beyond_sniff_window_is_ignored():
    from docling_translate_ray.functions.charset import SNIFF_BYTES

    blob = b"x" * SNIFF_BYTES + b'<meta charset="shift_jis">tail'
    out = _run([blob])
    # routed (contains 'charset') but the sniffer window excludes it
    assert out[0]["evidence"] == "ladder"
    assert out[0]["codec"] == "utf-8"


def test_lying_or_unknown_declaration_falls_to_ladder():
    kr = "안녕하세요".encode("cp949")
    out = _run([
        b'<meta charset="utf-8">' + "안녕".encode("cp949"),  # lies
        b'<meta charset="klingon-8">ok',                     # unknown
        kr,                                                  # undeclared
    ])
    assert [(r["codec"], r["evidence"]) for r in out] == [
        ("cp949", "ladder"), ("utf-8", "ladder"), ("cp949", "ladder")]


def test_ladder_ignore_rung_and_nulls():
    # invalid in utf-8 AND cp949 (0x80 alone is a cp949 lead w/o tail)
    out = _run([b"ok\xff\xff\xffx", None, b""])
    assert out[0]["evidence"] == "ladder-ignore"
    assert out[0]["text"] == "okx"
    assert out[1]["text"] == "" and out[2]["text"] == ""


def test_poisoned_batch_keeps_clean_rows_identical():
    # one undeclared cp949 row degrades the cleared-set cast; every
    # clean row must come out byte-identical to the pure-fast path
    clean = [f"doc {i} plain ascii".encode() for i in range(8)]
    poisoned = clean + ["한글".encode("cp949")]
    out_fast = _run(clean)
    out_degraded = _run(poisoned)
    assert [r["text"] for r in out_degraded[:8]] == \
        [r["text"] for r in out_fast]
    assert out_degraded[8]["codec"] == "cp949"


def test_matches_reference_ladder_on_undeclared_rows():
    """Rung 3 must be bit-identical to extract_core.decode_bytes."""
    from docling_translate_ray.extract_core import decode_bytes

    blobs = [b"plain", "한글 텍스트".encode("cp949"), b"bad\xff\xfe-tail",
             "utf8 텍스트".encode("utf-8")]
    # (the third blob carries a utf-16 BOM mid-string, not at start)
    out = _run(blobs)
    for blob, row in zip(blobs, out):
        assert row["text"] == decode_bytes(blob)
