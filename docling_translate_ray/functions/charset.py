"""Declared-charset decoding — the CCNet/trafilatura encoding slot.

The reference decodes every page with a fixed utf-8 → cp949 →
utf-8(ignore) ladder (text_parser.py:137-144, re-expressed in
extract_core.decode_bytes).  Real web corpora carry their encoding
IN-BAND — a BOM, or a ``<meta charset=..>`` / ``http-equiv``
declaration in the first kilobyte — and honoring it recovers the
2-5 % of the web that is not UTF-8 (shift_jis / euc-kr / gb18030 /
cp125x legacy pages) instead of mojibaking it through the ladder.
This module adds that evidence ladder, frozen:

    1. BOM       (utf-8-sig, utf-16-le, utf-16-be)
    2. declared  (``charset=X`` within the first SNIFF_BYTES bytes,
                  resolved through the WHATWG-ish alias table; an
                  alias we don't know falls through to rung 3)
    3. ladder    (the reference's utf-8 → cp949 → utf-8-ignore)

Scale design — the decode stays vectorized where the bytes are:
a polars router first splits each batch with VECTORIZED binary
kernels (``bin.starts_with`` for BOMs, ``bin.contains(b"charset")``
as a cheap superset gate for rung 2); rows the router clears go
straight to one arrow/polars binary→utf8 cast (C++-side validation,
zero Python).  Only routed rows — BOM carriers, pages that mention
``charset`` anywhere, and cast failures — reach the Python sniffer,
and that sniffer reads a ≤ SNIFF_BYTES prefix, never the body.  Rows
whose *declared* charset resolves to utf-8 (the overwhelming declared
majority) rejoin the vectorized cast path; per-row Python ``decode``
is paid only by the true non-utf-8 remainder plus ladder failures.
At 100 TB that keeps the O(bytes) work in native kernels and the
O(rows) Python work bounded by a 1 KiB prefix on a minority of rows.

The SQL oracle cannot decode bytes, so the driver query plants
content bytes from frozen per-codec samples and the oracle replants
the *expected decoded string* from the same constants (chr()-literal
transport, the fix_mojibake recipe) — end-output equality, with a
BOM-vs-declaration conflict residue pinning rung precedence.
"""

from __future__ import annotations

import re

import pyarrow as pa

SNIFF_BYTES = 1024

# BOM → (python codec, reported codec label); the python codec is the
# BOM-consuming variant (utf-8-sig strips it; bare utf-16 reads the
# BOM for endianness AND strips it — utf-16-le/-be would keep it as a
# ZWNBSP).  The three prefixes are mutually exclusive.
BOMS = ((b"\xef\xbb\xbf", "utf-8-sig", "utf-8"),
        (b"\xff\xfe", "utf-16", "utf-16-le"),
        (b"\xfe\xff", "utf-16", "utf-16-be"))

# WHATWG-ish declared-label → python codec.  latin-1/iso-8859-1 map
# to cp1252 (the WHATWG superset every browser actually uses);
# gb2312/gbk map to gb18030 likewise.  Unknown labels fall through to
# the ladder — a lying or exotic declaration must never crash a page.
CHARSET_ALIASES: dict[str, str] = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "latin-1": "cp1252", "latin1": "cp1252", "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252", "windows-1252": "cp1252", "cp1252": "cp1252",
    "euc-kr": "cp949", "euckr": "cp949", "ks_c_5601-1987": "cp949",
    "cp949": "cp949",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis",
    "euc-jp": "euc_jp",
    "gb2312": "gb18030", "gbk": "gb18030", "gb18030": "gb18030",
    "big5": "big5",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "koi8-r": "koi8_r",
    "iso-8859-2": "iso8859_2", "windows-1250": "cp1250",
}

# ASCII-superset scan over the raw prefix: every codec above is
# ASCII-transparent in the region where the declaration itself lives
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([a-zA-Z0-9_.:+-]+)",
                         re.IGNORECASE)


def sniff_charset(data: bytes) -> tuple[str, str] | None:
    """(python codec, evidence) from BOM or declaration; None ⇒ rung 3.

    Reads at most ``SNIFF_BYTES`` + the BOM prefix; never the body.
    """
    for bom, codec, _label in BOMS:
        if data.startswith(bom):
            return codec, "bom"
    m = _CHARSET_RE.search(data[:SNIFF_BYTES])
    if m:
        label = m.group(1).decode("ascii", "ignore").lower().rstrip(".")
        codec = CHARSET_ALIASES.get(label)
        if codec:
            return codec, "meta"
    return None


def decode_with_ladder(data: bytes) -> tuple[str, str, str]:
    """(text, codec label, evidence) via the reference ladder
    (extract_core.decode_bytes, but reporting which rung fired)."""
    try:
        return data.decode("utf-8"), "utf-8", "ladder"
    except UnicodeDecodeError:
        pass
    try:
        return data.decode("cp949"), "cp949", "ladder"
    except UnicodeDecodeError:
        return data.decode("utf-8", "ignore"), "utf-8", "ladder-ignore"


def decode_one(data: bytes) -> tuple[str, str, str]:
    """Full per-row ladder: (text, codec label, evidence)."""
    hit = sniff_charset(data)
    if hit is None:
        return decode_with_ladder(data)
    codec, evidence = hit
    if evidence == "bom":
        for bom, bcodec, label in BOMS:
            if data.startswith(bom):
                try:
                    return data.decode(bcodec), label, "bom"
                except UnicodeDecodeError:
                    return decode_with_ladder(data)
    try:
        return data.decode(codec), codec, "meta"
    except UnicodeDecodeError:
        # the declaration lied — same recovery as no declaration
        return decode_with_ladder(data)


def decode_pages_batch(batch: pa.Table, id_column: str = "doc_id",
                       content_column: str = "content") -> pa.Table:
    """map_batches body: ``(id_column, codec, evidence, text)``.

    Router (vectorized binary kernels) → ONE arrow binary→utf8 cast
    (C++ validation + zero-copy offsets) for the cleared set → per-row
    work only for the routed minority, and — when an undeclared
    non-utf-8 row poisons the cleared cast — a per-row C-call decode
    for that batch's cleared set (~100 ns/row overhead, still O(bytes)
    in C; see the module docstring for the scale argument).
    """
    import numpy as np
    import polars as pl
    import pyarrow.compute as pc

    df = pl.from_arrow(batch.select([id_column, content_column]))
    content = pl.col(content_column).fill_null(b"")
    routed = content.bin.contains(b"charset")
    for bom, _c, _l in BOMS:
        routed = routed | content.bin.starts_with(bom)
    work = df.select(pl.col(id_column).cast(pl.Int64),
                     content.alias("_c"), routed.alias("_routed"))
    ids = work[id_column].to_numpy()
    slow_mask = work["_routed"].to_numpy()
    n = len(work)
    texts: list = [None] * n
    codecs = np.full(n, "utf-8", dtype=object)
    evid = np.full(n, "ladder", dtype=object)
    fast_idx = np.flatnonzero(~slow_mask)
    if len(fast_idx):
        fast_arr = work["_c"].to_arrow().take(pa.array(fast_idx))
        try:
            decoded = pc.cast(fast_arr, pa.string()).to_pylist()
            for i, t in zip(fast_idx, decoded):
                texts[i] = t
        except pa.ArrowInvalid:
            # an undeclared legacy-codec row is in this batch: per-row
            # C-call ladder for the cleared set (the rare degraded path)
            for i, data in zip(fast_idx, fast_arr.to_pylist()):
                texts[i], codecs[i], evid[i] = decode_with_ladder(data)
    for i in np.flatnonzero(slow_mask):
        texts[i], codecs[i], evid[i] = decode_one(work["_c"][int(i)])
    return pa.table({
        id_column: pa.array(ids, pa.int64()),
        "codec": pa.array(list(codecs), pa.string()),
        "evidence": pa.array(list(evid), pa.string()),
        "text": pa.array(texts, pa.string()),
    })


def decode_pages(ds, id_column: str = "doc_id",
                 content_column: str = "content"):
    """Dataset wrapper — one streaming pass, no exchange."""
    return ds.map_batches(
        lambda b: decode_pages_batch(b, id_column=id_column,
                                     content_column=content_column),
        batch_format="pyarrow")


# frozen per-codec plant samples for the driver query / oracle — each
# exercises bytes that are INVALID utf-8 under its codec, so the
# ladder alone could not recover them
CHARSET_SAMPLES: dict[str, str] = {
    "cp1252": "café €2 — naïve",
    "shift_jis": "こんにちは世界",
    "cp949": "안녕하세요",
}
