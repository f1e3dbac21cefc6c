"""Minimal pure-python PDF text lane — the "PDF path" of the north rule
(layout analysis: page segmentation + reading-order sort), for
digitally-born simple PDFs.

The reference's PDF path (core.py:74-134) delegates to Docling's layout
models — absent in this environment.  Rather than leaving PDFs a stub,
this module implements the text-extraction contract from first
principles with the standard library only:

* **object scan** — a linear ``N 0 obj … endobj`` sweep (no xref needed;
  tolerant of truncated tails, which real crawls are full of);
* **stream decode** — ``/FlateDecode`` via :mod:`zlib`, raw otherwise;
* **content-stream interpreter** — a tokenizer for the text-showing
  subset: ``BT/ET``, text matrix ``Tm``, translations ``Td/TD/T*/TL``,
  strings ``(…) <…>`` with full escape handling, and the show operators
  ``Tj ' TJ``;
* **layout analysis** — runs carry their page and device-space (x, y);
  reading order = sort by (page, −y, x, emission seq); runs whose
  baselines agree within a tolerance merge into one LINE — so a content
  stream that emits its runs in ANY order still extracts top-to-bottom,
  left-to-right (pinned by the scrambled-emission golden test).

Out of scope, honestly: encrypted PDFs, CID/Type0 composite fonts,
/ASCII85 and LZW filters, rotated pages — such streams simply yield the
runs they expose (or none); a malformed document never raises past
:func:`segment_pdf` (the extract job's poison-row contract).

:func:`build_pdf` is the matching deterministic WRITER used by tests and
the driver query: it emits a structurally valid single-xref PDF whose
round-trip through this reader is byte-exact for any unicode text
(strings carry utf-8 bytes; the reader tries utf-8 first).
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.DOTALL)
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_LINE_Y_TOL = 2.0


# --------------------------------------------------------------------- reader


def _objects(data: bytes) -> dict[int, bytes]:
    """obj-number → body bytes, by linear scan (last definition wins, as
    incremental-update PDFs require)."""
    out: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        end = data.find(b"endobj", m.end())
        if end < 0:
            end = len(data)
        out[int(m.group(1))] = data[m.end():end]
    return out


def _stream_bytes(body: bytes) -> bytes | None:
    i = body.find(b"stream")
    if i < 0:
        return None
    j = i + len(b"stream")
    if body[j:j + 2] == b"\r\n":
        j += 2
    elif body[j:j + 1] == b"\n":
        j += 1
    k = body.rfind(b"endstream")
    raw = body[j:k] if k > j else body[j:]
    if b"/FlateDecode" in body[:i]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def _page_streams(data: bytes) -> list[bytes]:
    """Content streams in page order.  Pages are /Type /Page objects in
    object-number order (our writer and most simple generators agree);
    documents exposing no page objects fall back to one page per
    text-bearing stream in document order."""
    objs = _objects(data)
    pages: list[bytes] = []
    for num in sorted(objs):
        body = objs[num]
        if _stream_bytes(body) is not None or not _TYPE_PAGE_RE.search(body):
            continue
        refs: list[int] = []
        m = _CONTENTS_ARR_RE.search(body)
        if m:
            refs = [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
        else:
            m2 = _CONTENTS_REF_RE.search(body)
            if m2:
                refs = [int(m2.group(1))]
        parts = [s for r in refs
                 if (s := _stream_bytes(objs.get(r, b""))) is not None]
        if parts:
            pages.append(b"\n".join(parts))
    if pages:
        return pages
    return [s for num in sorted(objs)
            if (s := _stream_bytes(objs[num])) is not None and b"BT" in s]


def _decode_text(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


_ESCAPES = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
            ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
            ord(")"): b")", ord("\\"): b"\\"}


def _parse_string(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(…)`` literal starting at ``i`` (at the '('); returns
    (raw bytes, index past the closing paren).  Handles nesting, the
    standard escapes, octal escapes and escaped newlines."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n and depth:
        c = s[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_d = s[i:i + 3]
                k = 1
                while k < 3 and k < len(oct_d) and 0x30 <= oct_d[k] <= 0x37:
                    k += 1
                out.append(int(oct_d[:k], 8) & 0xFF)
                i += k
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _runs_of_stream(stream: bytes):
    """Yield (y, x, seq, text) for every text-showing operator."""
    x = y = 0.0
    leading = 12.0
    seq = 0
    operands: list = []  # numbers and string-bytes, in order
    i, n = 0, len(stream)
    runs: list[tuple[float, float, int, str]] = []

    def emit(raw: bytes) -> None:
        nonlocal seq
        t = _decode_text(raw)
        if t:
            runs.append((y, x, seq, t))
            seq += 1
    while i < n:
        c = stream[i]
        if c in b" \t\r\n\x0c\x00":
            i += 1
        elif c == 0x28:  # (string)
            raw, i = _parse_string(stream, i)
            operands.append(raw)
        elif c == 0x3C and stream[i:i + 2] != b"<<":  # <hex>
            j = stream.find(b">", i)
            j = n if j < 0 else j
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", stream[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            operands.append(bytes.fromhex(hx.decode("ascii")))
            i = j + 1
        elif c == 0x3C:  # << dict — skip balanced
            depth = 0
            while i < n - 1:
                if stream[i:i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif stream[i:i + 2] == b">>":
                    depth -= 1
                    i += 2
                    if not depth:
                        break
                else:
                    i += 1
        elif c in b"[]":
            i += 1  # TJ arrays: strings/numbers land on the stack anyway
        elif c == 0x2F:  # /Name
            m = re.match(rb"/[^\s()<>\[\]/%]*", stream[i:])
            i += m.end() if m else 1
        elif c == 0x25:  # % comment
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _NUM_RE.match(stream, i)
            if m and (c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39):
                operands.append(float(m.group(0)))
                i = m.end()
                continue
            m = re.match(rb"[A-Za-z'\"*]+", stream[i:])
            if not m:
                i += 1
                continue
            op = m.group(0)
            i += m.end()
            nums = [v for v in operands if isinstance(v, float)]
            strs = [v for v in operands if isinstance(v, bytes)]
            if op == b"BT":
                x = y = 0.0
            elif op == b"Tm" and len(nums) >= 2:
                x, y = nums[-2], nums[-1]
            elif op in (b"Td", b"TD") and len(nums) >= 2:
                x += nums[-2]
                y += nums[-1]
                if op == b"TD":
                    leading = -nums[-1] or leading
            elif op == b"TL" and nums:
                leading = nums[-1]
            elif op == b"T*":
                y -= leading
            elif op == b"Tj" and strs:
                emit(strs[-1])
            elif op in (b"'", b'"') and strs:
                y -= leading
                emit(strs[-1])
            elif op == b"TJ" and strs:
                emit(b"".join(strs))
            operands = []
    return runs


def pdf_lines(data: bytes) -> list[tuple[int, str]]:
    """Reading-order text lines: ``(page_no, line_text)``; page_no is
    1-based.  Runs sort by (page, −y, x, seq); same-baseline runs
    (|Δy| ≤ 2) join into one line with single spaces."""
    lines: list[tuple[int, str]] = []
    for p, stream in enumerate(_page_streams(data), start=1):
        runs = sorted(_runs_of_stream(stream),
                      key=lambda r: (-r[0], r[1], r[2]))
        cur_y: float | None = None
        cur: list[str] = []
        for ry, _rx, _seq, text in runs:
            if cur_y is not None and abs(ry - cur_y) <= _LINE_Y_TOL:
                cur.append(text)
            else:
                if cur:
                    lines.append((p, " ".join(cur)))
                cur = [text]
                cur_y = ry
        if cur:
            lines.append((p, " ".join(cur)))
    return lines


def segment_pdf(data: bytes) -> list[tuple]:
    """Raw span tuples for :func:`..extract_core.segment_content`'s
    assembly contract: ``(text, start, end, kind, translatable,
    line_number, page_no)`` with offsets into the ASSEMBLED text (lines
    joined by ``\\n``) so spans tile the extracted text exactly."""
    out = []
    pos = 0
    for ln, (page, text) in enumerate(pdf_lines(data), start=1):
        out.append((text, pos, pos + len(text), "prose", True, ln, page))
        pos += len(text) + 1
    return out


# --------------------------------------------------------------------- writer


def _escape_pdf_string(text: str) -> bytes:
    raw = text.encode("utf-8")
    return (raw.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(").replace(b")", b"\\)"))


def build_pdf(pages: list[list[tuple[float, float, str]]],
              compress: bool = False) -> bytes:
    """Deterministic minimal PDF: one object per page + content stream,
    runs placed absolutely via ``Tm`` IN THE GIVEN ORDER (emit scrambled
    to exercise the reader's layout sort).  Structurally valid (catalog,
    page tree, xref, trailer)."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    cat = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_obj = add(b"")  # placeholder, filled after page objs exist
    page_ids = []
    for runs in pages:
        ops = [b"BT /F1 12 Tf"]
        for x, y, text in runs:
            ops.append(b"1 0 0 1 %.2f %.2f Tm (%s) Tj"
                       % (x, y, _escape_pdf_string(text)))
        ops.append(b"ET")
        payload = b"\n".join(ops)
        filt = b""
        if compress:
            payload = zlib.compress(payload)
            filt = b" /Filter /FlateDecode"
        c_id = add(b"<< /Length %d%s >>\nstream\n%s\nendstream"
                   % (len(payload), filt, payload))
        p_id = add(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                   b"/Contents %d 0 R >>" % c_id)
        page_ids.append(p_id)
    objs[pages_obj - 1] = (b"<< /Type /Pages /Count %d /Kids [%s] >>"
                           % (len(page_ids),
                              b" ".join(b"%d 0 R" % p for p in page_ids)))
    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, cat, xref_at))
    return bytes(buf)
