"""HTML table-structure recovery — the Docling table-model slot.

The north-star names "table-structure recovery" as part of the layout
parse (reference ``core.py:93-117`` configures Docling's TableFormer
modes; its document model carries per-cell row/col coordinates).  The
extraction lexer (extract_core.py) collects ``table_cell`` span TEXT in
reading order but deliberately flattens structure; this module recovers
the GRID: each cell gets resolved ``(row, col)`` origin coordinates with
``rowspan``/``colspan`` occupancy handled by the WHATWG placement
algorithm (a cell lands on the first column of its row not shadowed by
an earlier cell's row/col span).

Scale shape: tables are a per-document parse, so this is a stateless
``map_batches`` stage like the extraction lexer itself — a compiled
tag scan per document that touches only documents containing
``<table``, emitting one NARROW Arrow row per cell (url, table_idx,
row, col, rowspan, colspan, is_header, text).  No DOM is built; the
scanner is a single forward pass over the tag stream.

Parser contract (frozen; pinned in tests/test_tables.py):

* every ``<table>`` open tag gets the next document-order ``table_idx``;
  nested tables are SEPARATE tables — their cell text belongs to the
  inner table only, never duplicated into the host cell;
* text between tags attaches to the innermost open cell anywhere on the
  table stack (HTML's foster-parenting reduced to "nearest cell wins");
* ``<td>``/``<th>`` outside a ``<tr>`` opens an implicit row; an open
  cell is closed by the next cell/row/table boundary (unclosed-tag
  tolerance — crawl HTML is never well-formed);
* ``rowspan``/``colspan`` are clamped to [1, 1000] (the WHATWG cap in
  spirit; ``0`` and junk parse as 1 — the spec's "rowspan=0 extends to
  the row group end" is intentionally out of scope and documented);
* cell text is tag-stripped, entity-unescaped, whitespace-collapsed —
  the same normalization the extraction lexer applies to block text;
* ``is_header`` is true for ``<th>`` cells.
"""

from __future__ import annotations

import html as _htmllib
import re

import pyarrow as pa

MAX_SPAN = 1000  # rowspan/colspan clamp (junk attrs in crawl HTML)

_TABLE_TAG_RE = re.compile(r"<(/?)(table|tr|td|th)(?=[\s/>])[^>]*>", re.I | re.S)
_SPAN_ATTR_RE = re.compile(
    r"""(rowspan|colspan)\s*=\s*["']?([0-9]+)""", re.I)
_STRIP_BLOCK_RE = re.compile(
    r"<(script|style)[^>]*>.*?</\1\s*>|<!--.*?-->", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
# fast-path sniff before the full tag scan — case-insensitive to match
# _TABLE_TAG_RE (a '<tAbLe>' page must not be silently skipped)
_TABLE_SNIFF_RE = re.compile(r"<table", re.I)


class _TableState:
    __slots__ = ("idx", "row", "occupied", "cell", "cells")

    def __init__(self, idx: int):
        self.idx = idx
        self.row = -1           # no <tr> seen yet
        self.occupied = {}      # row -> set of cols shadowed by spans
        self.cell = None        # open cell: [row, col, rs, cs, hdr, buf]
        self.cells = []


def _spans(attrs: str) -> tuple[int, int]:
    rs = cs = 1
    for name, val in _SPAN_ATTR_RE.findall(attrs):
        n = min(MAX_SPAN, max(1, int(val)))
        if name.lower() == "rowspan":
            rs = n
        else:
            cs = n
    return rs, cs


def _close_cell(t: _TableState) -> None:
    if t.cell is None:
        return
    row, col, rs, cs, hdr, buf = t.cell
    text = _WS_RE.sub(" ", _htmllib.unescape(_TAG_RE.sub(" ", "".join(buf)))).strip()
    t.cells.append((t.idx, row, col, rs, cs, hdr, text))
    t.cell = None


def _open_cell(t: _TableState, attrs: str, header: bool) -> None:
    _close_cell(t)
    if t.row < 0:
        t.row = 0               # implicit row (no <tr>)
    rs, cs = _spans(attrs)
    occ = t.occupied.get(t.row, set())
    col = 0
    while col in occ:
        col += 1
    # shadow this cell's span footprint (current row included, so the
    # NEXT cell's first-free-column scan skips the colspan width too)
    for r in range(t.row, t.row + rs):
        t.occupied.setdefault(r, set()).update(range(col, col + cs))
    t.cell = [t.row, col, rs, cs, header, []]


def parse_tables(html_text: str) -> list[tuple[int, int, int, int, int, bool, str]]:
    """All tables in one document → list of
    ``(table_idx, row, col, rowspan, colspan, is_header, text)`` cells,
    grid-resolved per the module contract."""
    if _TABLE_SNIFF_RE.search(html_text) is None:
        return []
    html_text = _STRIP_BLOCK_RE.sub(" ", html_text)
    stack: list[_TableState] = []
    out: list[tuple] = []
    next_idx = 0
    pos = 0
    for m in _TABLE_TAG_RE.finditer(html_text):
        if stack:
            # text between tags → innermost open cell on the stack
            seg = html_text[pos:m.start()]
            if seg and not seg.isspace():
                for t in reversed(stack):
                    if t.cell is not None:
                        t.cell[5].append(seg)
                        break
        pos = m.end()
        closing, name = m.group(1) == "/", m.group(2).lower()
        if name == "table":
            if not closing:
                stack.append(_TableState(next_idx))
                next_idx += 1
            elif stack:
                t = stack.pop()
                _close_cell(t)
                out.extend(t.cells)
            continue
        if not stack:
            continue            # tr/td outside any table: ignore
        t = stack[-1]
        if name == "tr":
            _close_cell(t)
            if not closing:
                t.row += 1
                # old shadow rows stay in t.occupied keyed by row index
        else:                   # td / th
            if closing:
                _close_cell(t)
            else:
                _open_cell(t, m.group(0), name == "th")
    # unclosed tables at EOF still flush (truncated crawl tails) —
    # including text after the last tag, which belongs to the open cell
    if stack:
        seg = html_text[pos:]
        if seg and not seg.isspace():
            for t in reversed(stack):
                if t.cell is not None:
                    t.cell[5].append(seg)
                    break
    while stack:
        t = stack.pop()
        _close_cell(t)
        out.extend(t.cells)
    return out


def tables_batch(batch: pa.Table, html_column: str = "html",
                 url_column: str = "url") -> pa.Table:
    """``map_batches`` kernel: pages → one row per recovered cell."""
    from docling_translate_ray.extract_core import decode_bytes

    col = batch[html_column]
    urls = batch[url_column].to_pylist()
    payloads = col.to_pylist()
    u_out, ti, rr, cc, rs, cs, hd, tx = [], [], [], [], [], [], [], []
    for url, payload in zip(urls, payloads):
        if payload is None:
            continue
        text = decode_bytes(payload) if isinstance(payload, bytes) else payload
        for t_idx, row, c, r_s, c_s, hdr, cell_text in parse_tables(text):
            u_out.append(url)
            ti.append(t_idx)
            rr.append(row)
            cc.append(c)
            rs.append(r_s)
            cs.append(c_s)
            hd.append(hdr)
            tx.append(cell_text)
    return pa.table({
        "url": pa.array(u_out, pa.string()),
        "table_idx": pa.array(ti, pa.int64()),
        "row": pa.array(rr, pa.int64()),
        "col": pa.array(cc, pa.int64()),
        "rowspan": pa.array(rs, pa.int64()),
        "colspan": pa.array(cs, pa.int64()),
        "is_header": pa.array(hd, pa.bool_()),
        "text": pa.array(tx, pa.string()),
    })


def extract_tables(ds, html_column: str = "html", url_column: str = "url"):
    """Dataset op: pages → grid-resolved table cells (streaming, one
    stateless map stage; pages never shuffle)."""
    return ds.map_batches(
        lambda b: tables_batch(b, html_column=html_column,
                               url_column=url_column),
        batch_format="pyarrow",
    )


def table_to_markdown(cells: list[tuple[int, int, int, int, int, bool, str]]
                      ) -> str:
    """Docling-style markdown export of ONE table's cells (as returned by
    :func:`parse_tables`, single ``table_idx``): spanned slots repeat the
    origin text (markdown has no span syntax; repeating matches Docling's
    dataframe export semantics), missing slots render empty."""
    if not cells:
        return ""
    grid: dict[tuple[int, int], str] = {}
    n_rows = n_cols = 0
    for _idx, row, col, rs, cs, _hdr, text in cells:
        for r in range(row, row + rs):
            for c in range(col, col + cs):
                grid.setdefault((r, c), text)
        n_rows = max(n_rows, row + rs)
        n_cols = max(n_cols, col + cs)
    lines = []
    for r in range(n_rows):
        lines.append("| " + " | ".join(
            grid.get((r, c), "") for c in range(n_cols)) + " |")
        if r == 0:
            lines.append("|" + "|".join(" --- " for _ in range(n_cols)) + "|")
    return "\n".join(lines)
