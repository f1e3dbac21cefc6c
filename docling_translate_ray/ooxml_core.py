"""Pure-python DOCX / PPTX text lane — the OOXML branch of the
reference's converter source (reference ``src/core.py:119-134``
``allowed_formats`` includes DOCX and PPTX; ``app.py:160-180`` accepts
them in the uploader).  The reference delegates to Docling's OOXML
backends — absent in this environment — so, exactly like
:mod:`.pdf_core`, this module implements the text-extraction contract
from first principles with the standard library only:

* **container** — OOXML is zip + XML.  The fast path reads the archive
  with :mod:`zipfile`; when the central directory is missing or the
  tail is truncated (real crawls are full of cut-off downloads) a
  linear local-file-header scan recovers every complete-enough entry,
  inflating each payload with a raw ``zlib.decompressobj`` that simply
  stops at whatever bytes exist;
* **WordprocessingML** (``word/document.xml``) — paragraphs ``<w:p>``
  in document order; a paragraph's text concatenates its runs' ``w:t``
  texts with ``w:tab`` → TAB and ``w:br``/``w:cr`` → LF; a
  ``w:pStyle`` of Heading*/Title marks the span kind ``header``;
* **PresentationML** (``ppt/slides/slideN.xml``) — slides sort by
  their NUMERIC index (slide2 before slide10, regardless of zip entry
  order), and within a slide DrawingML paragraphs ``<a:p>`` read in
  shape order; each slide is a page;
* **XML tolerance** — entities and namespaces go through
  :mod:`xml.etree` (matching on LOCAL names, so unusual prefixes never
  matter); a truncated ``document.xml`` that no longer parses falls
  back to a regex paragraph scan that recovers every complete
  ``<w:p>…</w:p>``/``<a:p>…</a:p>`` block.

Out of scope, honestly: embedded images/objects, numbering/list
labels, header/footer parts, tracked changes (``w:del`` content is
skipped wholesale only if the XML carries it as separate runs — we
emit what ``w:t`` exposes).  A malformed document never raises past
:func:`segment_docx` / :func:`segment_pptx` (the extract job's
poison-row contract).

:func:`build_docx` / :func:`build_pptx` are the matching deterministic
WRITERS used by tests and the driver queries (``docx_extract`` /
``pptx_extract``): structurally valid minimal packages whose
round-trip through these readers is byte-exact for any unicode text.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
import zlib
from xml.etree import ElementTree as ET

_LOCAL_SIG = b"PK\x03\x04"
_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


# ------------------------------------------------------------------ container


def _scan_local_entries(data: bytes) -> dict[str, bytes]:
    """name → decompressed bytes by linear local-file-header scan: no
    central directory needed, tolerant of truncated payloads (a short
    DEFLATE stream yields whatever bytes decompress cleanly)."""
    out: dict[str, bytes] = {}
    pos, n = 0, len(data)
    while True:
        i = data.find(_LOCAL_SIG, pos)
        if i < 0 or i + 30 > n:
            return out
        flags, method = struct.unpack("<HH", data[i + 6:i + 10])
        csize = struct.unpack("<I", data[i + 18:i + 22])[0]
        nlen, elen = struct.unpack("<HH", data[i + 26:i + 30])
        name_at = i + 30
        body_at = name_at + nlen + elen
        if name_at + nlen > n:
            return out
        try:
            name = data[name_at:name_at + nlen].decode("utf-8")
        except UnicodeDecodeError:
            pos = i + 4
            continue
        if csize == 0 and flags & 0x08:
            # data descriptor: size unknown up front — inflate to eof
            # (method 8) or scan to the next signature (stored)
            payload = data[body_at:]
            if method == 0:
                nxt = data.find(_LOCAL_SIG, body_at)
                out[name] = payload[:nxt - body_at] if nxt >= 0 else payload
                pos = nxt if nxt >= 0 else n
            else:
                d = zlib.decompressobj(-15)
                try:
                    out[name] = d.decompress(payload)
                except zlib.error:
                    pass  # hopeless stream — skip, keep scanning
                consumed = len(payload) - len(d.unused_data)
                pos = max(body_at + consumed, i + 4)
            continue
        payload = data[body_at:body_at + csize]
        if method == 0:
            out[name] = payload
        else:
            d = zlib.decompressobj(-15)
            try:
                out[name] = d.decompress(payload)
            except zlib.error:
                pass  # hopeless stream — skip the entry, keep scanning
        pos = max(body_at + len(payload), i + 4)


def zip_entries(data: bytes) -> dict[str, bytes]:
    """All archive entries, name → bytes.  :mod:`zipfile` fast path;
    local-header scan when the central directory is damaged/absent."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            out = {}
            for info in zf.infolist():
                try:
                    out[info.filename] = zf.read(info)
                except Exception:
                    pass  # truncated member — recovered by the scan below
            if out:
                return out
    except Exception:
        pass
    return _scan_local_entries(data)


def sniff_ooxml(data: bytes) -> str | None:
    """'docx' / 'pptx' / None from entry NAMES only (header scan — no
    payload inflation), so dispatch stays cheap on non-OOXML zips."""
    if data[:4] != _LOCAL_SIG:
        return None
    pos, n, seen = 0, len(data), 0
    while seen < 64:
        i = data.find(_LOCAL_SIG, pos)
        if i < 0 or i + 30 > n:
            return None
        csize = struct.unpack("<I", data[i + 18:i + 22])[0]
        nlen, elen = struct.unpack("<HH", data[i + 26:i + 30])
        name = data[i + 30:i + 30 + nlen]
        if name.startswith(b"word/"):
            return "docx"
        if name.startswith(b"ppt/"):
            return "pptx"
        pos = i + 30 + nlen + elen + csize
        seen += 1
    return None


# ------------------------------------------------------------------ XML text


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _para_text_and_style(p) -> tuple[str, str | None]:
    """Concatenated run text of one paragraph element (w:p or a:p) +
    the w:pStyle val if any.  w:tab → TAB, w:br/w:cr → LF."""
    parts: list[str] = []
    style = None
    for el in p.iter():
        ln = _local(el.tag)
        if ln == "t":
            parts.append(el.text or "")
        elif ln == "tab":
            parts.append("\t")
        elif ln in ("br", "cr"):
            parts.append("\n")
        elif ln == "pStyle":
            for k, v in el.attrib.items():
                if _local(k) == "val":
                    style = v
    return "".join(parts), style


def _paras_of_xml(xml: bytes) -> list[tuple[str, str | None]]:
    """(text, style) per paragraph element in document order; on a
    parse failure (truncated XML) falls back to a regex scan over the
    complete ``<?:p>…</?:p>`` blocks."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return _paras_regex(xml)
    out = []
    for el in root.iter():
        if _local(el.tag) == "p":
            out.append(_para_text_and_style(el))
    return out


_P_BLOCK_RE = re.compile(rb"<(?:\w+:)?p[ >].*?</(?:\w+:)?p>", re.DOTALL)
_T_RUN_RE = re.compile(rb"<(?:\w+:)?t(?:[ ][^>]*)?>(.*?)</(?:\w+:)?t>",
                       re.DOTALL)
_STYLE_RE = re.compile(rb"<(?:\w+:)?pStyle[^>]*val=\"([^\"]*)\"")


def _paras_regex(xml: bytes) -> list[tuple[str, str | None]]:
    out = []
    for block in _P_BLOCK_RE.findall(xml):
        texts = [_unescape(t) for t in _T_RUN_RE.findall(block)]
        m = _STYLE_RE.search(block)
        out.append(("".join(texts),
                    m.group(1).decode("utf-8", "replace") if m else None))
    return out


def _unescape(raw: bytes) -> str:
    from xml.sax.saxutils import unescape

    return unescape(raw.decode("utf-8", errors="replace"),
                    {"&quot;": '"', "&apos;": "'"})


def _is_heading(style: str | None) -> bool:
    return bool(style) and (style.startswith("Heading")
                            or style.startswith("Title"))


def docx_paragraphs(data: bytes) -> list[tuple[str, str | None]]:
    """(text, style) per ``word/document.xml`` paragraph in document
    order (tables contribute their cell paragraphs in-place)."""
    entries = zip_entries(data)
    xml = entries.get("word/document.xml")
    return _paras_of_xml(xml) if xml else []


def pptx_slide_paragraphs(data: bytes) -> list[tuple[int, str]]:
    """(slide_no, paragraph_text) with slides in NUMERIC order — zip
    entry order is irrelevant, and slide2 sorts before slide10."""
    entries = zip_entries(data)
    slides = []
    for name, xml in entries.items():
        m = _SLIDE_RE.match(name)
        if m:
            slides.append((int(m.group(1)), xml))
    out = []
    for no, xml in sorted(slides):
        for text, _style in _paras_of_xml(xml):
            out.append((no, text))
    return out


# ----------------------------------------------------------------- span lanes


def segment_docx(data: bytes) -> list[tuple]:
    """Raw span tuples under :func:`..extract_core.segment_content`'s
    assembly contract: ``(text, start, end, kind, translatable,
    line_number, page_no)`` — offsets into the ASSEMBLED text (non-empty
    paragraphs joined by ``\\n``), Heading*/Title styles → ``header``.
    Never raises (poison-row contract)."""
    try:
        paras = docx_paragraphs(data)
    except Exception:
        return []
    return _spans_of([(1, t, s) for t, s in paras])


def segment_pptx(data: bytes) -> list[tuple]:
    """Like :func:`segment_docx`; page_no = slide number."""
    try:
        rows = pptx_slide_paragraphs(data)
    except Exception:
        return []
    return _spans_of([(no, t, None) for no, t in rows])


def _spans_of(rows: list[tuple[int, str, str | None]]) -> list[tuple]:
    out, pos, ln = [], 0, 0
    for page, text, style in rows:
        if not text:
            continue  # empty paragraphs don't tile the assembled text
        ln += 1
        kind = "header" if _is_heading(style) else "prose"
        out.append((text, pos, pos + len(text), kind, True, ln, page))
        pos += len(text) + 1
    return out


# -------------------------------------------------------------------- writers

_CT_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_RELS_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)
_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _xml_escape(text: str) -> str:
    return (text.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _runs_xml(text: str) -> str:
    """DOCX runs for one paragraph.  Text containing a space splits at
    the FIRST space into two runs (space kept in the leading run) so
    every multi-word fixture exercises the reader's run concatenation;
    round-trip text is identical either way."""
    sp = text.find(" ")
    chunks = [text] if sp < 0 else [text[:sp + 1], text[sp + 1:]]
    return "".join(
        f'<w:r><w:t xml:space="preserve">{_xml_escape(c)}</w:t></w:r>'
        for c in chunks if c)


def build_docx(paragraphs: list) -> bytes:
    """Deterministic minimal DOCX.  Each item is a text ``str`` or a
    ``(text, style)`` tuple (style e.g. ``Heading1`` / ``Title``)."""
    body = []
    for item in paragraphs:
        text, style = item if isinstance(item, tuple) else (item, None)
        ppr = (f'<w:pPr><w:pStyle w:val="{_xml_escape(style)}"/></w:pPr>'
               if style else "")
        body.append(f"<w:p>{ppr}{_runs_xml(text)}</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{"".join(body)}'
        "</w:body></w:document>"
    )
    return _zip_build([
        ("[Content_Types].xml", _CT_DOCX),
        ("_rels/.rels", _RELS_DOCX),
        ("word/document.xml", doc),
    ])


def _slide_xml(paragraphs: list[str]) -> str:
    paras = "".join(
        f'<a:p><a:r><a:t>{_xml_escape(t)}</a:t></a:r></a:p>'
        for t in paragraphs)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
        f'presentationml/2006/main" xmlns:a="{_A_NS}">'
        f"<p:cSld><p:spTree><p:sp><p:txBody>{paras}</p:txBody></p:sp>"
        "</p:spTree></p:cSld></p:sld>"
    )


def build_pptx(slides: list[list[str]]) -> bytes:
    """Deterministic minimal PPTX: one ``ppt/slides/slideN.xml`` per
    slide (1-based).  Entries are written in REVERSED order so a
    reader that trusted zip order — or sorted slide names
    LEXICOGRAPHICALLY (slide10 < slide2) — would fail the round-trip."""
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        + "".join(
            f'<Override PartName="/ppt/slides/slide{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'presentationml.slide+xml"/>'
            for i in range(len(slides)))
        + "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="ppt/presentation.xml"/>'
        "</Relationships>"
    )
    pres = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main"/>'
    )
    entries = [("[Content_Types].xml", ct), ("_rels/.rels", rels),
               ("ppt/presentation.xml", pres)]
    entries += [(f"ppt/slides/slide{i + 1}.xml", _slide_xml(s))
                for i, s in enumerate(slides)][::-1]
    return _zip_build(entries)


def _zip_build(entries: list[tuple[str, str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in entries:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, payload)
    return buf.getvalue()
