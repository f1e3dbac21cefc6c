"""Pure (Ray-free) extraction kernel — the single-process oracle.

This module re-expresses the reference's parse/extract core
(``/root/reference/src/text_parser.py``, ``/root/reference/src/core.py:417-455``,
``/root/reference/src/html_generator.py:20-64,575-640``) as pure functions over
decoded page content.  It is deliberately single-threaded and deterministic:
the Ray Data pipeline in :mod:`docling_translate_ray.pipelines.extract` must
produce byte-identical extracted text per url versus this kernel (golden-file
tests freeze its output).

Semantics parity map (reference file:line → here):

* decode ladder utf-8 → cp949 → utf-8/ignore  (text_parser.py:137-144) → :func:`decode_bytes`
* binary sniff, null byte in first 8 KiB      (text_parser.py:533-550) → :func:`is_binary`
* EXTENSION_MAP ext → parser type             (text_parser.py:60-111)  → ``EXTENSION_MAP``
* markdown fenced-code split + paragraphs     (text_parser.py:162-234) → ``_segment_markdown``
* python ``#`` comments + docstrings          (text_parser.py:236-313) → ``_segment_python``
* c-style ``//`` and ``/* */`` comments       (text_parser.py:315-379) → ``_segment_c_style``
* shell ``#`` comments minus shebang          (text_parser.py:381-436) → ``_segment_shell``
* config = one whole-file segment             (text_parser.py:438-454) → ``_segment_config``
* plaintext ``\\n\\n`` paragraphs             (text_parser.py:456-492) → ``_segment_plaintext``
* translatable filter                         (text_parser.py:494-504) → :func:`translatable_texts`
* sentence tokenizer (NLTK punkt in the
  reference; absent here → frozen rule-based
  spec, SURVEY.md §2 M9)                      (core.py:428)            → :func:`split_sentences`
* formula heuristic                           (html_generator.py:20-45)→ :func:`is_formula_text`
* formula MathJax wrap                        (html_generator.py:48-64)→ :func:`format_formula`
* label routing + PAGE_HEADER/FOOTER drop     (html_generator.py:575-640) → HTML lexer kinds
* caption / table-cell collection             (core.py:430-451)        → HTML lexer kinds

Deliberate, documented deviations from the reference (all strictly
tightenings — the set and order of *translatable* texts is unchanged):

1. Spans **partition** the decoded source: whitespace-only gap segments are
   kept (kind ``code``, non-translatable) where the reference drops them, and
   docstring per-line spans tile the docstring region instead of all sharing
   the whole-match offsets (text_parser.py:273-285 repeats ``match.start()``/
   ``match.end()`` for every line).  Property: concatenating
   ``source[start:end]`` over spans reproduces the decoded input exactly.
2. Markdown paragraph offsets are exact (the reference advances by
   ``len(para)+2`` which drifts when the separator is longer than two chars,
   text_parser.py:231-232).
3. Offsets are character offsets into the decoded unicode string (the
   reference's are too — ``str`` indices).
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass
from typing import Callable, Iterable

# ---------------------------------------------------------------------------
# Span model (TextSegment analog, text_parser.py:28-46 + doc-path fields)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Span:
    """One extracted span; mirrors FIXTURES.md §3 `spans` schema."""

    seg_id: int
    start: int
    end: int
    kind: str
    translatable: bool
    line_number: int
    page_no: int
    text: str


SPAN_KINDS = (
    "prose header list_item caption table_cell formula comment line_comment "
    "block_comment docstring code code_block config boilerplate"
).split()


# ---------------------------------------------------------------------------
# Decode / sniff / dispatch
# ---------------------------------------------------------------------------

_NULL = b"\x00"


def is_binary(data: bytes) -> bool:
    """Null byte within the first 8 KiB ⇒ binary (text_parser.py:533-550)."""
    return _NULL in data[:8192]


def decode_bytes(data: bytes) -> str:
    """utf-8 → cp949 → utf-8(errors=ignore) ladder (text_parser.py:137-144)."""
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        try:
            return data.decode("cp949")
        except UnicodeDecodeError:
            return data.decode("utf-8", errors="ignore")


# ext → parser type (text_parser.py:60-111); unknown/absent ext → plaintext
EXTENSION_MAP: dict[str, str] = {
    "md": "markdown", "markdown": "markdown", "rst": "plaintext",
    "py": "python", "pyw": "python",
    "js": "c_style", "jsx": "c_style", "ts": "c_style", "tsx": "c_style",
    "mjs": "c_style", "cjs": "c_style", "c": "c_style", "h": "c_style",
    "cpp": "c_style", "hpp": "c_style", "cc": "c_style", "cxx": "c_style",
    "cs": "c_style", "java": "c_style", "kt": "c_style", "kts": "c_style",
    "go": "c_style", "rs": "c_style", "swift": "c_style",
    "sh": "shell", "bash": "shell", "zsh": "shell", "fish": "shell",
    "json": "config", "yaml": "config", "yml": "config", "toml": "config",
    "xml": "config",
    "txt": "plaintext", "text": "plaintext", "log": "plaintext",
    "cfg": "plaintext", "ini": "plaintext", "env": "plaintext",
    "html": "html", "htm": "html",
}

_HTML_SNIFF = re.compile(rb"^\s*(?:<!doctype\s+html|<html)", re.IGNORECASE)


def detect_doctype(url: str, data: bytes) -> str:
    """Content-type dispatch (core.py:369-379 / text_parser.py:507-530 analog).

    Order: PDF magic → OOXML sniff (zip magic + entry names) → binary
    sniff → url extension via EXTENSION_MAP → html content sniff →
    plaintext.  The PDF/OOXML checks must precede the binary sniff
    (both carry null bytes).
    """
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:4] == b"PK\x03\x04":
        from docling_translate_ray import ooxml_core

        kind = ooxml_core.sniff_ooxml(data)
        if kind:
            return kind  # docx | pptx (core.py:119-134 allowed_formats)
        return "binary"  # a zip that isn't an OOXML package
    if is_binary(data):
        return "binary"
    path = url.split("?", 1)[0].split("#", 1)[0].rstrip("/")
    last = path.rsplit("/", 1)[-1]
    ext = last.rsplit(".", 1)[-1].lower() if "." in last else ""
    if ext in EXTENSION_MAP:
        return EXTENSION_MAP[ext]
    if _HTML_SNIFF.match(data[:512]):
        return "html"
    return "plaintext"


# ---------------------------------------------------------------------------
# Formula heuristic (html_generator.py:20-64)
# ---------------------------------------------------------------------------

_LATEX_RE = re.compile(
    r"\\[a-zA-Z]+|\^\{|_\{|&="  # \cmd, ^{, _{, &=  — superset patterns first
)


def is_formula_text(text: str) -> bool:
    """LaTeX-command heuristic (html_generator.py:20-45)."""
    return bool(text) and _LATEX_RE.search(text) is not None


def format_formula(text: str) -> str:
    """Wrap for MathJax rendering (html_generator.py:48-64)."""
    text = text.strip()
    if text.startswith(("$", "\\[", "\\(")):
        return text
    if "&" in text:
        return f"\\[\\begin{{aligned}}{text}\\end{{aligned}}\\]"
    return f"\\[{text}\\]"


# ---------------------------------------------------------------------------
# Sentence splitter — frozen rule-based spec (M9; replaces NLTK punkt,
# core.py:428).  Deterministic, no model download.
# ---------------------------------------------------------------------------

_ABBREVIATIONS = frozenset(
    "mr mrs ms dr prof sr jr st no vs etc al eg ie cf fig eq sec ch p pp "
    "vol inc ltd co corp dept univ est approx".split()
)

# candidate boundary: sentence-final punct (+ closing quotes/brackets), then
# whitespace, then an upper-case letter, digit, or opening quote/bracket.
_BOUNDARY_RE = re.compile(r"([.!?]+[\"'”’)\]]*)(\s+)(?=[\"'“‘(\[]?[A-Z0-9])")
_WORD_BEFORE_RE = re.compile(r"([A-Za-z][A-Za-z.]*)$")


def split_sentences(text: str) -> list[str]:
    """Rule-based sentence split; the frozen splitting contract.

    Splits at ``[.!?]`` (+ trailing close-quotes) followed by whitespace and
    an upper-case/digit/open-quote start, unless the preceding token is a
    known abbreviation, a single capital initial (``J.``), or part of a
    dotted acronym (``U.S.``).  Decimals never split (no whitespace).
    """
    if not text or not text.strip():
        return []
    out: list[str] = []
    last = 0
    for m in _BOUNDARY_RE.finditer(text):
        punct = m.group(1)
        if punct[0] == ".":
            before = _WORD_BEFORE_RE.search(text, 0, m.start(1))
            if before is not None:
                w = before.group(1)
                bare = w.rstrip(".").rsplit(".", 1)[-1]
                if (
                    bare.lower() in _ABBREVIATIONS
                    or (len(bare) == 1 and bare.isupper())
                    or "." in w.rstrip(".")  # dotted acronym like U.S
                ):
                    continue
        out.append(text[last : m.end(1)])
        last = m.end(0)
    tail = text[last:]
    if tail.strip():
        out.append(tail)
    return [s.strip() for s in out if s.strip()]


# ---------------------------------------------------------------------------
# Text/code segmenters (table-driven; M1-M7)
# ---------------------------------------------------------------------------

_MD_CODE_BLOCK_RE = re.compile(r"(```[\w]*\n.*?\n```|~~~[\w]*\n.*?\n~~~)", re.DOTALL)
_PARA_SEP_RE = re.compile(r"\n\s*\n")
_PY_COMMENT_RE = re.compile(r'("""|\'\'\')([\s\S]*?)(\1)|#[^\n]*', re.MULTILINE)
_C_COMMENT_RE = re.compile(r"//[^\n]*|/\*[\s\S]*?\*/", re.MULTILINE)
_SHELL_COMMENT_RE = re.compile(r"^(?!#!)#[^\n]*", re.MULTILINE)

_RawSpan = tuple[str, int, int, str, bool, int]  # text, start, end, kind, translatable, line


def _paragraph_spans(
    content: str, lo: int, hi: int, line: int, sep: re.Pattern[str] | None
) -> Iterable[_RawSpan]:
    """Split ``content[lo:hi]`` into paragraph prose spans + separator gaps.

    Paragraph semantics follow text_parser.py:211-234 (markdown, split on
    ``\\n\\s*\\n``) and :456-492 (plaintext, split on ``\\n\\n``); offsets are
    exact (deviation 2 in the module docstring) and separator gaps are kept
    as non-translatable ``code`` spans so spans tile the region.
    """
    region = content[lo:hi]
    pos = 0
    rel = 0  # incremental region[:pos].count("\n") — O(n) total
    pat = sep or _PARA_SEP_RE
    for m in pat.finditer(region):
        if m.start() > pos:
            para = region[pos : m.start()]
            yield (para, lo + pos, lo + m.start(), "prose", True, line + rel)
        gap = m.group()
        rel_start = rel + region.count("\n", pos, m.start())
        yield (gap, lo + m.start(), lo + m.end(), "code", False, line + rel_start)
        rel = rel_start + region.count("\n", m.start(), m.end())
        pos = m.end()
    if pos < len(region):
        para = region[pos:]
        yield (para, lo + pos, hi, "prose", True, line + rel)


def _segment_markdown(content: str) -> list[_RawSpan]:
    """Fenced code blocks out, prose paragraphs in (text_parser.py:162-209)."""
    spans: list[_RawSpan] = []
    pos = 0
    cur = 1  # incremental 1+content[:pos].count("\n")
    for m in _MD_CODE_BLOCK_RE.finditer(content):
        if m.start() > pos:
            spans.extend(_paragraph_spans(content, pos, m.start(), cur, _PARA_SEP_RE))
        line = cur + content.count("\n", pos, m.start())
        spans.append((m.group(), m.start(), m.end(), "code_block", False, line))
        cur = line + content.count("\n", m.start(), m.end())
        pos = m.end()
    if pos < len(content):
        spans.extend(_paragraph_spans(content, pos, len(content), cur, _PARA_SEP_RE))
    return spans


def _comment_segmenter(
    pattern: re.Pattern[str],
    classify: Callable[[str], str],
    explode_docstrings: bool = False,
) -> Callable[[str], list[_RawSpan]]:
    """Build a gap-is-code / match-is-comment segmenter.

    Generalizes the python/c_style/shell extractors (text_parser.py:236-436):
    everything the pattern matches is a translatable comment-ish span
    (classified by ``classify``); the gaps between matches are
    non-translatable ``code``.  With ``explode_docstrings`` a triple-quoted
    match is emitted per line, offsets tiling the match (deviation 1).
    """

    def segment(content: str) -> list[_RawSpan]:
        spans: list[_RawSpan] = []
        pos = 0
        cur = 1  # incremental 1+content[:pos].count("\n") — O(n) total
        for m in pattern.finditer(content):
            if m.start() > pos:
                gap = content[pos : m.start()]
                spans.append((gap, pos, m.start(), "code", False, cur))
            txt = m.group()
            kind = classify(txt)
            line = cur + content.count("\n", pos, m.start())
            if explode_docstrings and kind == "docstring":
                # per-line explode (text_parser.py:273-285) with tiled offsets
                off = m.start()
                for i, piece in enumerate(txt.splitlines(keepends=True)):
                    spans.append((piece, off, off + len(piece), "docstring", True, line + i))
                    off += len(piece)
            else:
                spans.append((txt, m.start(), m.end(), kind, True, line))
            cur = line + content.count("\n", m.start(), m.end())
            pos = m.end()
        if pos < len(content):
            spans.append((content[pos:], pos, len(content), "code", False, cur))
        return spans

    return segment


def _py_classify(text: str) -> str:
    return "docstring" if text.startswith(('"""', "'''")) else "comment"


def _c_classify(text: str) -> str:
    return "block_comment" if text.startswith("/*") else "line_comment"


_segment_python = _comment_segmenter(_PY_COMMENT_RE, _py_classify, explode_docstrings=True)
_segment_c_style = _comment_segmenter(_C_COMMENT_RE, _c_classify)
_segment_shell = _comment_segmenter(_SHELL_COMMENT_RE, lambda _t: "comment")


def _segment_config(content: str) -> list[_RawSpan]:
    """Whole file = one translatable segment (text_parser.py:438-454)."""
    return [(content, 0, len(content), "config", True, 1)] if content else []


_PLAIN_SEP_RE = re.compile(r"\n\n")


def _segment_plaintext(content: str) -> list[_RawSpan]:
    """\\n\\n-paragraph split (text_parser.py:456-492)."""
    if not content:
        return []
    return list(_paragraph_spans(content, 0, len(content), 1, _PLAIN_SEP_RE))


_TEXT_SEGMENTERS: dict[str, Callable[[str], list[_RawSpan]]] = {
    "markdown": _segment_markdown,
    "python": _segment_python,
    "c_style": _segment_c_style,
    "shell": _segment_shell,
    "config": _segment_config,
    "plaintext": _segment_plaintext,
}


# ---------------------------------------------------------------------------
# HTML main-content lexer (jusText/trafilatura-style block classification;
# north-star HTML path; label routing parity html_generator.py:575-640)
# ---------------------------------------------------------------------------

# one token per tag/comment; text nodes are the gaps between tokens
_HTML_TOKEN_RE = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]*>", re.DOTALL)
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:-]*)")
_DATA_PAGE_RE = re.compile(r"""data-page\s*=\s*["']?(\d+)""")
_WS_RE = re.compile(r"\s+")

# tags whose entire subtree is dropped — PAGE_HEADER/PAGE_FOOTER analog
# (html_generator.py:618-619) plus classic boilerplate containers
DROP_TAGS = frozenset("script style nav header footer noscript template aside".split())

# block-level tags that open a classified text block
_BLOCK_KIND: dict[str, str] = {
    "title": "header", "h1": "header", "h2": "header", "h3": "header",
    "h4": "header", "h5": "header", "h6": "header",
    "p": "prose", "blockquote": "prose",
    "li": "list_item",
    "td": "table_cell", "th": "table_cell",
    "figcaption": "caption", "caption": "caption",
    "pre": "code_block",
}

# structural tags that terminate any open block without starting one
_FLUSH_TAGS = frozenset(
    "div section article main body table thead tbody tfoot tr ul ol dl figure form br hr".split()
)

LINK_DENSITY_THRESHOLD = 0.5  # link-char share above which prose/list is boilerplate


def _classify_block(kind: str, text: str, link_chars: int, total_chars: int,
                    skip_formula: bool = False) -> tuple[str, bool]:
    """Block classification: formula check + link-density boilerplate rule."""
    if kind in ("prose", "list_item") and total_chars:
        if link_chars / total_chars > LINK_DENSITY_THRESHOLD:
            return "boilerplate", False
    if (not skip_formula and kind in ("prose", "header", "list_item")
            and is_formula_text(text)):
        return "formula", False
    if kind == "code_block":
        return kind, False
    return kind, True


SPEED_MODES = ("fast", "balanced", "accurate")

# fast mode (S4 analog, core.py:93-117): the reference's fast profile
# trades table/structure fidelity for 3-5× parse speed (pypdfium2 backend
# + TableFormerMode.FAST).  Our lexer's analog: skip table-structure
# recovery (td/th/caption become plain flush tags — no table_cell/caption
# spans) and skip the formula regex classification.  balanced == accurate
# for the HTML path (the reference's balanced/accurate split only selects
# the Docling table model quality).
_FAST_SKIPPED_KINDS = frozenset(("table_cell", "caption"))


def segment_html(content: str, speed_mode: str = "accurate") -> list[_RawSpan]:
    """Stream-lex HTML into classified block spans.

    A single pass over tag tokens; text nodes accumulate into the current
    block.  ``data-page`` attributes update the current page number
    (page-marker analog, html_generator.py:538-544 — page_no is carried on
    the span).  Subtrees under :data:`DROP_TAGS` are skipped entirely
    (PAGE_HEADER/PAGE_FOOTER drop).  Link density over prose/list blocks
    marks boilerplate (north-star DOM heuristic).  ``speed_mode='fast'``
    drops table-cell/caption recovery and formula classification (lower
    fidelity for speed, the S4 contract — see :data:`SPEED_MODES`).
    """
    if speed_mode not in SPEED_MODES:
        raise ValueError(f"speed_mode must be one of {SPEED_MODES}, got {speed_mode!r}")
    fast = speed_mode == "fast"
    spans: list[_RawSpan] = []
    drop_stack: list[str] = []
    a_depth = 0
    # open block state
    blk_kind: str | None = None
    blk_parts: list[str] = []
    blk_start = 0
    blk_end = 0
    blk_link = 0
    blk_total = 0
    blk_line = 1

    def flush() -> None:
        nonlocal blk_kind, blk_parts, blk_link, blk_total
        if blk_kind is not None:
            raw = "".join(blk_parts)
            text = _WS_RE.sub(" ", _htmllib.unescape(raw)).strip()
            if text:
                kind, translatable = _classify_block(
                    blk_kind, text, blk_link, blk_total, skip_formula=fast
                )
                spans.append((text, blk_start, blk_end, kind, translatable, blk_line))
        blk_kind = None
        blk_parts = []
        blk_link = 0
        blk_total = 0

    pos = 0
    cur_line = 1  # incremental 1+content[:pos].count("\n") — O(n) total,
    # not O(n²) like a per-block prefix count on 100KB+ real pages
    for m in _HTML_TOKEN_RE.finditer(content):
        # text node before this tag
        if m.start() > pos and not drop_stack:
            chunk = content[pos : m.start()]
            if blk_kind is not None and chunk:
                blk_parts.append(chunk)
                blk_end = m.start()
                n = len(chunk)
                blk_total += n
                if a_depth > 0:
                    blk_link += n
        tok = m.group()
        cur_line += content.count("\n", pos, m.end())
        pos = m.end()
        if tok.startswith("<!--") or tok.startswith("<!["):
            continue
        nm = _TAG_NAME_RE.match(tok)
        if nm is None:
            continue
        tag = nm.group(1).lower()
        closing = tok.startswith("</")
        self_closing = tok.endswith("/>") or tag in ("br", "hr", "img", "meta", "link", "input")

        if not closing and _DATA_PAGE_RE.search(tok) is not None:
            flush()  # page boundary terminates any open block

        if tag in DROP_TAGS:
            if closing:
                if drop_stack and drop_stack[-1] == tag:
                    drop_stack.pop()
                elif tag in drop_stack:
                    while drop_stack and drop_stack.pop() != tag:
                        pass
            elif not self_closing:
                if not drop_stack:
                    flush()
                drop_stack.append(tag)
            continue
        if drop_stack:
            continue

        if tag == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
            continue

        if tag in _BLOCK_KIND:
            flush()
            if not closing:
                kind = _BLOCK_KIND[tag]
                if fast and kind in _FAST_SKIPPED_KINDS:
                    continue  # fast mode: cell/caption text is never collected
                blk_kind = kind
                blk_start = m.end()
                blk_end = m.end()
                blk_line = cur_line
        elif tag in _FLUSH_TAGS:
            flush()

    # trailing text after the last tag
    if pos < len(content) and not drop_stack and blk_kind is not None:
        chunk = content[pos:]
        blk_parts.append(chunk)
        blk_end = len(content)
        blk_total += len(chunk)
        if a_depth > 0:
            blk_link += len(chunk)
    flush()
    return spans


def _attach_pages(content: str, spans: list[_RawSpan]) -> list[tuple]:
    """Attach page_no per span from data-page markers preceding its start."""
    markers: list[tuple[int, int]] = []
    for m in re.finditer(r"<[^>]*data-page\s*=\s*[\"']?(\d+)[^>]*>", content):
        markers.append((m.start(), int(m.group(1))))
    out = []
    mi = 0
    cur = -1
    for s in spans:
        while mi < len(markers) and markers[mi][0] <= s[1]:
            cur = markers[mi][1]
            mi += 1
        out.append((*s, cur))
    return out


# ---------------------------------------------------------------------------
# Top-level per-page extraction
# ---------------------------------------------------------------------------


def segment_content(doctype: str, content: str,
                    speed_mode: str = "accurate") -> list[Span]:
    """Segment decoded content by doctype → dense-seg_id spans."""
    if doctype == "html":
        raw = _attach_pages(content, segment_html(content, speed_mode))
    else:
        seg = _TEXT_SEGMENTERS.get(doctype, _segment_plaintext)
        raw = [(*s, -1) for s in seg(content)]
    return [
        Span(i, start, end, kind, translatable, line, page, text)
        for i, (text, start, end, kind, translatable, line, page) in enumerate(raw)
    ]


def translatable_texts(spans: Iterable[Span]) -> list[str]:
    """M8 filter: translatable and non-blank (text_parser.py:494-504)."""
    return [s.text for s in spans if s.translatable and s.text.strip()]


def assemble_text(spans: Iterable[Span]) -> str:
    """Reading-order extracted text: translatable span texts joined by \\n.

    Order = ``seg_id`` ascending (reading-order contract, core.py:422).
    """
    ordered = sorted(spans, key=lambda s: s.seg_id)
    return "\n".join(s.text for s in ordered if s.translatable and s.text.strip())


def extract_page(url: str, data: bytes, speed_mode: str = "accurate") -> dict:
    """Full single-page extraction: decode → detect → segment → assemble.

    Returns a plain dict (url, doctype, status, extracted_text, n_spans,
    spans) — the golden record the Ray pipeline must reproduce per url.
    ``speed_mode`` selects the S4 fidelity/speed profile (fast skips
    table-structure recovery; byte-identity goldens are frozen per mode).
    """
    try:
        if data[:5] == b"%PDF-":
            # PDF lane works on RAW bytes (streams are binary; the decode
            # ladder would mangle them) — pdf_core does layout analysis:
            # page segmentation + (−y, x) reading-order sort
            from docling_translate_ray import pdf_core

            spans = [Span(i, start, end, kind, tr, line, page, text)
                     for i, (text, start, end, kind, tr, line, page)
                     in enumerate(pdf_core.segment_pdf(data))]
            return {
                "url": url, "doctype": "pdf", "status": "ok",
                "extracted_text": assemble_text(spans), "spans": spans,
            }
        if data[:4] == b"PK\x03\x04":
            # OOXML lane also works on RAW bytes (zip container); a zip
            # that is not a docx/pptx package stays a binary skip
            from docling_translate_ray import ooxml_core

            kind = ooxml_core.sniff_ooxml(data)
            if kind in ("docx", "pptx"):
                seg = (ooxml_core.segment_docx if kind == "docx"
                       else ooxml_core.segment_pptx)
                spans = [Span(i, start, end, k, tr, line, page, text)
                         for i, (text, start, end, k, tr, line, page)
                         in enumerate(seg(data))]
                return {
                    "url": url, "doctype": kind, "status": "ok",
                    "extracted_text": assemble_text(spans), "spans": spans,
                }
            return {
                "url": url, "doctype": "binary", "status": "skipped_binary",
                "extracted_text": "", "spans": [],
            }
        if is_binary(data):
            return {
                "url": url, "doctype": "binary", "status": "skipped_binary",
                "extracted_text": "", "spans": [],
            }
        content = decode_bytes(data)
        doctype = detect_doctype(url, data)
        spans = segment_content(doctype, content, speed_mode)
        return {
            "url": url, "doctype": doctype, "status": "ok",
            "extracted_text": assemble_text(spans), "spans": spans,
        }
    except Exception as exc:  # poison page → error row, never a failed block
        return {
            "url": url, "doctype": "unknown", "status": f"error:{type(exc).__name__}",
            "extracted_text": "", "spans": [],
        }


_SENTENCE_KINDS = frozenset(
    "prose header list_item comment line_comment block_comment docstring".split()
)


def assemble_scored_text(
    spans: Iterable,  # Span or dict rows
    mapping: dict[str, str],
    miss_policy: str = "empty",
) -> str:
    """Rebuild per-document output text from a sentence→scored mapping.

    Mirrors Phase 3 of the reference (html_generator.py:560-571): each
    sentence-split span is re-tokenized, probed against the map, and joined
    with single spaces; whole-span kinds probe once.  Miss policies replicate
    the reference divergence: ``empty`` = ``''`` on miss (doc path,
    html_generator.py:565-567); ``identity`` = original on miss (text path,
    text_html_generator.py:481).
    """
    assert miss_policy in ("empty", "identity")
    parts: list[str] = []
    get = mapping.get
    for s in sorted(spans, key=lambda x: _field(x, "seg_id")):
        if not _field(s, "translatable") or not _field(s, "text").strip():
            continue
        text = _field(s, "text")
        if _field(s, "kind") in _SENTENCE_KINDS:
            sents = split_sentences(text)
            scored = [
                get(x, x if miss_policy == "identity" else "") for x in sents
            ]
            parts.append(" ".join(scored))
        else:
            parts.append(get(text, text if miss_policy == "identity" else ""))
    return "\n".join(parts)


def _field(s, name: str):
    return getattr(s, name) if isinstance(s, Span) else s[name]


def sentences_of_spans(spans: Iterable[Span]) -> list[tuple[int, int, str]]:
    """Explode translatable prose-like spans to (seg_id, sent_idx, sentence).

    Sentence-split applies to prose/header/list_item (TextItem analog,
    core.py:424-428); captions and table cells are collected whole
    (core.py:430-451).
    """
    out: list[tuple[int, int, str]] = []
    for s in spans:
        if not s.translatable or not s.text.strip():
            continue
        if s.kind in _SENTENCE_KINDS:
            for i, sent in enumerate(split_sentences(s.text)):
                out.append((s.seg_id, i, sent))
        else:
            out.append((s.seg_id, 0, s.text))
    return out
