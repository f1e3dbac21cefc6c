"""HTML rendering stage — the reference's Phase-3 generator re-expressed.

Mirrors ``html_generator.py:495-761`` / ``text_html_generator.py:409-524``
semantics as a pure per-doc function inside ``map_batches``:

* spans render in reading order (``seg_id`` asc — O1 contract, core.py:422);
* a page marker is emitted when ``page_no`` changes (M15,
  html_generator.py:538-544);
* kind routing (M14, html_generator.py:575-640): ``header``→``<h2>``,
  ``list_item``→``<li>``, ``caption``→``<figcaption>``, ``table_cell``→
  ``<td>``-run, ``code``→``<pre>``, ``formula``→M11 math wrap
  (html_generator.py:48-64), everything else→``<p>``;
* every text node is HTML-escaped (M16, html_generator.py:580);
* paired ``id="src-{seg}-{i}"`` / ``id="tgt-{seg}-{i}"`` spans when a
  sentence→scored mapping is provided (html_generator.py:600-640), with the
  doc path's ``''``-on-miss policy.
"""

from __future__ import annotations

import html as _html

import pyarrow as pa

from docling_translate_ray import extract_core as ec


def _fetch_map(map_ref) -> dict[str, str]:
    """Broadcast score map → dict: accepts a plain dict, an ObjectRef to a
    dict, or an ObjectRef to the Arrow (sentence, scored) table that
    ``stages.dedup.broadcast_score_map`` now produces."""
    import ray

    obj = ray.get(map_ref) if isinstance(map_ref, ray.ObjectRef) else map_ref
    if isinstance(obj, dict):
        return obj
    cols = obj.column_names
    return dict(zip(obj[cols[0]].to_pylist(), obj["scored"].to_pylist()))


# M11 formula wrap: extract_core.format_formula is the single source of
# truth (it matches html_generator.py:48-64 incl. the already-wrapped
# passthrough and the bare-'&' aligned test; an earlier local copy here
# had diverged)
_format_formula = ec.format_formula


def render_doc_html(url: str, spans: list[dict],
                    mapping: dict[str, str] | None = None,
                    miss_policy: str = "empty") -> str:
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(url)}</title></head><body>",
    ]
    page_no = None
    for s in sorted(spans or [], key=lambda x: x["seg_id"]):
        if not s["translatable"] or not s["text"].strip():
            continue
        if s["page_no"] != page_no and s["page_no"] > 0:
            page_no = s["page_no"]
            parts.append(f"<hr class='page-marker' data-page='{page_no}'/>")
        kind, text, seg = s["kind"], s["text"], s["seg_id"]
        if kind == "formula":
            parts.append(f"<div class='formula'>{_html.escape(_format_formula(text))}</div>")
            continue
        if kind in ec._SENTENCE_KINDS:
            sents = ec.split_sentences(text)
        else:
            sents = [text]
        src = " ".join(
            f"<span id='src-{seg}-{i}'>{_html.escape(x)}</span>"
            for i, x in enumerate(sents)
        )
        body = src
        if mapping is not None:
            tgt = " ".join(
                "<span id='tgt-{}-{}'>{}</span>".format(
                    seg, i,
                    _html.escape(
                        mapping.get(x, x if miss_policy == "identity" else "")
                    ),
                )
                for i, x in enumerate(sents)
            )
            body = f"{src}<br/>{tgt}"
        if kind == "header":
            parts.append(f"<h2>{body}</h2>")
        elif kind == "list_item":
            parts.append(f"<ul><li>{body}</li></ul>")
        elif kind == "caption":
            parts.append(f"<figure><figcaption>{body}</figcaption></figure>")
        elif kind == "table_cell":
            parts.append(f"<table><tr><td>{body}</td></tr></table>")
        elif kind in ("code", "code_block"):
            parts.append(f"<pre><code>{body}</code></pre>")
        else:
            parts.append(f"<p>{body}</p>")
    parts.append("</body></html>")
    return "".join(parts)


_MD_SEP_RE = None  # compiled lazily below


def render_markdown_html(url: str, content: str,
                         translations: dict[str, str] | None = None,
                         miss_policy: str = "identity") -> str:
    """M18 markdown render with the reference's three extensions
    (text_html_generator.py:24 — ``fenced_code``, ``tables``, ``nl2br``):

    * fenced blocks (``\\`\\`\\``` / ``~~~``) → ``<pre><code>`` verbatim
      (never translated);
    * pipe tables (header row + ``|---|`` separator) → ``<table>`` with
      per-cell translation probes;
    * single newlines inside a paragraph → ``<br/>`` (nl2br);
    * plus headings / bullet lists / paragraphs from the mini renderer.

    ``translations`` probes per text block/cell; the default miss policy is
    identity (text path, text_html_generator.py:481).
    """
    import re as _re

    global _MD_SEP_RE
    if _MD_SEP_RE is None:
        _MD_SEP_RE = _re.compile(r"^[\s:|-]+$")

    def is_sep(line: str) -> bool:
        # GFM-style separator: only [-:| ] chars, with BOTH a dash and a
        # pipe present — a bare '---' is a thematic break / setext
        # underline, never a table separator, while '| ---' and '--- |'
        # single-column forms both qualify
        return bool(_MD_SEP_RE.match(line)) and "-" in line and "|" in line

    def tr(text: str) -> str:
        if translations is None:
            return text
        return translations.get(
            text, text if miss_policy == "identity" else "")

    def cells(row: str) -> list[str]:
        return [c.strip() for c in row.strip().strip("|").split("|")]

    lines = content.split("\n")
    out = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(url)}</title></head><body>",
    ]
    i = 0
    while i < len(lines):
        ln = lines[i]
        stripped = ln.strip()
        if stripped.startswith("```") or stripped.startswith("~~~"):
            fence = stripped[:3]
            code: list[str] = []
            i += 1
            while i < len(lines) and not lines[i].strip().startswith(fence):
                code.append(lines[i])
                i += 1
            i += 1  # closing fence
            out.append(f"<pre><code>{_html.escape(chr(10).join(code))}</code></pre>")
            continue
        if ("|" in ln and stripped and i + 1 < len(lines)
                and is_sep(lines[i + 1])):
            header = cells(ln)
            i += 2
            rows: list[list[str]] = []
            while i < len(lines) and "|" in lines[i] and lines[i].strip():
                rows.append(cells(lines[i]))
                i += 1
            thead = "".join(f"<th>{_html.escape(tr(c))}</th>" for c in header)
            tbody = "".join(
                "<tr>" + "".join(f"<td>{_html.escape(tr(c))}</td>" for c in r) + "</tr>"
                for r in rows
            )
            out.append(
                f"<table><thead><tr>{thead}</tr></thead><tbody>{tbody}</tbody></table>"
            )
            continue
        if not stripped:
            i += 1
            continue
        block = [ln]
        i += 1
        while (i < len(lines) and lines[i].strip()
               and not lines[i].strip().startswith(("```", "~~~"))):
            block.append(lines[i])
            i += 1
        # headings close themselves even without a trailing blank line
        # (markdown lib behavior) — including several in a row
        while block:
            m = _re.match(r"^(#{1,6})\s+(.*)$", block[0])
            if not m:
                break
            lvl = len(m.group(1))
            out.append(f"<h{lvl}>{_html.escape(tr(m.group(2)))}</h{lvl}>")
            block = block[1:]
        if not block:
            continue
        if all(_re.match(r"^\s*[-*]\s+", b) for b in block):
            stripped_items = [_re.sub(r"^\s*[-*]\s+", "", b) for b in block]
            items = "".join(
                f"<li>{_html.escape(tr(it))}</li>" for it in stripped_items
            )
            out.append(f"<ul>{items}</ul>")
            continue
        # nl2br: single newlines inside the paragraph become <br/>
        out.append("<p>" + "<br/>".join(_html.escape(tr(b)) for b in block) + "</p>")
    out.append("</body></html>")
    return "".join(out)


def render_code_html(url: str, content: str,
                     translations: dict[str, str]) -> str:
    """M17/J3 code-file re-render (text_html_generator.py:844-889):

    * the WHOLE file is HTML-escaped first (:846);
    * translated segments are substring-replaced into the escaped content
      **longest-original-first** (O3, :848-853 — so a comment that contains
      another comment's text is replaced before its substring) and
      **first occurrence only** (O4, :868 — ``str.replace(..., 1)``);
    * output is line-numbered (:872-880).
    """
    escaped = _html.escape(content)
    pairs = sorted(translations.items(), key=lambda kv: len(kv[0]), reverse=True)
    for orig, trans in pairs:
        if not orig.strip():
            continue
        esc_orig = _html.escape(orig)
        replacement = (
            f"<span class='src-comment'>{esc_orig}</span>"
            f"<span class='tgt-comment'>{_html.escape(trans)}</span>"
        )
        escaped = escaped.replace(esc_orig, replacement, 1)
    lines = escaped.split("\n")
    body = "".join(
        f"<div class='code-line'><span class='lineno'>{i + 1}</span>"
        f"<code>{line}</code></div>"
        for i, line in enumerate(lines)
    )
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(url)}</title></head><body>"
        f"<div class='code-file'>{body}</div></body></html>"
    )


class RenderCodeHtml:
    """Actor-pool stage: docs_text rows (url, body, spans …) + broadcast
    segment→scored map → ``html_render`` column via :func:`render_code_html`.

    The map travels once (``ray.put``; J1/J3) and misses fall back to
    identity — the TEXT path's miss policy (text_html_generator.py:481)."""

    def __init__(self, map_ref=None) -> None:
        self._map = {}
        if map_ref is not None:
            self._map = _fetch_map(map_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        bodies = batch["body"].to_pylist()
        spans_lists = batch["spans"].to_pylist() if "spans" in batch.column_names \
            else [None] * len(urls)
        out = []
        for u, body, spans in zip(urls, bodies, spans_lists):
            # translations keyed by the translatable segment texts of THIS doc
            trans = {}
            for s in spans or []:
                if s["translatable"] and s["text"].strip():
                    trans[s["text"]] = self._map.get(s["text"], s["text"])
            out.append(render_code_html(u, body or "", trans))
        return batch.append_column("html_render", pa.array(out, pa.string()))


class RenderHtml:
    """Actor-pool render stage over a docs batch (url, spans, …) → ``html``.

    An optional broadcast sentence→scored map (``ray.put`` once — J2
    pattern) turns it into the side-by-side bilingual page the reference
    emits; fetched once per actor in ``__init__``.
    """

    def __init__(self, map_ref=None, miss_policy: str = "empty") -> None:
        self._map = None
        if map_ref is not None:
            self._map = _fetch_map(map_ref)
        self._miss = miss_policy

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        spans_lists = batch["spans"].to_pylist()
        out = [
            render_doc_html(u, sp or [], self._map, self._miss)
            for u, sp in zip(urls, spans_lists)
        ]
        return batch.append_column("html_render", pa.array(out, pa.string()))


_MANIFEST_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("path", pa.string()),
    ("n_bytes", pa.int64()),
])


def write_html_files(docs_ds, out_dir: str, map_ref=None,
                     miss_policy: str = "empty", concurrency: int | None = None):
    """Per-document ``.html`` FILE sink — the reference's
    ``output/<name>.html`` deliverable (html_generator writes one page
    per input file), produced distributedly: a :class:`RenderHtml`
    actor pool renders, then each task writes its batch's files and
    emits manifest rows ``(url, path, n_bytes)`` — the driver only ever
    sees the KB-sized manifest, never a page.

    File naming is deterministic and collision-safe: ``<stem>-<md5[:8]
    of the full url>.html``, sharded into 256 ``md5[:2]`` subdirectories
    so no directory ever holds the whole corpus.  Writes are idempotent
    (same url → same path, overwrite).  At 10^12 documents the parquet
    ``docs/`` output is the scan-friendly sink; this one exists for the
    reference's per-file UX parity and human inspection.
    """
    import hashlib
    import os

    from docling_translate_ray.util import auto_pool_size

    os.makedirs(out_dir, exist_ok=True)
    rendered = docs_ds.map_batches(
        RenderHtml, batch_format="pyarrow",
        fn_constructor_kwargs={"map_ref": map_ref, "miss_policy": miss_policy},
        concurrency=concurrency or auto_pool_size(),
    )

    def write_files(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _MANIFEST_SCHEMA.empty_table()
        urls = batch["url"].to_pylist()
        htmls = batch["html_render"].to_pylist()
        paths, sizes = [], []
        for u, h in zip(urls, htmls):
            digest = hashlib.md5(u.encode("utf-8")).hexdigest()
            stem = os.path.splitext(os.path.basename(u.rstrip("/")))[0] or "doc"
            stem = "".join(c if c.isalnum() or c in "-_." else "_"
                           for c in stem)[:80]
            sub = os.path.join(out_dir, digest[:2])
            os.makedirs(sub, exist_ok=True)
            p = os.path.join(sub, f"{stem}-{digest[:8]}.html")
            data = (h or "").encode("utf-8")
            with open(p, "wb") as f:
                f.write(data)
            paths.append(p)
            sizes.append(len(data))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "path": pa.array(paths, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
        })

    return rendered.map_batches(write_files, batch_format="pyarrow")
