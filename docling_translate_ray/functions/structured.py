"""Structured-data (JSON-LD) extraction — the extruct/schema.org slot.

News/article corpora carry their clean metadata in
``<script type="application/ld+json">`` blocks (schema.org Article /
NewsArticle): headline, publish date, author.  Real extractors
(extruct, trafilatura's metadata pass) parse these; this module does
the same as a stateless ``map_batches`` lane:

* block discovery is ONE vectorized regex pass per batch (polars
  ``extract_all`` over the html column — no Python scan per row);
* each found block parses with ``json.loads`` (small, per-block —
  the same per-document-parse budget as the table/extraction lanes);
  invalid JSON, non-object roots and non-schema.org types are SKIPPED,
  never raised (crawl JSON-LD is full of trailing commas and PHP
  serializer bugs);
* emitted rows: ``(url, block_idx, jtype, headline, date_published,
  author)`` where ``block_idx`` is the ordinal among the VALID blocks
  of the page (0-based) and the fields follow frozen ladders:

      jtype:          ``@type`` (string; list takes element 0)
      headline:       ``headline`` → ``name``
      date_published: ``datePublished``
      author:         ``author.name`` → ``author`` (when a string) →
                      ``author[0].name`` (when a list)

  absent rungs emit ``''`` (not null) so value-hash oracles compare
  exactly (the headmeta convention).

Engine-lockstep note: the discovery regex uses explicit char classes
and no lookaround (RE2/rust-regex-safe, the dates.py discipline); the
oracle replays field ladders with DuckDB ``json_extract_string`` over
the SAME planted blocks.
"""

from __future__ import annotations

import json

import pyarrow as pa

# attribute order tolerant enough for the planted corpus + common pages:
# type attr anywhere in the script tag, body lazily up to the closing tag
# ((?s:…) so JSON containing '<' — legal inside JSON strings, e.g. markup
# in headline/articleBody — is not silently dropped; scoped-flag form is
# valid in both Python re and polars' rust regex)
JSONLD_RE = (r'<script[^>]*type="application/ld\+json"[^>]*>'
             r'((?s:.*?))</script>')


def _field(obj: dict, *path):
    cur = obj
    for p in path:
        if isinstance(cur, dict) and p in cur:
            cur = cur[p]
        else:
            return None
    return cur


def _as_str(v):
    return v if isinstance(v, str) else None


def parse_jsonld_blocks(blocks: list[str]) -> list[tuple]:
    """Valid schema.org-ish blocks → (jtype, headline, date, author)
    tuples, invalid blocks skipped (frozen ladders above)."""
    out = []
    for raw in blocks:
        try:
            obj = json.loads(raw)
        except (ValueError, TypeError):
            continue
        if not isinstance(obj, dict):
            continue
        jt = obj.get("@type")
        if isinstance(jt, list) and jt:
            jt = jt[0]
        if not isinstance(jt, str):
            continue
        headline = _as_str(obj.get("headline")) or _as_str(obj.get("name"))
        date = _as_str(obj.get("datePublished"))
        author = obj.get("author")
        if isinstance(author, list) and author:
            author = author[0]
        if isinstance(author, dict):
            author = _as_str(author.get("name"))
        author = _as_str(author)
        out.append((jt, headline or "", date or "", author or ""))
    return out


def jsonld_batch(batch: pa.Table, html_column: str = "html",
                 url_column: str = "url") -> pa.Table:
    """map_batches kernel: pages → one row per valid JSON-LD block."""
    import polars as pl

    from docling_translate_ray.extract_core import decode_bytes

    col = batch[html_column]
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        texts = [decode_bytes(v) if v is not None else ""
                 for v in col.to_pylist()]
    else:
        texts = [v or "" for v in col.to_pylist()]
    found = pl.Series("h", texts).str.extract_all(JSONLD_RE)
    urls = batch[url_column].to_pylist()
    u, bi, jt, hl, dp, au = [], [], [], [], [], []
    import re as _re
    inner = _re.compile(JSONLD_RE)
    for url, whole in zip(urls, found.to_list()):
        if not whole:
            continue
        blocks = [inner.match(w).group(1) for w in whole]
        for i, (t, h, d, a) in enumerate(parse_jsonld_blocks(blocks)):
            u.append(url)
            bi.append(i)
            jt.append(t)
            hl.append(h)
            dp.append(d)
            au.append(a)
    return pa.table({
        "url": pa.array(u, pa.string()),
        "block_idx": pa.array(bi, pa.int64()),
        "jtype": pa.array(jt, pa.string()),
        "headline": pa.array(hl, pa.string()),
        "date_published": pa.array(dp, pa.string()),
        "author": pa.array(au, pa.string()),
    })


def extract_jsonld(ds, html_column: str = "html", url_column: str = "url"):
    """Dataset op: pages → schema.org metadata rows (streaming, one
    stateless map stage)."""
    return ds.map_batches(
        lambda b: jsonld_batch(b, html_column=html_column,
                               url_column=url_column),
        batch_format="pyarrow",
    )
