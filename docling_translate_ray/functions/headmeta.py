"""Head-metadata extraction — the trafilatura/extruct metadata slot.

Web-corpus curation wants per-page metadata next to the extracted
text: the page *title* (dedup tie-breaks, retrieval display), the
*meta description* (snippet corpora, weak labels) and the
*rel=canonical* URL (crawl-variant collapse BEFORE content dedup —
the cheap upstream sibling of functions/urltools' canonicalization).
Real extractors (trafilatura's metadata pass, extruct) walk the
``<head>``; this module does the same as ONE vectorized regex pass
per ladder rung over Arrow string columns — no DOM build, no Python
row loop — with frozen precedence per field:

    title:        og:title (either attribute order) → ``<title>`` tag
    description:  ``<meta name="description">`` → og:description
    canonical:    ``<link rel="canonical">`` (either attribute order)

Only the first ``HEAD_CHARS`` characters are scanned (head metadata
lives at the top of the page; scanning 100 TB of full bodies for a
``<title>`` would be a read-amplification bug, and late decoys are a
spoof vector) — the cutoff is part of the frozen spec and is pinned
by tests and the SQL oracle alike.

Reference parity note: the reference repo keeps no page metadata (its
HTML path goes straight to block text, text_html_generator.py); this
is one of the beyond-reference curation operators the brief asks for.

Engine-lockstep rules (same as functions/dates.py): explicit char
classes (no ``\\d``/``\\s``/``\\b`` — rust-regex is Unicode-aware
where RE2 is ASCII), no lookaround, the value is group 1, captures
use ``+`` not ``*`` (a polars empty capture is ``''`` where a DuckDB
no-match is also ``''`` — requiring one char keeps ''/null aligned),
and whitespace trimming names its charset explicitly (DuckDB
``trim(x)`` strips spaces only; polars ``strip_chars()`` strips all
whitespace — both sides use the explicit ``WS_CHARS`` set).
"""

from __future__ import annotations

import pyarrow as pa

HEAD_CHARS = 4096          # frozen scan window (chars, post-decode)
WS_CHARS = " \t\r\n"

# attribute values never legally contain an unescaped '"', and '[^>]*'
# keeps a rung from matching across a tag boundary; each two-order
# pair exists because real pages emit attributes in either order
OG_TITLE_P_RE = r'property="og:title"[^>]*content="([^"]+)"'
OG_TITLE_C_RE = r'content="([^"]+)"[^>]*property="og:title"'
TITLE_TAG_RE = r"<title[^>]*>([^<]+)</title>"
DESC_NAME_P_RE = r'name="description"[^>]*content="([^"]+)"'
DESC_NAME_C_RE = r'content="([^"]+)"[^>]*name="description"'
OG_DESC_P_RE = r'property="og:description"[^>]*content="([^"]+)"'
OG_DESC_C_RE = r'content="([^"]+)"[^>]*property="og:description"'
CANON_R_RE = r'rel="canonical"[^>]*href="([^"]+)"'
CANON_H_RE = r'href="([^"]+)"[^>]*rel="canonical"'

# precedence ladders: (source label, pattern); within a field the
# first rung that fires wins, and the label names it
TITLE_LADDER = (("og", OG_TITLE_P_RE), ("og", OG_TITLE_C_RE),
                ("tag", TITLE_TAG_RE))
DESC_LADDER = (("meta", DESC_NAME_P_RE), ("meta", DESC_NAME_C_RE),
               ("og", OG_DESC_P_RE), ("og", OG_DESC_C_RE))
CANON_LADDER = (("link", CANON_R_RE), ("link", CANON_H_RE))


def _field_exprs(head):
    """(value, source) polars Exprs for one ladder over the sliced
    head; both sides map whitespace-only / empty values to null."""
    import polars as pl

    def one(ladder):
        rungs = []
        for label, pat in ladder:
            e = head.str.extract(pat, 1).str.strip_chars(WS_CHARS)
            e = pl.when(e != "").then(e)          # '' and null → null
            rungs.append((label, e))
        val = pl.coalesce([e for _, e in rungs])
        src = pl.lit("none")
        for label, e in reversed(rungs):
            src = pl.when(e.is_not_null()).then(pl.lit(label)).otherwise(src)
        return val, src

    return one


def extract_head_meta_batch(batch: pa.Table, id_column: str = "doc_id",
                            html_column: str = "html") -> pa.Table:
    """map_batches body: ``(id_column, title, title_source,
    description, desc_source, canonical_url)`` — nulls where no rung
    fired, source labels ``none``."""
    import polars as pl

    df = pl.from_arrow(batch.select([id_column, html_column]))
    head = pl.col(html_column).fill_null("").str.slice(0, HEAD_CHARS)
    one = _field_exprs(head)
    title, title_src = one(TITLE_LADDER)
    desc, desc_src = one(DESC_LADDER)
    canon, _ = one(CANON_LADDER)
    out = df.select(
        pl.col(id_column),
        title.alias("title"), title_src.alias("title_source"),
        desc.alias("description"), desc_src.alias("desc_source"),
        canon.alias("canonical_url"),
    )
    # id keeps its INPUT type (string urls and int doc ids both work —
    # the strip_boilerplate convention, ADVICE r03)
    return out.to_arrow().cast(pa.schema([
        (id_column, batch.schema.field(id_column).type),
        ("title", pa.string()),
        ("title_source", pa.string()), ("description", pa.string()),
        ("desc_source", pa.string()), ("canonical_url", pa.string())]))


def extract_head_meta(ds, id_column: str = "doc_id",
                      html_column: str = "html"):
    """Dataset wrapper — one streaming pass, no exchange."""
    return ds.map_batches(
        lambda b: extract_head_meta_batch(
            b, id_column=id_column, html_column=html_column),
        batch_format="pyarrow")


def _sql_one(head: str, ladder) -> tuple[str, str]:
    """(value, source) DuckDB exprs replaying one ladder from the SAME
    constants; trim charset matches WS_CHARS explicitly."""
    ws = "' ' || chr(9) || chr(13) || chr(10)"
    rungs = []
    for label, pat in ladder:
        e = (f"nullif(trim(regexp_extract({head}, '{pat}', 1), {ws}), '')")
        rungs.append((label, e))
    val = "coalesce(" + ", ".join(e for _, e in rungs) + ")"
    cases = " ".join(f"WHEN {e} IS NOT NULL THEN '{lb}'"
                     for lb, e in rungs)
    return val, f"CASE {cases} ELSE 'none' END"


def head_meta_sql_exprs(html_col: str) -> dict[str, str]:
    """DuckDB exprs for every output column, generated from the same
    ladder constants as the polars kernel — one source of truth."""
    head = f"substring(coalesce({html_col}, ''), 1, {HEAD_CHARS})"
    title, title_src = _sql_one(head, TITLE_LADDER)
    desc, desc_src = _sql_one(head, DESC_LADDER)
    canon, _ = _sql_one(head, CANON_LADDER)
    return {"title": title, "title_source": title_src,
            "description": desc, "desc_source": desc_src,
            "canonical_url": canon}
