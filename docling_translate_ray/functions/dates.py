"""Publish-date extraction — the trafilatura/htmldate slot.

Web-corpus curation wants a publication date per page (freshness
filters, dedup tie-breaks, temporal train/test splits).  Real
extractors (htmldate, trafilatura's metadata pass) walk an evidence
ladder; this module implements the same ladder as ONE vectorized
regex pass per rung over Arrow string columns — no DOM build, no
Python row loop — with a frozen precedence:

    1. ``<meta property="article:published_time" content="...">``
    2. ``<time datetime="...">``
    3. a ``/YYYY/MM/DD/`` path segment in the URL
    4. the first ISO ``YYYY-MM-DD`` literal in the body text

Reference parity note: the reference repo has no date extractor (its
Docling path is layout-only); this is one of the beyond-reference
curation operators the brief asks for.

Engine-lockstep design (the @NONWS@ lesson from ``__ray_entry__``):
the polars kernel (rust-regex) and the DuckDB oracle (RE2) must agree
byte-for-byte, so every pattern below

* uses explicit ``[0-9]`` — rust-regex ``\\d``/``\\b`` are
  Unicode-aware, RE2's are ASCII-only;
* avoids lookaround (neither engine has it) — boundaries are
  consuming non-capturing groups and the DATE is group 1;
* validates month/day IN the pattern (``0[1-9]|1[0-2]`` …) so neither
  side needs a post-filter.

DuckDB's ``regexp_extract`` returns ``''`` on no-match where polars
``str.extract`` returns null — the SQL builder wraps every rung in
``nullif(.., '')``.
"""

from __future__ import annotations

import pyarrow as pa

# YYYY-MM-DD with in-pattern month/day validation (years 1900-2099)
_DATE_CORE = r"(?:19|20)[0-9]{2}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]|3[01])"
# the same date as a /YYYY/MM/DD url path segment
_URL_CORE = r"(?:19|20)[0-9]{2}/(?:0[1-9]|1[0-2])/(?:0[1-9]|[12][0-9]|3[01])"

META_DATE_RE = (r'article:published_time"[^>]*content="(' + _DATE_CORE + ")")
TIME_DATE_RE = r'<time[^>]*datetime="(' + _DATE_CORE + ")"
URL_DATE_RE = "/(" + _URL_CORE + ")(?:/|$)"
TEXT_DATE_RE = "(?:^|[^0-9])(" + _DATE_CORE + ")(?:$|[^0-9])"

# precedence order: (source label, which column, pattern, slashes?)
DATE_LADDER = (
    ("meta", "html", META_DATE_RE, False),
    ("time", "html", TIME_DATE_RE, False),
    ("url", "url", URL_DATE_RE, True),
    ("text", "html", TEXT_DATE_RE, False),
)


def _rung_exprs(url_column: str, html_column: str):
    """One polars Expr per ladder rung (null = no evidence)."""
    import polars as pl

    col = {"html": html_column, "url": url_column}
    out = []
    for src, which, pat, slashed in DATE_LADDER:
        e = pl.col(col[which]).fill_null("").str.extract(pat, 1)
        if slashed:
            e = e.str.replace_all("/", "-", literal=True)
        out.append((src, e))
    return out


def extract_pub_date_batch(batch: pa.Table, id_column: str = "doc_id",
                           url_column: str = "url",
                           html_column: str = "html") -> pa.Table:
    """map_batches body: ``(id_column, pub_date, date_source)`` —
    ``pub_date`` is the first ladder rung that fired (ISO string, null
    if none), ``date_source`` names the rung (``none`` if null)."""
    import polars as pl

    rungs = _rung_exprs(url_column, html_column)
    src = pl.lit("none")
    for name, e in reversed(rungs):
        src = pl.when(e.is_not_null()).then(pl.lit(name)).otherwise(src)
    df = pl.from_arrow(batch.select([id_column, url_column, html_column]))
    out = df.select(
        pl.col(id_column).cast(pl.Int64),
        pl.coalesce([e for _, e in rungs]).alias("pub_date"),
        src.alias("date_source"),
    )
    return out.to_arrow().cast(pa.schema([
        (id_column, pa.int64()), ("pub_date", pa.string()),
        ("date_source", pa.string())]))


def extract_pub_dates(ds, id_column: str = "doc_id",
                      url_column: str = "url", html_column: str = "html"):
    """Dataset wrapper — one streaming pass, no exchange."""
    return ds.map_batches(
        lambda b: extract_pub_date_batch(
            b, id_column=id_column, url_column=url_column,
            html_column=html_column),
        batch_format="pyarrow")


def pub_date_sql_exprs(url_col: str, html_col: str) -> tuple[str, str]:
    """``(pub_date_expr, date_source_expr)`` replaying the SAME ladder
    in DuckDB — patterns come from the same constants, so there is one
    source of truth for both engines."""
    col = {"html": html_col, "url": url_col}
    rungs = []
    for src, which, pat, slashed in DATE_LADDER:
        e = f"nullif(regexp_extract({col[which]}, '{pat}', 1), '')"
        if slashed:
            e = f"replace({e}, '/', '-')"
        rungs.append((src, e))
    pub = "coalesce(" + ", ".join(e for _, e in rungs) + ")"
    cases = " ".join(f"WHEN {e} IS NOT NULL THEN '{s}'" for s, e in rungs)
    return pub, f"CASE {cases} ELSE 'none' END"
