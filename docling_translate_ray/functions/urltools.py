"""URL canonicalization + canonical-URL dedup (the first step of every
Common-Crawl-style ingest: collapse crawl-time URL variants before any
content work).

The canonicalization spec (applied in this exact order; the DuckDB oracle
mirrors it step for step with the SAME regexes — RE2 and polars' rust-regex
agree on every construct used here, no lookaround, no ``\\s``):

1. drop the fragment            (``#.*$`` → "")
2. drop the query string        (``\\?.*$`` → "")
3. lowercase scheme+authority   (the path keeps its case)
4. drop default ports           (``:443`` on https, ``:80`` on http)
5. drop a leading ``www.`` host label
6. drop a single trailing ``/`` when it follows a non-slash character
   (the guard makes the whole chain IDEMPOTENT — found by the hypothesis
   fuzz: bare ``//`` must not collapse one slash per pass)

All vectorized (polars string kernels — one pass per rule over the whole
batch); the dedup is a partial-combiner → single hash-partition exchange,
so at corpus scale the shuffle carries one row per (batch, canonical_url),
never one per page.
"""

from __future__ import annotations

import pyarrow as pa

# scheme://authority — authority ends at the first /, ? or #
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def canonicalize_urls(s):
    """Vectorized canonical form of a polars String Series of URLs.

    URLs without a ``scheme://`` prefix pass through rules 1/2/6 only
    (there is no authority to normalize).
    """
    import polars as pl

    u = s.fill_null("")
    u = u.str.replace(r"#.*$", "")  # 1. fragment
    u = u.str.replace(r"\?.*$", "")  # 2. query
    auth = u.str.extract("(" + _AUTH_RE + ")", 1).fill_null("").str.to_lowercase()
    rest = u.str.replace(_AUTH_RE, "")
    u = pl.select((auth + rest).alias("u"))["u"]  # 3. lowercase scheme+authority
    u = u.str.replace(r"^(https://[^/:]+):443(/|$)", "${1}${2}")  # 4. default ports
    u = u.str.replace(r"^(http://[^/:]+):80(/|$)", "${1}${2}")
    u = u.str.replace(r"^(https?://)www\.", "${1}")  # 5. www. label
    u = u.str.replace(r"([^/])/$", "${1}")  # 6. trailing slash (idempotent)
    return u


def canonicalize_batch(batch: pa.Table, url_column: str = "url") -> pa.Table:
    """map_batches body: append ``canonical_url``."""
    import polars as pl

    canon = canonicalize_urls(pl.from_arrow(batch[url_column]))
    return batch.append_column(
        "canonical_url", canon.to_arrow().cast(pa.string())
    )


def extract_hosts(s):
    """Vectorized host of a polars String Series of URLs: the authority
    of a ``scheme://`` URL, lowercased, with userinfo (``user@``), a
    ``:port`` suffix and a leading ``www.`` label dropped.  Rows without
    a scheme have no authority and yield "" (the caller groups them
    under the empty host).  Regex-construct subset shared with the
    DuckDB oracle (RE2 ∩ rust-regex, same as canonicalize_urls).
    """
    host = s.fill_null("").str.extract("(" + _AUTH_RE + ")", 1)
    host = host.fill_null("").str.replace(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host = host.str.replace(r"^[^@]*@", "")  # userinfo
    host = host.str.replace(r":[0-9]*$", "")  # port
    host = host.str.to_lowercase()
    host = host.str.replace(r"^www\.", "")
    return host


def domain_cap(ds, k: int = 10, url_column: str = "url",
               id_column: str = "doc_id", num_partitions: int = 32):
    """Per-domain document cap (the Common-Crawl curation rule "keep at
    most k pages per host, deterministically"): rank each host's docs by
    ascending id and keep ``host_rank <= k``.

    Scale shape: the exchange is keyed by host and carries ONLY
    (host, id) — two narrow columns, never text — so even a
    whole-corpus cap moves ~16 bytes/doc; ranking inside a partition is
    one vectorized sort + window cum-count.  Hot hosts skew the key but
    a partition holds just their id list (a giant 10⁷-page host is
    80 MB), which is why the payload column diet matters.  Returns
    (host, id, host_rank) for the kept rows.
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")

    def narrow(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([url_column, id_column]))
        return (
            pl.DataFrame({"host": extract_hosts(df[url_column]),
                          id_column: df[id_column].cast(pl.Int64)})
            .to_arrow()
            .cast(pa.schema([("host", pa.string()), (id_column, pa.int64())]))
        )

    def rank_and_cap(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part)
            .sort(id_column)
            .with_columns(
                (pl.col(id_column).cum_count().over("host"))
                .cast(pl.Int64).alias("host_rank")
            )
            .filter(pl.col("host_rank") <= k)
            .to_arrow()
            .cast(pa.schema([("host", pa.string()), (id_column, pa.int64()),
                             ("host_rank", pa.int64())]))
        )

    return hash_partition_apply(
        ds.map_batches(narrow, batch_format="pyarrow"),
        ["host"], rank_and_cap, num_partitions=num_partitions,
    )


def url_dedup(ds, url_column: str = "url", id_column: str = "doc_id",
              num_partitions: int = 32):
    """Canonical-URL dedup: one row per canonical url with the winning
    (minimum) id and the duplicate count.

    Scale shape: canonicalize + per-batch partial (min id, count) combiner
    → ONE hash-partition exchange keyed by canonical_url → per-partition
    final (min of mins, sum of counts).  Returns a Dataset with columns
    (canonical_url, first_<id>, n_dups).
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    out_id = f"first_{id_column}"

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([url_column, id_column]))
        canon = canonicalize_urls(df[url_column])
        return (
            pl.DataFrame({"canonical_url": canon,
                          id_column: df[id_column].cast(pl.Int64)})
            .group_by("canonical_url")
            .agg(pl.col(id_column).min().alias("_min"),
                 pl.len().cast(pl.Int64).alias("_cnt"))
            .to_arrow()
            .cast(pa.schema([("canonical_url", pa.string()),
                             ("_min", pa.int64()), ("_cnt", pa.int64())]))
        )

    def final(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part)
            .group_by("canonical_url")
            .agg(pl.col("_min").min().alias(out_id),
                 pl.col("_cnt").sum().alias("n_dups"))
            .to_arrow()
            .cast(pa.schema([("canonical_url", pa.string()),
                             (out_id, pa.int64()), ("n_dups", pa.int64())]))
        )

    return hash_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["canonical_url"], final, num_partitions=num_partitions,
    )


def host_reputation(ds, url_column: str = "url", text_column: str = "text",
                    num_partitions: int = 32):
    """Per-host curation statistics — the host-level reputation signal
    CC-Net-style pipelines threshold on ("drop hosts whose pages are
    mostly junk"): for each host, the page count, total whitespace
    tokens, integer mean tokens per page, and the percent of pages
    passing the quality gate (``text_stats.quality_batch``).  Returns
    ``(host, n_pages, total_tokens, tokens_per_page, ok_pct)``.

    Scale shape: quality + token counting are per-batch vectorized maps;
    a per-batch combiner collapses to one row per (batch, host), so the
    single host-keyed exchange carries combiner partials, never pages —
    the grouped_sum pattern.  Integer division on both stats keeps the
    DuckDB oracle bit-exact.
    """
    import polars as pl

    from docling_translate_ray.functions.text_stats import quality_batch
    from docling_translate_ray.stages.shuffle import grouped_sum

    def partial(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch, text_column)
        df = pl.DataFrame({
            "host": extract_hosts(pl.from_arrow(batch[url_column])),
            "_tok": pl.from_arrow(q["n_tokens"]).cast(pl.Int64),
            "_ok": pl.from_arrow(q["quality_ok"]).cast(pl.Int64),
        })
        return (
            df.group_by("host")
            .agg(pl.len().cast(pl.Int64).alias("_n"),
                 pl.col("_tok").sum(), pl.col("_ok").sum())
            .to_arrow()
            .cast(pa.schema([("host", pa.string()), ("_n", pa.int64()),
                             ("_tok", pa.int64()), ("_ok", pa.int64())]))
        )

    sums = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["host"],
        [pl.col("_n").sum().alias("_n"),
         pl.col("_tok").sum().alias("_tok"),
         pl.col("_ok").sum().alias("_ok")],
        {"n_pages": "_n", "total_tokens": "_tok", "_ok_sum": "_ok"},
        num_partitions=num_partitions,
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.select(
                "host", "n_pages", "total_tokens",
                (pl.col("total_tokens") // pl.col("n_pages"))
                .alias("tokens_per_page"),
                (100 * pl.col("_ok_sum") // pl.col("n_pages"))
                .alias("ok_pct"),
            )
            .to_arrow()
            .cast(pa.schema([("host", pa.string()), ("n_pages", pa.int64()),
                             ("total_tokens", pa.int64()),
                             ("tokens_per_page", pa.int64()),
                             ("ok_pct", pa.int64())]))
        )

    return sums.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL-pattern bitext document alignment (CCAligned / STRAND first stage)

# frozen language-segment set: the corpus's lang_map codes.  Longest
# codes first so both regex engines (rust-regex / RE2) pick identical
# alternation matches; no lookaround anywhere.
URL_LANG_CODES = (
    "zh-TW en ko ja zh fr de es it pt ru ar hi th vi id nl pl tr uk "
    "cs sv da fi el he hu ro bg no"
).split()
_LANG_ALT = "|".join(
    sorted(URL_LANG_CODES, key=len, reverse=True)).replace("-", r"\-")
# a language PATH SEGMENT: '/'+code followed by '/' or end-of-path.
# Greedy leftmost non-overlapping global replace — identical semantics
# in polars (rust-regex) and the DuckDB oracle (RE2): consecutive lang
# segments share the boundary slash, so only the first of a '/en/ko/'
# run is starred (the spec, pinned in tests).
URL_LANG_SEG_RE = "/(" + _LANG_ALT + ")(/|$)"


def url_pair_mine(ds, url_column: str = "url", id_column: str = "doc_id",
                  src_lang: str = "en", num_partitions: int = 32):
    """Mine cross-language document pairs from URL structure — the
    CCAligned (El-Kishky et al. 2020) / STRAND (Resnik 1999) first
    stage: two URLs that differ ONLY in a language path segment very
    likely hold the same content in two languages.

    Spec (the oracle mirrors it regex-for-regex):

    * ``site_key`` = url with every language segment replaced by
      ``/*`` (keeping the boundary), global leftmost replace;
    * ``url_lang`` = the FIRST language segment in the url (NULL when
      none — such urls can never pair);
    * one representative per (site_key, lang): the MINIMUM id (keeps
      the pairing linear in keys — never quadratic in documents);
    * output one row per (site_key, target-language representative)
      where the key also has a ``src_lang`` representative:
      ``(site_key, src_id, tgt_id, tgt_lang)``.

    Scale shape: vectorized regex kernels per batch + a per-batch
    min-id combiner, then ONE exchange keyed on ``site_key`` alone —
    the (key, lang) minimization and the src×tgt pairing are both
    key-local.  Payload: one short key + code + int per (batch, key,
    lang).  The text never moves; downstream feeds the id pairs to
    ``gale_church_align`` after a semi-join fetch.
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    out_schema = pa.schema([
        ("site_key", pa.string()),
        ("src_id", pa.int64()),
        ("tgt_id", pa.int64()),
        ("tgt_lang", pa.string()),
    ])

    def combiner(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch.select([id_column, url_column]))
            .rename({id_column: "_id", url_column: "_u"})
            .with_columns(pl.col("_id").cast(pl.Int64),
                          pl.col("_u").fill_null(""))
            .with_columns(
                pl.col("_u").str.replace_all(URL_LANG_SEG_RE, "/*${2}")
                .alias("site_key"),
                pl.col("_u").str.extract(URL_LANG_SEG_RE, 1)
                .alias("url_lang"),
            )
            .filter(pl.col("url_lang").is_not_null())
            .group_by(["site_key", "url_lang"])
            .agg(pl.col("_id").min().alias("rep"))
        )
        return df.to_arrow().cast(pa.schema(
            [("site_key", pa.string()), ("url_lang", pa.string()),
             ("rep", pa.int64())]))

    def pair_block(part: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(part)
            .group_by(["site_key", "url_lang"])
            .agg(pl.col("rep").min())
        )
        src = (df.filter(pl.col("url_lang") == src_lang)
               .select("site_key", pl.col("rep").alias("src_id")))
        tgt = (df.filter(pl.col("url_lang") != src_lang)
               .select("site_key", pl.col("rep").alias("tgt_id"),
                       pl.col("url_lang").alias("tgt_lang")))
        return (
            src.join(tgt, on="site_key", how="inner")
            .select(["site_key", "src_id", "tgt_id", "tgt_lang"])
            .to_arrow().cast(out_schema)
        )

    return hash_partition_apply(
        ds.select_columns([id_column, url_column]).map_batches(
            combiner, batch_format="pyarrow"),
        ["site_key"], pair_block, num_partitions=num_partitions)
