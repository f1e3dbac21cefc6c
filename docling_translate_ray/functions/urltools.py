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
