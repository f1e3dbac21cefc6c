"""Content-based mirror detection + URL-pattern crawl-trap detection.

Two crawl-operations operators over the page table that the link-graph
family (host_components / host_reputation) cannot express, because
their evidence is CONTENT and URL SHAPE, not links:

* :func:`mirror_hosts` — host pairs serving the same content (mirrors,
  scraped clones, CDN-renamed sites).  Evidence: the number of distinct
  content fingerprints two hosts share, relative to the smaller host's
  corpus.  Mirror collapse runs BEFORE dedup picks per-document
  winners, so a whole cloned site costs one host-level decision instead
  of millions of per-page ones.
* :func:`url_pattern_traps` — (host, path-pattern) groups whose page
  count explodes (calendar pages, faceted search, session ids): the
  classic crawl-trap signal.  Pattern = the url path with every digit
  run collapsed to ``N`` — ``/2024/03/15/`` and ``/2019/01/02/`` are
  the same trap.

Scale shapes:

* mirror_hosts: pages collapse to narrow ``(fp, host)`` rows in-batch
  (the fingerprint is md5 in oracle mode / xx64 in production — the
  crawl.py convention) → global DISTINCT → per-fp host lists via ONE
  fp-keyed exchange, where a HOST-CAP drops fps shared by more than
  ``max_hosts_per_fp`` hosts before pair expansion (a fp on 10⁴ hosts
  is boilerplate, not mirror evidence, and would emit 10⁸ pairs —
  the cap is the skew fence and is part of the frozen spec) → pair
  counts and per-host totals merge through grouped_sum exchanges →
  overlap percent gates the output.  Page text never crosses any
  exchange.
* url_pattern_traps: one vectorized regex pass per batch → one
  (host, pattern)-keyed grouped_sum → threshold filter.  Nothing else.
"""

from __future__ import annotations

import pyarrow as pa

MAX_HOSTS_PER_FP = 16   # frozen skew fence (see module docstring)


def _host_fp_rows(batch: pa.Table, url_column: str, content_column: str,
                  algo: str) -> pa.Table:
    import polars as pl

    from docling_translate_ray.functions.crawl import _fingerprint_batch
    from docling_translate_ray.functions.urltools import extract_hosts

    fp = _fingerprint_batch(batch, url_column, content_column, 0, algo)
    host = extract_hosts(
        pl.Series("u", batch[url_column]).cast(pl.String)
    ).to_arrow().cast(pa.string())
    return pa.table({"fp": fp["md5"], "host": host})


def mirror_hosts(ds, url_column: str = "url", content_column: str = "text",
                 min_shared: int = 3, min_pct: int = 50,
                 max_hosts_per_fp: int = MAX_HOSTS_PER_FP,
                 num_partitions: int = 32, algo: str = "md5"):
    """Host pairs ``(host_a, host_b, shared, pct)`` with ``host_a <
    host_b`` (string order), ``shared`` = distinct content fingerprints
    on both hosts (fps on > ``max_hosts_per_fp`` hosts excluded —
    boilerplate fence), ``pct = 100 * shared // min(|A|, |B|)`` where
    ``|H|`` counts the host's distinct fingerprints; rows pass when
    ``shared ≥ min_shared`` and ``pct ≥ min_pct``."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import (
        distinct,
        grouped_sum,
        hash_partition_apply,
        partition_join,
    )

    pairs_src = distinct(
        ds.map_batches(
            lambda b: _host_fp_rows(b, url_column, content_column, algo),
            batch_format="pyarrow"),
        ["fp", "host"], num_partitions=num_partitions)

    # per-host distinct-fp totals (narrow; reused by the pct gate)
    totals = grouped_sum(
        pairs_src, ["host"],
        [pl.len().cast(pl.Int64).alias("_n")],
        {"n_fps": "_n"}, num_partitions=num_partitions)

    def expand_pairs(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part).sort(["fp", "host"])
        # cap BEFORE pair expansion: fps on too many hosts drop whole
        df = df.filter(
            (pl.len().over("fp") <= max_hosts_per_fp)
            & (pl.len().over("fp") >= 2))
        a = df.rename({"host": "host_a"})
        b = df.rename({"host": "host_b"})
        out = (
            a.join(b, on="fp")
            .filter(pl.col("host_a") < pl.col("host_b"))
            .group_by(["host_a", "host_b"])
            .agg(pl.len().cast(pl.Int64).alias("shared"))
        )
        return out.to_arrow().cast(pa.schema([
            ("host_a", pa.string()), ("host_b", pa.string()),
            ("shared", pa.int64())]))

    # rows of one fp are co-partitioned; partials merge below
    partial_pairs = hash_partition_apply(
        pairs_src, ["fp"], expand_pairs,
        num_partitions=num_partitions, label="fp:mirror_pairs")
    pair_counts = grouped_sum(
        partial_pairs, ["host_a", "host_b"],
        [pl.col("shared").sum().alias("_s")],
        {"shared": "_s"}, num_partitions=num_partitions)

    # attach |A| and |B| (totals are host-cardinality small; the
    # partition_join keeps it distributed anyway), then the pct gate
    with_a = partition_join(
        pair_counts.map_batches(
            lambda b: b.rename_columns(["host", "host_b", "shared"]),
            batch_format="pyarrow"),
        totals.map_batches(
            lambda b: b.rename_columns(["host", "n_a"]),
            batch_format="pyarrow"),
        on=["host"], how="left", num_partitions=num_partitions)
    with_b = partition_join(
        with_a.map_batches(
            lambda b: pa.table({
                "host_a": b["host"], "host": b["host_b"],
                "shared": b["shared"], "n_a": b["n_a"]}),
            batch_format="pyarrow"),
        totals.map_batches(
            lambda b: b.rename_columns(["host", "n_b"]),
            batch_format="pyarrow"),
        on=["host"], how="left", num_partitions=num_partitions)

    def gate(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        out = (
            df.with_columns(
                (100 * pl.col("shared")
                 // pl.min_horizontal("n_a", "n_b")).alias("pct"))
            .filter((pl.col("shared") >= min_shared)
                    & (pl.col("pct") >= min_pct))
            .select(pl.col("host_a"),
                    pl.col("host").alias("host_b"),
                    pl.col("shared"), pl.col("pct"))
            .sort(["host_a", "host_b"])
        )
        return out.to_arrow().cast(pa.schema([
            ("host_a", pa.string()), ("host_b", pa.string()),
            ("shared", pa.int64()), ("pct", pa.int64())]))

    return with_b.map_batches(gate, batch_format="pyarrow")


# url path pattern: strip scheme+host, drop query/fragment, digit runs → N
_PAT_STRIP_QF = r"[?#].*$"
_PAT_HOSTLESS = r"^[a-z][a-z0-9+.-]*://[^/]*"
_PAT_DIGITS = r"[0-9]+"


def url_pattern_traps(ds, url_column: str = "url",
                      min_pages: int = 100, num_partitions: int = 32):
    """(host, pattern, n_pages) groups with ``n_pages ≥ min_pages`` —
    the crawl-trap candidates a frontier should rate-limit.  Pattern =
    url path, query/fragment dropped, every digit run replaced by
    ``N``.  One vectorized pass + one narrow keyed exchange."""
    import polars as pl

    from docling_translate_ray.functions.urltools import extract_hosts

    def to_rows(batch: pa.Table) -> pa.Table:
        u = pl.Series("u", batch[url_column]).cast(pl.String).fill_null("")
        host = extract_hosts(u)
        pattern = (u.str.replace(_PAT_STRIP_QF, "")
                   .str.replace(_PAT_HOSTLESS, "")
                   .str.replace_all(_PAT_DIGITS, "N"))
        df = pl.DataFrame({"host": host, "pattern": pattern})
        return df.to_arrow().cast(pa.schema([
            ("host", pa.string()), ("pattern", pa.string())]))

    from docling_translate_ray.stages.shuffle import grouped_sum

    counts = grouped_sum(
        ds.select_columns([url_column]).map_batches(
            to_rows, batch_format="pyarrow"),
        ["host", "pattern"],
        [pl.len().cast(pl.Int64).alias("_n")],
        {"n_pages": "_n"}, num_partitions=num_partitions)

    import pyarrow.compute as pc

    return counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_pages"], min_pages)),
        batch_format="pyarrow")
