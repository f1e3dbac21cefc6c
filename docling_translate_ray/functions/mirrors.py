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
  crawl.py convention, with a local-unique combiner) → ONE fp-keyed
  exchange whose block enforces global uniqueness (fps co-located),
  applies the HOST-CAP — fps shared by more than ``max_hosts_per_fp``
  hosts drop before pair expansion (a fp on 10⁴ hosts is boilerplate,
  not mirror evidence, and would emit 10⁸ pairs; the cap is the skew
  fence and part of the frozen spec) — and emits BOTH pair partials
  and per-host fp-total partials → ONE merge exchange keyed
  (kind, host_a, host_b) → the merged table (pair+host cardinality,
  ≪ pages) materializes once and the totals attach broadcast-or-
  exchange (``ray.put`` under ``max_broadcast_hosts``, two host-keyed
  partition_joins past it).  Two exchanges total on the corpus-sized
  path; page text never crosses any exchange; no dataset is consumed
  twice upstream of the materialize (a second consumer re-executes
  lineage — measured 17.7 s → 3 s at sf0.1 when the first cut of this
  operator consumed the distinct output twice).
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
                 num_partitions: int = 32, algo: str = "md5",
                 max_broadcast_hosts: int = 5_000_000):
    """Host pairs ``(host_a, host_b, shared, pct)`` with ``host_a <
    host_b`` (string order), ``shared`` = distinct content fingerprints
    on both hosts (fps on > ``max_hosts_per_fp`` hosts excluded —
    boilerplate fence), ``pct = 100 * shared // min(|A|, |B|)`` where
    ``|H|`` counts the host's distinct fingerprints; rows pass when
    ``shared ≥ min_shared`` and ``pct ≥ min_pct``."""
    import polars as pl

    import ray

    from docling_translate_ray.stages.shuffle import (
        grouped_sum,
        hash_partition_apply,
        partition_join,
    )

    # per-batch (fp, host) rows with a local-unique combiner (the
    # distinct() combiner inlined — global uniqueness is enforced
    # inside the fp-keyed exchange below, so no separate DISTINCT
    # exchange and no second consumer re-executing the scan)
    def rows_fn(b: pa.Table) -> pa.Table:
        t = _host_fp_rows(b, url_column, content_column, algo)
        return pl.from_arrow(t).unique(keep="any").to_arrow().cast(t.schema)

    rows = ds.map_batches(rows_fn, batch_format="pyarrow")

    _PARTIAL_SCHEMA = pa.schema([
        ("kind", pa.int8()),       # 0 = pair partial, 1 = host total
        ("host_a", pa.string()),
        ("host_b", pa.string()),   # "" on total rows
        ("n", pa.int64()),
    ])

    def fp_block(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part).unique(keep="any")  # global (fp co-located)
        # host-total partials: this partition's distinct fps per host
        totals = (
            df.group_by("host").agg(pl.len().cast(pl.Int64).alias("n"))
            .select(pl.lit(1, dtype=pl.Int8).alias("kind"),
                    pl.col("host").alias("host_a"),
                    pl.lit("").alias("host_b"), pl.col("n"))
        )
        # cap BEFORE pair expansion: fps on too many hosts drop whole
        capped = df.filter(
            (pl.len().over("fp") <= max_hosts_per_fp)
            & (pl.len().over("fp") >= 2))
        pairs = (
            capped.rename({"host": "host_a"})
            .join(capped.rename({"host": "host_b"}), on="fp")
            .filter(pl.col("host_a") < pl.col("host_b"))
            .group_by(["host_a", "host_b"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select(pl.lit(0, dtype=pl.Int8).alias("kind"),
                    pl.col("host_a"), pl.col("host_b"), pl.col("n"))
        )
        return pl.concat([pairs, totals]).to_arrow().cast(_PARTIAL_SCHEMA)

    partials = hash_partition_apply(
        rows, ["fp"], fp_block,
        num_partitions=num_partitions, label="fp:mirror_pairs")

    # ONE merge exchange for pair counts AND host totals (total rows
    # ride the same keyed exchange under host_b=""), then materialize —
    # the merged table is pair+host-cardinality sized (≪ pages) and is
    # read twice below (totals, then the gate)
    merged = grouped_sum(
        partials, ["kind", "host_a", "host_b"],
        [pl.col("n").sum().alias("_n")],
        {"n": "_n"}, num_partitions=num_partitions).materialize()

    import pyarrow.compute as pc

    totals_ds = merged.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 1)).select(["host_a", "n"])
        .rename_columns(["host", "n_fps"]),
        batch_format="pyarrow")
    pair_ds = merged.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0))
        .select(["host_a", "host_b", "n"]),
        batch_format="pyarrow")

    out_schema = pa.schema([
        ("host_a", pa.string()), ("host_b", pa.string()),
        ("shared", pa.int64()), ("pct", pa.int64())])

    def gate(df: "pl.DataFrame") -> pa.Table:
        return (
            df.with_columns(
                (100 * pl.col("n")
                 // pl.min_horizontal("n_a", "n_b")).alias("pct"))
            .filter((pl.col("n") >= min_shared)
                    & (pl.col("pct") >= min_pct))
            .select(pl.col("host_a"), pl.col("host_b"),
                    pl.col("n").alias("shared"), pl.col("pct"))
            .to_arrow().cast(out_schema)
        )

    # broadcast-or-exchange totals attach (the repo convention): the
    # totals table is host-cardinality sized; under the budget it ships
    # once via ray.put and the gate is a zero-shuffle map, else two
    # host-keyed partition_joins keep it fully distributed
    n_hosts = totals_ds.count()
    if n_hosts <= max_broadcast_hosts:
        from docling_translate_ray.util import collect_to_table

        tot_ref = ray.put(collect_to_table(
            totals_ds, empty_schema=pa.schema(
                [("host", pa.string()), ("n_fps", pa.int64())])))

        def gate_bcast(batch: pa.Table) -> pa.Table:
            import ray as _ray

            tot = pl.from_arrow(_ray.get(tot_ref))
            df = (
                pl.from_arrow(batch)
                .join(tot.rename({"host": "host_a", "n_fps": "n_a"}),
                      on="host_a", how="left")
                .join(tot.rename({"host": "host_b", "n_fps": "n_b"}),
                      on="host_b", how="left")
            )
            return gate(df)

        return pair_ds.map_batches(gate_bcast, batch_format="pyarrow")

    with_a = partition_join(
        pair_ds.map_batches(
            lambda b: b.rename_columns(["host", "host_b", "n"]),
            batch_format="pyarrow"),
        totals_ds.map_batches(
            lambda b: b.rename_columns(["host", "n_a"]),
            batch_format="pyarrow"),
        on=["host"], how="left", num_partitions=num_partitions)
    with_b = partition_join(
        with_a.map_batches(
            lambda b: pa.table({
                "host_a": b["host"], "host": b["host_b"],
                "n": b["n"], "n_a": b["n_a"]}),
            batch_format="pyarrow"),
        totals_ds.map_batches(
            lambda b: b.rename_columns(["host", "n_b"]),
            batch_format="pyarrow"),
        on=["host"], how="left", num_partitions=num_partitions)

    return with_b.map_batches(
        lambda b: gate(pl.from_arrow(b).rename({"host": "host_b"})),
        batch_format="pyarrow")


# url path pattern: strip scheme+host, drop query/fragment, digit runs → N
_PAT_STRIP_QF = r"[?#].*$"
_PAT_HOSTLESS = r"(?i)^[a-z][a-z0-9+.-]*://[^/]*"  # (?i): 'HTTPS://Host/…'
# must strip like 'https://host/…' or (host, pattern) groups fragment
# against the lowercased extract_hosts output
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
