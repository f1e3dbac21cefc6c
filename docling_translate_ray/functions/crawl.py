"""Cross-snapshot crawl operators: what changed between two crawls, and
which page version is current.

A Common-Crawl-style pipeline re-crawls the web continuously; downstream
work (extraction, dedup, indexing — cf. :mod:`..pipelines.extract`,
:func:`..functions.dedup.minhash_index_probe`) should touch only the pages
that are NEW or CHANGED since the last processed snapshot, and "the
corpus" at any moment is the LATEST version of each url.  Both operators
here are single-exchange plans over narrow rows:

* :func:`snapshot_diff` — classify urls into added / removed / changed
  between two snapshots.  Each side is reduced per batch to
  ``(url, md5)`` (16-byte fingerprint — page bytes never shuffle), the
  tagged union makes ONE hash exchange on url, and each partition
  classifies locally.  At 10^12 urls the exchange carries ~50 bytes/url —
  the minimum any content-compare diff can move.
* :func:`latest_page_version` — per-url argmax over the crawl timestamp
  (combiner-first: each batch keeps its local winner per url, so the
  exchange moves one row per (batch, url), then partitions pick the global
  winner).  Skew note: a url appears once per SNAPSHOT, not once per page,
  so per-key cardinality is bounded by the snapshot count — no salting
  needed.

Beyond-reference operators (the reference processes one upload at a time;
it has no notion of snapshots — SURVEY.md §2 O5 family).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_DIFF_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("change", pa.string()),
    ("old_md5", pa.string()),
    ("new_md5", pa.string()),
])


def _fingerprint_batch(batch: pa.Table, url_column: str, content_column: str,
                       side: int, algo: str = "md5") -> pa.Table:
    if algo == "md5":  # oracle-lockstep mode (DuckDB md5() recomputes it)
        vals = batch[content_column].to_pylist()
        fp = [hashlib.md5(
            v if isinstance(v, (bytes, bytearray)) else (v or "").encode()
        ).hexdigest() for v in vals]
        fp_arr = pa.array(fp, pa.string())
    else:  # "xx64": vectorized polars hash — for equality-compare only
        import polars as pl

        col = batch[content_column]
        s = pl.Series("c", col)
        if s.dtype == pl.Null:
            s = pl.Series("c", [""] * batch.num_rows, dtype=pl.String)
        fill = b"" if s.dtype == pl.Binary else ""
        fp_arr = s.fill_null(fill).hash(seed=3).cast(pl.String).to_arrow() \
            .cast(pa.string())
    return pa.table({
        "url": batch[url_column].cast(pa.string()),
        "md5": fp_arr,
        "side": pa.array([side] * batch.num_rows, pa.int8()),
    })


def _classify_partition(part: pa.Table) -> pa.Table:
    import polars as pl

    df = pl.from_arrow(part)
    old = (df.filter(pl.col("side") == 0)
           .select("url", pl.col("md5").alias("old_md5")))
    new = (df.filter(pl.col("side") == 1)
           .select("url", pl.col("md5").alias("new_md5")))
    both = old.join(new, on="url", how="full", coalesce=True).with_columns(
        pl.when(pl.col("old_md5").is_null())
        .then(pl.lit("added"))
        .when(pl.col("new_md5").is_null())
        .then(pl.lit("removed"))
        .when(pl.col("old_md5") != pl.col("new_md5"))
        .then(pl.lit("changed"))
        .otherwise(pl.lit("unchanged"))
        .alias("change"),
        pl.col("old_md5").fill_null(""),
        pl.col("new_md5").fill_null(""),
    ).filter(pl.col("change") != "unchanged")
    return both.select(["url", "change", "old_md5", "new_md5"]).to_arrow() \
        .cast(_DIFF_SCHEMA)


def snapshot_diff(old_ds, new_ds, url_column: str = "url",
                  content_column: str = "text", algo: str = "md5"):
    """Rows ``(url, change, old_md5, new_md5)`` with change ∈ {added,
    removed, changed}; unchanged urls are dropped (the common case at
    crawl cadence — they never leave the classifying partition).  Absent
    sides carry ``''`` (not null) so value-hash oracles compare exactly.

    ``algo="md5"`` keeps the fingerprint SQL-reproducible (DuckDB
    ``md5()``); ``algo="xx64"`` is the production mode — a vectorized
    polars hash ~30× faster per byte, valid because the diff only ever
    compares fingerprints for equality (a 64-bit collision can only
    misclassify a changed page as unchanged, odds ~2⁻⁶⁴ per page).

    Caller contract: each snapshot has at most one row per url (run
    :func:`..functions.urltools.url_dedup` first — the documented ingest
    order).  A duplicate url within one side would cross-join inside its
    partition; bounded, but the classification of a self-conflicting
    snapshot is not meaningful.
    """
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    return diff_fingerprints(
        old_ds.map_batches(
            lambda b: _fingerprint_batch(b, url_column, content_column, 0,
                                         algo).drop_columns(["side"]),
            batch_format="pyarrow"),
        new_ds.map_batches(
            lambda b: _fingerprint_batch(b, url_column, content_column, 1,
                                         algo).drop_columns(["side"]),
            batch_format="pyarrow"),
    )


def diff_fingerprints(old_fp_ds, new_fp_ds):
    """:func:`snapshot_diff` over PRECOMPUTED ``(url, md5)`` fingerprint
    tables — the incremental job's cached path: when snapshot N−1's
    fingerprints were persisted, diffing snapshot N costs one read of N's
    pages plus a ~50-byte/url exchange; the N−1 crawl is never reopened."""
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch["url"], "md5": batch["md5"],
                "side": pa.array([side] * batch.num_rows, pa.int8()),
            })

        return fn

    tagged = old_fp_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_fp_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    return hash_partition_apply(tagged, ["url"], _classify_partition)


def latest_page_version(ds, url_column: str = "url", ts_column: str = "warc_ts",
                        tiebreak: list[str] | None = None):
    """Keep the most recent version of every url (argmax over the crawl
    timestamp), carrying ALL other columns of the winning row.

    Determinism: ties on the timestamp break by ``tiebreak`` columns
    descending (default: every remaining column, in schema order) — the
    winner is a pure function of the row set, never of block order.
    """

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def local_winner(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return batch
        df = pl.from_arrow(batch)
        tb = tiebreak if tiebreak is not None else [
            c for c in df.columns if c not in (url_column, ts_column)
        ]
        return (
            df.sort([ts_column, *tb], descending=True, maintain_order=True)
            .unique(subset=[url_column], keep="first", maintain_order=True)
            .to_arrow()
        )

    combined = ds.map_batches(local_winner, batch_format="pyarrow")
    return hash_partition_apply(combined, [url_column], local_winner)


def host_template_lines(ds, url_column: str = "url", column: str = "text",
                        id_column: str = "doc_id", min_docs: int = 3,
                        num_partitions: int = 32):
    """Site-template boilerplate removal — the host-scoped line dedup
    (trafilatura's global-context pass / CC-Net's per-site filters): a
    line occurring in ≥ ``min_docs`` distinct documents of the SAME host
    is template (nav, footer, cookie banner) and is dropped from that
    host's documents — the identical line on another host where it is
    rare survives, which the global :func:`..functions.dedup.line_dedup`
    cannot express.

    TWO exchanges (the dup_span_mask collapse): line rows hash-partition
    by ``(host, line)`` — every occurrence of a host's line co-locates, so
    distinct-doc counting, the template filter and the subtraction are one
    partition-local polars pass — then survivors reassemble keyed by the
    doc id.  Output: ``(id, host, text_cleaned, n_lines_kept)``; documents
    whose every line was template are omitted.
    """
    import polars as pl

    from docling_translate_ray.functions.urltools import extract_hosts
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def explode_lines(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            id_column: pl.Series(batch[id_column].to_pylist(), dtype=pl.Int64),
            url_column: pl.Series(batch[url_column].to_pylist(),
                                  dtype=pl.String),
            column: pl.Series(batch[column].to_pylist(),
                              dtype=pl.String).fill_null(""),
        }).filter(pl.col(column).str.strip_chars() != "")
        df = df.with_columns(extract_hosts(df[url_column]).alias("host"))
        return (
            df.with_columns(pl.col(column).str.split("\n").alias("_lines"))
            .explode("_lines")
            .with_columns(
                pl.int_range(1, pl.len() + 1).over(id_column).alias("line_no")
            )
            .select(
                pl.col(id_column), pl.col("host"),
                pl.col("line_no").cast(pl.Int64),
                pl.col("_lines").alias("line"),
            )
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()), ("host", pa.string()),
                             ("line_no", pa.int64()), ("line", pa.string())]))
        )

    def drop_template(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part)
        tmpl = (
            df.select(["host", "line", id_column]).unique()
            .group_by(["host", "line"]).len(name="_nd")
            .filter(pl.col("_nd") >= min_docs)
            .select(["host", "line"])
        )
        return df.join(tmpl, on=["host", "line"], how="anti").to_arrow()

    kept = hash_partition_apply(
        ds.select_columns([id_column, url_column, column]).map_batches(
            explode_lines, batch_format="pyarrow"),
        ["host", "line"], drop_template, num_partitions=num_partitions,
    )

    def reassemble(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part)
            .sort([id_column, "line_no"])
            .group_by([id_column, "host"], maintain_order=True)
            .agg(
                pl.col("line").str.join("\n").alias("text_cleaned"),
                pl.len().cast(pl.Int64).alias("n_lines_kept"),
            )
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()), ("host", pa.string()),
                             ("text_cleaned", pa.string()),
                             ("n_lines_kept", pa.int64())]))
        )

    return hash_partition_apply(kept, [id_column], reassemble,
                                num_partitions=num_partitions)


def frontier_schedule(ds, k_per_cycle: int = 4, url_column: str = "url",
                      priority_column: str = "priority",
                      num_partitions: int = 32,
                      k_column: str | None = None):
    """Politeness-aware crawl-frontier scheduling — the fetch-planner
    step of a web crawler (Heritrix/Nutch "queue per host, k fetches per
    politeness cycle"): each host serves at most ``k_per_cycle`` urls per
    cycle; within a host, higher priority goes first (ties → url
    ascending), so a url's cycle is ``(host_rank - 1) // k + 1``.

    ``k_column``: name of a per-ROW k override (constant within a host —
    e.g. derived from the host's robots ``Crawl-delay`` via
    :func:`parse_crawl_delay`); rows where it is null fall back to
    ``k_per_cycle``.  Returns ``(url, host, priority, cycle)``.

    Scale shape: ONE exchange keyed by host carrying (url, host,
    priority[, k]) — the page content never moves; per-partition work is
    a vectorized sort + windowed cum-count (the domain_cap kernel,
    assigning cycles instead of truncating at k).  Host is inherently
    skewed, but a partition holds only the hot host's narrow url rows.
    """
    import polars as pl

    from docling_translate_ray.functions.urltools import extract_hosts
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    if k_per_cycle <= 0:
        raise ValueError(f"k_per_cycle must be positive (got {k_per_cycle})")

    out_schema = pa.schema([("url", pa.string()), ("host", pa.string()),
                            ("priority", pa.int64()), ("cycle", pa.int64())])
    mid_schema = pa.schema([("url", pa.string()), ("host", pa.string()),
                            ("priority", pa.int64()), ("_k", pa.int64())])

    def narrow(batch: pa.Table) -> pa.Table:
        cols = [url_column, priority_column] + (
            [k_column] if k_column is not None else [])
        df = pl.from_arrow(batch.select(cols))
        k = (df[k_column].cast(pl.Int64) if k_column is not None
             else pl.Series("_k", [None] * df.height, dtype=pl.Int64))
        return (
            pl.DataFrame({
                "url": df[url_column],
                "host": extract_hosts(df[url_column]),
                "priority": df[priority_column].cast(pl.Int64),
                "_k": k.fill_null(k_per_cycle).clip(lower_bound=1),
            })
            .to_arrow()
            .cast(mid_schema)
        )

    def schedule(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        return (
            pl.from_arrow(part)
            .sort(["priority", "url"], descending=[True, False])
            .with_columns(
                ((pl.col("url").cum_count().over("host").cast(pl.Int64) - 1)
                 // pl.col("_k") + 1).alias("cycle"))
            .select(["url", "host", "priority", "cycle"])
            .to_arrow().cast(out_schema)
        )

    return hash_partition_apply(
        ds.map_batches(narrow, batch_format="pyarrow"),
        ["host"], schedule, num_partitions=num_partitions,
    )


def _change_rates(df):
    """Per-url change rates from a polars frame of (url, _ts, _fp)
    version rows — the shared kernel of :func:`recrawl_priority` and the
    fused url-pass of ``pipelines/crawl_cycle``.  Returns a frame
    (url, n_versions, n_changes, change_rate_pct)."""
    import polars as pl

    return (
        df.sort(["url", "_ts"])
        .with_columns(
            (pl.col("_fp") != pl.col("_fp").shift(1)).over("url")
            .fill_null(False).cast(pl.Int64).alias("_chg"))
        .group_by("url")
        .agg(pl.len().cast(pl.Int64).alias("n_versions"),
             pl.col("_chg").sum().alias("n_changes"))
        .with_columns(
            pl.when(pl.col("n_versions") > 1)
            .then(100 * pl.col("n_changes") // (pl.col("n_versions") - 1))
            .otherwise(0).cast(pl.Int64).alias("change_rate_pct"))
    )


def history_fp_rows(url_column: str, ts_column: str, content_column: str,
                    algo: str):
    """map_batches body factory: collapse version rows to the narrow
    (url, _ts, _fp) shape the change-rate exchange carries."""

    def narrow(batch: pa.Table) -> pa.Table:
        fp = _fingerprint_batch(batch, url_column, content_column, 0, algo)
        return pa.table({
            "url": fp["url"],
            "_ts": batch[ts_column],
            "_fp": fp["md5"],
        })

    return narrow


def recrawl_priority(ds, url_column: str = "url", ts_column: str = "warc_ts",
                     content_column: str = "text",
                     num_partitions: int = 32, algo: str = "md5"):
    """Per-URL change-rate estimation from crawl history — the signal an
    adaptive recrawl scheduler feeds on (pages that changed between past
    fetches get refetched sooner; Cho & Garcia-Molina's frequency
    estimation, reduced to its deterministic integer core): fingerprint
    every stored version, count CONSECUTIVE-version changes in
    ``ts_column`` order, and report
    ``change_rate_pct = 100 * n_changes // (n_versions - 1)`` (0 for a
    single-version url).  Returns
    ``(url, n_versions, n_changes, change_rate_pct)``.

    Scale shape: content collapses to a fingerprint inside the batch
    (``algo="md5"`` for oracle lockstep, ``"xx64"`` for the cheaper
    vectorized hash — change counting only needs equality), so the ONE
    url-keyed exchange carries (url, ts, hash) and page bodies never
    move; per-partition work is a vectorized sort + lag-compare.
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    out_schema = pa.schema([
        ("url", pa.string()), ("n_versions", pa.int64()),
        ("n_changes", pa.int64()), ("change_rate_pct", pa.int64()),
    ])

    def rate_block(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        return _change_rates(pl.from_arrow(part)).to_arrow().cast(out_schema)

    return hash_partition_apply(
        ds.map_batches(
            history_fp_rows(url_column, ts_column, content_column, algo),
            batch_format="pyarrow"),
        ["url"], rate_block, num_partitions=num_partitions,
    )


def parse_robots(txt: str, agent: str = "*") -> list[str]:
    """Disallow prefixes applying to ``agent`` from one robots.txt body
    (the classic REP subset: line-based ``User-agent`` groups,
    ``Disallow`` path prefixes; field names case-insensitive; ``#``
    comments stripped; an empty Disallow allows everything; ``Allow``
    precedence and wildcards are out of scope and documented so).
    Group precedence follows REP: a named agent obeys ONLY the groups
    naming it when any exist, and falls back to the ``*`` groups
    otherwise — the two never merge."""
    groups = _robots_groups(txt, agent)
    return [p for _, ps, _ in groups for p in ps]


def parse_crawl_delay(txt: str, agent: str = "*") -> int | None:
    """``Crawl-delay`` seconds applying to ``agent`` (same group
    precedence as :func:`parse_robots`); the LARGEST delay across the
    applying groups wins (the conservative read); ``None`` when no
    applying group sets one.  Fractional values round up; malformed
    values are ignored."""
    delays = [d for _, _, d in _robots_groups(txt, agent) if d is not None]
    return max(delays) if delays else None


def _robots_groups(txt: str, agent: str):
    """The robots.txt groups applying to ``agent`` after REP precedence:
    ``[(agents, disallow_prefixes, crawl_delay | None), ...]``."""
    import math

    groups: list[list] = []  # [agents, prefixes, delay]
    cur: list | None = None
    last_was_agent = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, sep, value = line.partition(":")
        if not sep:
            continue
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent:
                cur = [set(), [], None]  # a new group starts
                groups.append(cur)
            cur[0].add(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue
        if field == "disallow" and value:
            cur[1].append(value)
        elif field == "crawl-delay":
            try:
                cur[2] = max(1, math.ceil(float(value)))
            except ValueError:
                pass
    a = agent.lower()
    if a != "*" and any(a in g[0] for g in groups):
        return [tuple(g) for g in groups if a in g[0]]
    return [tuple(g) for g in groups if "*" in g[0]]


def robots_filter(pages_ds, robots_ds, url_column: str = "url",
                  agent: str = "*"):
    """Crawl-policy gate: drop pages whose URL path matches any
    ``Disallow`` prefix of their host's robots.txt.  Returns the KEPT
    rows as ``(url, host)``.

    Scale shape: the rules side is one row per host (tiny by web
    construction — hosts ≪ pages); it is parsed and collected once,
    broadcast via ``ray.put``, and every page batch applies a vectorized
    polars join + ``starts_with`` — ZERO shuffle on the page side, the
    bloom-blocklist pattern with prefix semantics.
    """
    import ray

    import polars as pl

    from docling_translate_ray.functions.urltools import extract_hosts
    from docling_translate_ray.util import collect_to_table

    def explode_rules(batch: pa.Table) -> pa.Table:
        hosts, prefs = [], []
        for h, txt in zip(batch["host"].to_pylist(),
                          batch["robots_txt"].to_pylist()):
            for p in parse_robots(txt or "", agent=agent):
                hosts.append(h or "")
                prefs.append(p)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "prefix": pa.array(prefs, pa.string())})

    rules = collect_to_table(
        robots_ds.map_batches(explode_rules, batch_format="pyarrow"),
        empty_schema=pa.schema([("host", pa.string()),
                                ("prefix", pa.string())]),
    )
    rules_ref = ray.put(rules)

    out_schema = pa.schema([("url", pa.string()), ("host", pa.string())])

    def keep_allowed(batch: pa.Table) -> pa.Table:
        import ray as _ray

        r = pl.from_arrow(_ray.get(rules_ref))
        u = pl.from_arrow(batch.select([url_column]))[url_column]
        df = (
            pl.DataFrame({"url": u, "host": extract_hosts(u)})
            .with_row_index("_i")
            .with_columns(
                pl.col("url").str.replace(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
                .str.replace(r"[?#].*$", "")
                .alias("_path"))
        )
        if r.height == 0:
            return df.select(["url", "host"]).to_arrow().cast(out_schema)
        hit = (
            df.join(r, on="host", how="inner")
            .filter(pl.col("_path").str.starts_with(pl.col("prefix")))
            .select("_i").unique()
        )
        return (
            df.join(hit, on="_i", how="anti")
            .select(["url", "host"])
            .to_arrow().cast(out_schema)
        )

    return pages_ds.map_batches(keep_allowed, batch_format="pyarrow")


import re as _re2

_SITEMAP_BLOCK_RE = _re2.compile(r"<url\b[^>]*>(.*?)</url>",
                                 _re2.IGNORECASE | _re2.DOTALL)
_SITEMAP_LOC_RE = _re2.compile(r"<loc\s*>\s*(.*?)\s*</loc>",
                               _re2.IGNORECASE | _re2.DOTALL)
_SITEMAP_LASTMOD_RE = _re2.compile(r"<lastmod\s*>\s*(.*?)\s*</lastmod>",
                                   _re2.IGNORECASE | _re2.DOTALL)


def parse_sitemap(xml: str) -> list[tuple[str, str]]:
    """``(loc, lastmod)`` pairs from one sitemap body — the
    sitemaps.org urlset subset (``<url><loc>…</loc><lastmod>…</lastmod>
    </url>`` blocks; lastmod "" when absent; a ``<url>`` without a
    ``<loc>`` contributes nothing; index files / namespaces are just
    text to this regex subset and yield their nested ``<loc>`` only
    inside ``<url>`` blocks)."""
    out: list[tuple[str, str]] = []
    for m in _SITEMAP_BLOCK_RE.finditer(xml or ""):
        block = m.group(1)
        loc = _SITEMAP_LOC_RE.search(block)
        if not loc or not loc.group(1):
            continue
        lm = _SITEMAP_LASTMOD_RE.search(block)
        out.append((loc.group(1), lm.group(1) if lm else ""))
    return out


def sitemap_seeds(ds, host_column: str = "host",
                  xml_column: str = "sitemap_xml"):
    """Explode per-host sitemap documents into frontier seed rows
    ``(host, url, lastmod)`` — the third crawl-discovery surface next to
    :func:`..graph.extract_links` (in-page) and the snapshot history
    (re-crawl).  Pure per-batch parser map, no shuffle; feed the output
    to :func:`frontier_schedule` (after a :func:`robots_filter` gate)
    to plan the fetches."""

    def explode(batch: pa.Table) -> pa.Table:
        hosts, urls, mods = [], [], []
        for h, xml in zip(batch[host_column].to_pylist(),
                          batch[xml_column].to_pylist()):
            for loc, lm in parse_sitemap(xml or ""):
                hosts.append(h or "")
                urls.append(loc)
                mods.append(lm)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "url": pa.array(urls, pa.string()),
            "lastmod": pa.array(mods, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")
