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


def _pick_template_strategy(n_line_rows: int, salt_threshold: int) -> str:
    """Auto plan choice for :func:`host_template_lines`: below the
    crossover the two-exchange partition plan wins (salting's extra
    tiny exchange + broadcast is pure overhead); above it the salted
    plan's skew immunity dominates (measured, tools/stress_skew.py)."""
    return "salted" if n_line_rows >= salt_threshold else "partition"


def host_template_lines(ds, url_column: str = "url", column: str = "text",
                        id_column: str = "doc_id", min_docs: int = 3,
                        num_partitions: int = 32, strategy: str = "auto",
                        salt_buckets: int = 16,
                        max_broadcast: int = 2_000_000,
                        salt_threshold: int = 300_000,
                        scratch_dir: str | None = None):
    """Site-template boilerplate removal — the host-scoped line dedup
    (trafilatura's global-context pass / CC-Net's per-site filters): a
    line occurring in ≥ ``min_docs`` distinct documents of the SAME host
    is template (nav, footer, cookie banner) and is dropped from that
    host's documents — the identical line on another host where it is
    rare survives, which the global :func:`..functions.dedup.line_dedup`
    cannot express.

    ``strategy="partition"`` (default): TWO exchanges (the dup_span_mask
    collapse): line rows hash-partition by ``(host, line)`` — every
    occurrence of a host's line co-locates, so distinct-doc counting, the
    template filter and the subtraction are one partition-local polars
    pass — then survivors reassemble keyed by the doc id.

    ``strategy="salted"``: the skew-proof plan for template-heavy hot
    hosts.  A mega-host's footer puts every one of its occurrence rows on
    ONE ``(host, line)`` partition above; salting breaks that key without
    changing semantics: (1) per-batch-unique ``(host, line, doc)`` triples
    exchange keyed ``(host, line, salt=hash(doc) % salt_buckets)`` — all
    copies of one doc share a salt, so per-partition distinct-doc counts
    are disjoint and summable; (2) a TINY ``(host, line)`` exchange over
    the ≤ ``salt_buckets`` partial counts per line sums them into the
    template set; (3) the template keys broadcast back
    (:func:`..stages.shuffle.id_filter_join` anti, fused ``host\\x00line``
    key — exchange fallback past ``max_broadcast``) and occurrence rows
    are filtered in place, never crossing a line-keyed exchange at all;
    (4) reassembly keyed by doc id, unchanged.  Occurrence rows make ONE
    doc-keyed exchange total, and no partition ever holds a hot line's
    full occurrence set (measured under 1%-hosts-hold-50%-pages skew in
    ``tools/stress_skew.py`` / BASELINE.md).

    ``strategy="auto"`` (default): pick from data, so the 100 TB path
    never relies on the caller knowing the crossover.  The exploded
    line table persists to scratch parquet ONCE (the salted plan's two
    consumers would otherwise re-execute the corpus scan + explode —
    the round-5 dedup fix), its exact row count comes free from the
    parquet footers, and ≥ ``salt_threshold`` line rows (default 300k
    ≈ the measured ~100k-doc crossover of tools/stress_skew.py at ~3
    lines/doc) selects "salted", else "partition".  Explicit
    ``strategy="partition"`` skips the persist (single consumer).

    Output (all strategies, row-identical — parity-pinned in pytest):
    ``(id, host, text_cleaned, n_lines_kept)``; documents whose every
    line was template are omitted.
    """
    import polars as pl

    from docling_translate_ray.functions.urltools import extract_hosts
    from docling_translate_ray.stages.shuffle import (hash_partition_apply,
                                                      id_filter_join,
                                                      persist_dataset)

    if strategy not in ("auto", "partition", "salted"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def explode_lines(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(  # zero-copy
                batch.select([id_column, url_column, column]))
            .with_columns(pl.col(id_column).cast(pl.Int64),
                          pl.col(url_column).cast(pl.String),
                          pl.col(column).cast(pl.String).fill_null(""))
            .filter(pl.col(column).str.strip_chars() != "")
        )
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

    exploded = ds.select_columns([id_column, url_column, column]).map_batches(
        explode_lines, batch_format="pyarrow")

    if strategy != "partition":
        # salted consumes the explode twice (triples + the filtered
        # occurrence rows) and auto needs a row count: persist once,
        # count from the footers, re-read pruned
        persisted = persist_dataset(
            exploded, "dtr_hosttmpl_", scratch_dir,
            pa.schema([(id_column, pa.int64()), ("host", pa.string()),
                       ("line_no", pa.int64()), ("line", pa.string())]))
        if strategy == "auto":
            strategy = _pick_template_strategy(persisted.num_rows,
                                               salt_threshold)
        exploded = persisted([id_column, "host", "line_no", "line"])

    if strategy == "partition":
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
            exploded, ["host", "line"], drop_template,
            num_partitions=num_partitions,
        )
    else:  # salted
        triple_schema = pa.schema([("host", pa.string()), ("line", pa.string()),
                                   (id_column, pa.int64()),
                                   ("_salt", pa.int64())])

        def triples(batch: pa.Table) -> pa.Table:
            # per-batch combiner: one row per (host, line, doc) seen here;
            # salt is a pure function of the doc id, so every copy of a
            # triple (docs split across blocks) lands in the same salt
            # partition and dedups there
            return (
                pl.from_arrow(batch.select(["host", "line", id_column]))
                .unique()
                .with_columns(pl.col(id_column).hash(11)
                              .mod(salt_buckets).cast(pl.Int64).alias("_salt"))
                .to_arrow().cast(triple_schema)
            )

        def partial_counts(part: pa.Table) -> pa.Table:
            # distinct docs of this salt bucket per (host, line) — buckets
            # partition the doc space, so these partials sum exactly
            return (
                pl.from_arrow(part).unique()
                .group_by(["host", "line"]).len(name="_nd")
                .with_columns(pl.col("_nd").cast(pl.Int64))
                .select(["host", "line", "_nd"])
                .to_arrow()
            )

        partials = hash_partition_apply(
            exploded.map_batches(triples, batch_format="pyarrow"),
            ["host", "line", "_salt"], partial_counts,
            num_partitions=num_partitions,
        )

        def sum_counts(part: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(part)
                .group_by(["host", "line"]).agg(pl.col("_nd").sum())
                .filter(pl.col("_nd") >= min_docs)
                .select((pl.col("host") + "\x00" + pl.col("line"))
                        .alias("_hl"))
                .to_arrow().cast(pa.schema([("_hl", pa.string())]))
            )

        tmpl_keys = hash_partition_apply(
            partials, ["host", "line"], sum_counts,
            num_partitions=num_partitions,
        )

        def add_hl(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.append_column("_hl", pc.binary_join_element_wise(
                pc.cast(batch["host"], pa.string()),
                pc.cast(batch["line"], pa.string()), "\x00"))

        kept = id_filter_join(
            exploded.map_batches(add_hl, batch_format="pyarrow"),
            tmpl_keys, id_column="_hl", how="anti",
            max_broadcast=max_broadcast, num_partitions=num_partitions,
        ).map_batches(lambda b: b.drop_columns(["_hl"]),
                      batch_format="pyarrow")

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


def _pick_hot_threshold(total_rows: int, num_partitions: int,
                        split_target: int) -> int | None:
    """Auto hot-host rule for :func:`frontier_schedule`: a host whose
    frontier exceeds one partition's fair share (``total / P``, floored
    at ``split_target``) straggles the host-keyed exchange and gets
    range-split.  ``None`` (skip the sampling pass entirely) when the
    whole frontier fits under ``split_target`` — no host can qualify."""
    if total_rows <= split_target:
        return None
    return max(split_target, total_rows // num_partitions)


def frontier_schedule(ds, k_per_cycle: int = 4, url_column: str = "url",
                      priority_column: str = "priority",
                      num_partitions: int = 32,
                      k_column: str | None = None,
                      hot_host_threshold: int | None | str = "auto",
                      split_target: int = 100_000):
    """Politeness-aware crawl-frontier scheduling — the fetch-planner
    step of a web crawler (Heritrix/Nutch "queue per host, k fetches per
    politeness cycle"): each host serves at most ``k_per_cycle`` urls per
    cycle; within a host, higher priority goes first (ties → url
    ascending), so a url's cycle is ``(host_rank - 1) // k + 1``.

    ``k_column``: name of a per-ROW k override (constant within a host —
    e.g. derived from the host's robots ``Crawl-delay`` via
    :func:`parse_crawl_delay`); rows where it is null fall back to
    ``k_per_cycle``.  Returns ``(url, host, priority, cycle)``.

    Scale shape (default): ONE exchange keyed by host carrying (url,
    host, priority[, k]) — the page content never moves; per-partition
    work is a vectorized sort + windowed cum-count (the domain_cap
    kernel, assigning cycles instead of truncating at k).

    ``hot_host_threshold``: host is inherently skewed — a megadomain
    (one host holding 25% of the frontier) puts ALL its url rows on one
    partition above.  With a threshold set, hosts whose frontier exceeds
    it are RANGE-SPLIT instead of salted-and-merged (a rank is a global
    prefix count, so random salting can't reconstruct it; contiguous
    ranges can): (1) one combiner-reduced pass over the narrow rows
    collects per-host counts plus evenly-spaced sort-key samples (a hot
    host contributes one partial row per block, never its urls); (2) the
    driver picks ``ceil(count / split_target)`` range boundaries per hot
    host from the merged samples and broadcasts them; (3) rows map to
    ``_bucket = searchsorted(boundaries[host], key)`` (cold hosts: 0);
    (4) exact per-(host, bucket) counts prefix-sum into rank offsets
    (tiny, broadcast); (5) the ONE data exchange keys ``(host, bucket)``
    — global rank = offset + local rank, cycle as before.  Output is
    row-identical to the default path (parity-pinned in pytest); the
    narrow projection is materialized once to feed the extra metadata
    pass.  Boundary quality affects only balance, never correctness.
    Measured under megadomain skew in ``tools/stress_skew.py`` /
    BASELINE.md.

    ``hot_host_threshold="auto"`` (default): the narrow frontier rows
    materialize once (they feed two passes on the hot path anyway),
    the exact count comes free from the materialized blocks, and
    :func:`_pick_hot_threshold` derives the threshold — one
    partition's fair share, floored at ``split_target``; a frontier
    under ``split_target`` rows skips the sampling pass entirely
    (identical plan to ``None``).  Pass an int to pin the threshold,
    ``None`` to force the default single-exchange plan.
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

    narrow_ds = None
    if hot_host_threshold == "auto":
        narrow_ds = ds.map_batches(narrow, batch_format="pyarrow") \
            .materialize()
        hot_host_threshold = _pick_hot_threshold(
            narrow_ds.count(), num_partitions, split_target)

    if hot_host_threshold is None:
        return hash_partition_apply(
            narrow_ds if narrow_ds is not None
            else ds.map_batches(narrow, batch_format="pyarrow"),
            ["host"], schedule, num_partitions=num_partitions,
        )

    # ---- range-split skew path ----
    import numpy as np

    import ray

    from docling_translate_ray.util import collect_to_table

    n_samples = 8  # evenly-spaced sort-key samples per (block, host)

    def _with_sort_key(df: pl.DataFrame) -> pl.DataFrame:
        # lexicographic string == (priority DESC, url ASC): int64 bits
        # xor 0x7FF..F is the order-REVERSING map into uint64, zero-padded
        # decimal keeps lexicographic == numeric, url breaks ties ascending
        inv = (df["priority"].to_numpy().astype(np.int64).view(np.uint64)
               ^ np.uint64(0x7FFFFFFFFFFFFFFF))
        return df.with_columns(
            pl.concat_str([pl.Series("_inv", inv).cast(pl.String)
                           .str.zfill(20), pl.col("url")], separator="\x00")
            .alias("_sk"))

    if narrow_ds is None:
        narrow_ds = ds.map_batches(narrow, batch_format="pyarrow") \
            .materialize()

    # pass 1 (combiner-reduced): per-(block, host) count + spaced samples
    samp_schema = pa.schema([("host", pa.string()), ("_cnt", pa.int64()),
                             ("_sks", pa.list_(pa.string()))])

    def prep(batch: pa.Table) -> pa.Table:
        df = _with_sort_key(pl.from_arrow(batch))
        idx = (pl.int_range(0, n_samples) * (pl.len() - 1)
               // max(n_samples - 1, 1)).unique()
        return (
            df.group_by("host").agg(
                pl.len().cast(pl.Int64).alias("_cnt"),
                pl.col("_sk").sort().gather(idx).alias("_sks"))
            .to_arrow().cast(samp_schema)
        )

    def merge_samples(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part).group_by("host").agg(
                pl.col("_cnt").sum(),
                pl.col("_sks").flatten().sort().alias("_sks"))
            .filter(pl.col("_cnt") > hot_host_threshold)
            .to_arrow().cast(samp_schema)
        )

    hot_tbl = collect_to_table(
        hash_partition_apply(
            narrow_ds.map_batches(prep, batch_format="pyarrow"),
            ["host"], merge_samples, num_partitions=num_partitions),
        empty_schema=samp_schema,
    )

    bounds: dict[str, list[str]] = {}
    for host, cnt, sks in zip(hot_tbl["host"].to_pylist(),
                              hot_tbl["_cnt"].to_pylist(),
                              hot_tbl["_sks"].to_pylist()):
        n_buckets = max(2, min(64, -(-cnt // max(split_target, 1))))
        picks = sorted({sks[(j * len(sks)) // n_buckets]
                        for j in range(1, n_buckets)})
        if picks:
            bounds[host] = picks
    bref = ray.put(bounds)

    def bucketize(batch: pa.Table) -> pa.Table:
        bmap = ray.get(bref)
        df = _with_sort_key(pl.from_arrow(batch))
        hosts = df["host"].to_numpy().astype(object)
        bucket = np.zeros(df.height, dtype=np.int64)
        for host in np.unique(hosts):
            bl = bmap.get(host)
            if bl is None:
                continue
            sel = np.nonzero(hosts == host)[0]
            bucket[sel] = np.searchsorted(
                np.asarray(bl, dtype=object),
                df["_sk"].to_numpy().astype(object)[sel], side="right")
        return (
            df.drop("_sk")
            .with_columns(pl.Series("_bucket", bucket, dtype=pl.Int64))
            .to_arrow()
        )

    if not bounds:
        # nothing exceeded the threshold — keyed exactly like the default
        # path ((host, constant-0 bucket) == host), no offsets needed
        return hash_partition_apply(
            narrow_ds.map_batches(bucketize, batch_format="pyarrow"),
            ["host", "_bucket"],
            lambda part: schedule(part.drop_columns(["_bucket"])),
            num_partitions=num_partitions,
        )

    # pass 2: exact per-(hot host, bucket) counts → rank offsets (tiny)
    cnt_schema = pa.schema([("host", pa.string()), ("_bucket", pa.int64()),
                            ("_n", pa.int64())])

    def bucket_counts(batch: pa.Table) -> pa.Table:
        bmap = ray.get(bref)
        return (
            pl.from_arrow(batch.select(["host", "_bucket"]))
            .filter(pl.col("host").is_in(list(bmap)))
            .group_by(["host", "_bucket"]).len(name="_n")
            .with_columns(pl.col("_n").cast(pl.Int64))
            .to_arrow().cast(cnt_schema)
        )

    def merge_counts(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part).group_by(["host", "_bucket"])
            .agg(pl.col("_n").sum()).to_arrow().cast(cnt_schema)
        )

    bucketized = narrow_ds.map_batches(bucketize, batch_format="pyarrow")
    counts = collect_to_table(
        hash_partition_apply(
            bucketized.map_batches(bucket_counts, batch_format="pyarrow"),
            ["host"], merge_counts, num_partitions=num_partitions),
        empty_schema=cnt_schema,
    )
    offsets = (
        pl.from_arrow(counts).sort(["host", "_bucket"])
        .with_columns((pl.col("_n").cum_sum().over("host") - pl.col("_n"))
                      .alias("_off"))
        .select(["host", "_bucket", "_off"])
    )
    oref = ray.put(offsets.to_arrow())

    def assign(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        off = pl.from_arrow(ray.get(oref))
        return (
            pl.from_arrow(part)
            .sort(["priority", "url"], descending=[True, False])
            .with_columns(
                pl.col("url").cum_count().over(["host", "_bucket"])
                .cast(pl.Int64).alias("_local"))
            .join(off, on=["host", "_bucket"], how="left")
            .with_columns(pl.col("_off").fill_null(0))
            .with_columns(((pl.col("_off") + pl.col("_local") - 1)
                           // pl.col("_k") + 1).alias("cycle"))
            .select(["url", "host", "priority", "cycle"])
            .to_arrow().cast(out_schema)
        )

    return hash_partition_apply(
        bucketized, ["host", "_bucket"], assign,
        num_partitions=num_partitions,
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


_RSS_ITEM_RE = _re2.compile(r"<item\b[^>]*>(.*?)</item>",
                            _re2.IGNORECASE | _re2.DOTALL)
_ATOM_ENTRY_RE = _re2.compile(r"<entry\b[^>]*>(.*?)</entry>",
                              _re2.IGNORECASE | _re2.DOTALL)
_FEED_TITLE_RE = _re2.compile(r"<title[^>]*>\s*(.*?)\s*</title>",
                              _re2.IGNORECASE | _re2.DOTALL)
# attributes allowed in the open tag (real feeds ship <link> with xmlns
# junk); an Atom-style self-closing <link …/> still yields no text match
_RSS_LINK_RE = _re2.compile(r"<link\b[^>]*>\s*(.*?)\s*</link>",
                            _re2.IGNORECASE | _re2.DOTALL)
_ATOM_LINK_RE = _re2.compile(r'<link\b[^>]*href="([^"]+)"',
                             _re2.IGNORECASE)
_RSS_DATE_RE = _re2.compile(r"<pubDate\s*>\s*(.*?)\s*</pubDate>",
                            _re2.IGNORECASE | _re2.DOTALL)
_ATOM_DATE_RE = _re2.compile(r"<updated\s*>\s*(.*?)\s*</updated>",
                             _re2.IGNORECASE | _re2.DOTALL)


def parse_feed(xml: str) -> list[tuple[str, str, str]]:
    """``(link, title, published)`` tuples from one RSS 2.0 / Atom feed
    body — the fourth crawl-discovery surface (news/blog update
    streams) next to sitemaps, in-page links and the snapshot history.
    Frozen regex subset, both dialects in one pass: RSS ``<item>``
    blocks (``<link>text</link>``, ``<pubDate>``) and Atom ``<entry>``
    blocks (``<link href="…">``, ``<updated>``); an item without a
    link contributes nothing; title/published are "" when absent.
    Entries emit in document order, RSS items before Atom entries
    (real feeds contain only one dialect)."""
    out: list[tuple[str, str, str]] = []
    for m in _RSS_ITEM_RE.finditer(xml or ""):
        block = m.group(1)
        link = _RSS_LINK_RE.search(block)
        if not link or not link.group(1):
            continue
        t = _FEED_TITLE_RE.search(block)
        d = _RSS_DATE_RE.search(block)
        out.append((link.group(1), t.group(1) if t else "",
                    d.group(1) if d else ""))
    for m in _ATOM_ENTRY_RE.finditer(xml or ""):
        block = m.group(1)
        link = _ATOM_LINK_RE.search(block)
        if not link or not link.group(1):
            continue
        t = _FEED_TITLE_RE.search(block)
        d = _ATOM_DATE_RE.search(block)
        out.append((link.group(1), t.group(1) if t else "",
                    d.group(1) if d else ""))
    return out


def feed_seeds(ds, host_column: str = "host", xml_column: str = "feed_xml"):
    """Explode per-host RSS/Atom feed documents into frontier seed rows
    ``(host, url, title, published)`` — same contract as
    :func:`sitemap_seeds` (pure per-batch parser map, no shuffle; gate
    with :func:`robots_filter`, plan with :func:`frontier_schedule`)."""

    def explode(batch: pa.Table) -> pa.Table:
        hosts, urls, titles, dates = [], [], [], []
        for h, xml in zip(batch[host_column].to_pylist(),
                          batch[xml_column].to_pylist()):
            for link, title, pub in parse_feed(xml or ""):
                hosts.append(h or "")
                urls.append(link)
                titles.append(title)
                dates.append(pub)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "published": pa.array(dates, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Redirect-chain resolution
# ---------------------------------------------------------------------------

_REDIRECT_SCHEMA = pa.schema([
    ("src_url", pa.string()),
    ("final_url", pa.string()),
    ("hops", pa.int64()),
    ("is_cycle", pa.bool_()),
])


def resolve_redirects(edges_ds, src_column: str = "src_url",
                      dst_column: str = "dst_url", max_hops: int = 16,
                      strategy: str = "auto",
                      broadcast_budget: int = 5_000_000,
                      num_partitions: int = 64):
    """Resolve HTTP redirect chains to their final landing url.

    Input: a functional edge table (one ``src → dst`` row per
    redirecting url — a url redirects to exactly one place).  Output:
    ``(src_url, final_url, hops, is_cycle)`` for EVERY src — srcs whose
    chain does not reach a non-redirecting url within ``max_hops``
    edges (true cycles, or over-cap chains) get ``is_cycle=true`` with
    null final/hops; both engines share that hop-cap semantic.

    A crawl pipeline needs this before url dedup / frontier planning:
    fetch records say ``301 → Location`` one hop at a time, but the
    corpus wants every variant collapsed onto the landing page.

    Two physical paths (the repo's broadcast-or-exchange convention):

    * ``broadcast`` (edge count ≤ ``broadcast_budget``) — the narrow
      (src, dst) map is ``ray.put`` ONCE and every task walks its
      batch's chains in memory (each step is a dict hop, bounded by
      ``max_hops``); pages/bodies never enter the plan.
    * ``exchange`` — pointer doubling: the state table
      ``src → (cur, hops, done)`` self-composes each round
      (``f ← f∘f``), so ``ceil(log2(max_hops)) + 1`` co-partitioned
      hash exchanges replace up-to-``max_hops`` sequential joins.
      Each round moves 2 narrow rows per src (probe keyed by ``cur``,
      build keyed by ``src``); composition is a vectorized polars join
      per partition.  A probe whose ``cur`` misses the build side has
      reached a non-redirecting url — terminal, exact total hops; a
      composition that would exceed ``max_hops`` is blocked (its total
      distance provably exceeds the cap, see the alignment note in
      tests/test_redirects.py).
    """
    import math

    import numpy as np  # noqa: F401  (polars pulls it in anyway)
    import ray
    import ray.data

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], f.type)
                      for f in _REDIRECT_SCHEMA}))
    if strategy == "auto":
        strategy = ("broadcast" if n_edges <= broadcast_budget
                    else "exchange")

    if strategy == "broadcast":
        narrow = pa.concat_tables(
            ray.get(edges_ds.select_columns([src_column, dst_column])
                    .to_arrow_refs())).combine_chunks()
        nxt_ref = ray.put(dict(
            zip(narrow[src_column].to_pylist(),
                narrow[dst_column].to_pylist())))

        def walk(batch: pa.Table) -> pa.Table:
            nxt = ray.get(nxt_ref)
            srcs = batch[src_column].to_pylist()
            finals, hops_out, cyc = [], [], []
            for s in srcs:
                cur, hops = s, 0
                while hops < max_hops and cur in nxt:
                    cur = nxt[cur]
                    hops += 1
                if cur in nxt:  # still redirecting at the cap
                    finals.append(None)
                    hops_out.append(None)
                    cyc.append(True)
                else:
                    finals.append(cur)
                    hops_out.append(hops)
                    cyc.append(False)
            return pa.table({
                "src_url": pa.array(srcs, pa.string()),
                "final_url": pa.array(finals, pa.string()),
                "hops": pa.array(hops_out, pa.int64()),
                "is_cycle": pa.array(cyc, pa.bool_()),
            })

        return edges_ds.map_batches(walk, batch_format="pyarrow")

    # ---- pointer-doubling exchange path ----
    import polars as pl

    def init_state(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch[src_column],
            "cur": batch[dst_column],
            "hops": pa.array([1] * batch.num_rows, pa.int64()),
            "done": pa.array([False] * batch.num_rows, pa.bool_()),
        })

    state = edges_ds.map_batches(init_state, batch_format="pyarrow")

    def tag(kind: int, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "key": batch[key_col],
                "kind": pa.array([kind] * batch.num_rows, pa.int8()),
                "src": batch["src"], "cur": batch["cur"],
                "hops": batch["hops"], "done": batch["done"],
            })
        return fn

    def compose(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part)
        probe = df.filter(pl.col("kind") == 0)
        build = (df.filter(pl.col("kind") == 1)
                 .select(pl.col("key"), pl.col("cur").alias("_bcur"),
                         pl.col("hops").alias("_bhops"),
                         pl.col("done").alias("_bdone")))
        j = probe.join(build, on="key", how="left")
        miss = pl.col("_bcur").is_null()
        blocked = (~miss) & ((pl.col("hops") + pl.col("_bhops"))
                             > max_hops)
        out = j.select(
            pl.col("src"),
            pl.when(miss | blocked).then(pl.col("cur"))
            .otherwise(pl.col("_bcur")).alias("cur"),
            pl.when(miss | blocked).then(pl.col("hops"))
            .otherwise(pl.col("hops") + pl.col("_bhops")).alias("hops"),
            pl.when(miss).then(pl.lit(True))
            .when(blocked).then(pl.lit(False))
            .otherwise(pl.col("_bdone")).alias("done"),
        )
        return out.to_arrow().cast(pa.schema([
            ("src", pa.string()), ("cur", pa.string()),
            ("hops", pa.int64()), ("done", pa.bool_())]))

    # Per-round block discipline: ``map_groups`` emits as many blocks as it
    # was fed and ``union`` concatenates block lists, so without the
    # ``repartition`` below the state would grow 3× blocks per round
    # (probed ≈ 2×state + done ≈ 1×state) — measured 192→576→1728 blocks and
    # ~4× wall per round at 500k urls (per-block task overhead, not data).
    # Repartitioning the narrow state back to ``num_partitions`` blocks each
    # round keeps every round the same shape and cost.
    rounds = max(1, math.ceil(math.log2(max(2, max_hops)))) + 1
    state = state.repartition(num_partitions).materialize()
    for _ in range(rounds):
        if state.filter(expr="done == False").count() == 0:
            break  # every chain resolved — skip the remaining rounds
        done_rows = state.filter(expr="done == True")
        todo = state.filter(expr="done == False")
        tagged = (todo.map_batches(tag(0, "cur"), batch_format="pyarrow")
                  .union(state.map_batches(tag(1, "src"),
                                           batch_format="pyarrow")))
        probed = hash_partition_apply(
            tagged, ["key"], compose, num_partitions=num_partitions,
            label="redirects:compose")
        state = (probed.union(done_rows).repartition(num_partitions)
                 .materialize())

    def finish(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        out = df.select(
            pl.col("src").alias("src_url"),
            pl.when(pl.col("done")).then(pl.col("cur"))
            .alias("final_url"),
            pl.when(pl.col("done")).then(pl.col("hops")).alias("hops"),
            (~pl.col("done")).alias("is_cycle"),
        )
        return out.to_arrow().cast(_REDIRECT_SCHEMA)

    return state.map_batches(finish, batch_format="pyarrow")
