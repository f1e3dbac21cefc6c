"""Text-analysis operators over a ``text`` column (training-data pipeline ops).

All are Arrow-in/Arrow-out ``map_batches`` bodies, vectorized with polars /
numpy where the kernel allows; each has a ``queries()`` entry in
``__ray_entry__`` and (where SQL-expressible) a DuckDB oracle with the SAME
formula, so keep semantics here and in ``oracle_sql()`` in lockstep.

Ops: token counting (whitespace spec), md5 + rolling-hash document
fingerprints, quality scoring (length/punct/upper/token-shape ratios),
n-gram-heuristic language ID.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_PUNCT = ".,;:!?"


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Add ``n_tokens`` = count of ``\\S+`` runs (whitespace tokenizer spec).

    Oracle: ``length(regexp_split_to_array(trim(text), '\\s+'))`` guarded for
    empty strings.
    """
    import polars as pl

    s = pl.from_arrow(batch[column])
    n = s.str.count_matches(r"\S+").cast(pl.Int64).fill_null(0)
    return batch.append_column("n_tokens", pa.array(n.to_list(), pa.int64()))


def text_hash_batch(col, mode: str = "xx64") -> pa.Array:
    """One deterministic hash STRING per row of a text column (nulls
    hash as '').

    * ``xx64`` (default) — vectorized polars hash rendered as a
      zero-padded decimal, so lexicographic order == numeric order.
      ~10× the md5 loop; use whenever the hash only needs equality /
      uniform-rank semantics (dedup keys, deterministic sampling ranks).
    * ``md5`` — hex md5 of the utf-8 bytes, DuckDB ``md5(text)``
      lockstep for SQL oracles.  hashlib's C md5 releases the GIL and
      matches DuckDB's own vectorized md5 within noise (measured), so
      the loop here is NOT the bottleneck — md5's per-byte cost is.
    """
    if mode == "md5":
        return pa.array(
            [hashlib.md5((t or "").encode("utf-8")).hexdigest()
             for t in col.to_pylist()], pa.string())
    if mode != "xx64":
        raise ValueError(f"unknown hash mode {mode!r} (xx64 | md5)")
    import polars as pl

    s = pl.Series("t", col)
    if s.dtype == pl.Null:
        s = pl.Series("t", [""] * len(col), dtype=pl.String)
    return (s.fill_null("").hash(seed=3).cast(pl.String).str.zfill(20)
            .to_arrow().cast(pa.string()))


_ROLL_BASE = np.uint64(1315423911)


def rolling_fingerprint(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit polynomial rolling hash over words.

    ``h(doc) = Σ_i hash(w_i) · B^(n-1-i)  (mod 2^64)`` — the positional
    polynomial is evaluated as one flat weighted segment-sum: tokens are
    exploded once (polars), per-token hashes come from the vectorized
    xxhash kernel, the base powers are a precomputed table, and per-doc
    sums use ``np.add.reduceat`` — no per-word Python, no per-word
    hashlib (the round-1 kernel's cost).  Deterministic for a fixed
    polars version; empty/whitespace-only docs hash to 0.
    """
    import polars as pl

    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return out
    toks = (
        pl.DataFrame({"t": pl.Series(texts, dtype=pl.String).fill_null("")})
        .with_row_index("_r")
        .select(pl.col("_r"), pl.col("t").str.extract_all(r"\S+").alias("w"))
        .explode("w")
        .drop_nulls("w")
    )
    if not toks.height:
        return out
    r_idx = toks["_r"].to_numpy().astype(np.int64)  # nondecreasing (explode order)
    wh = toks["w"].hash(seed=13).to_numpy().astype(np.uint64)
    counts = np.bincount(r_idx, minlength=n_docs)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos = np.arange(len(r_idx)) - offsets[r_idx]
    expo = counts[r_idx] - 1 - pos
    max_n = int(counts.max())
    powers = np.empty(max_n, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # wrap mod 2^64 is the point
        for j in range(1, max_n):
            powers[j] = powers[j - 1] * _ROLL_BASE
        terms = wh * powers[expo]
        present = np.nonzero(counts)[0]
        starts = offsets[present]
        out[present] = np.add.reduceat(terms, starts)
    return out


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Add ``fp_md5`` (hex md5 of utf-8 text — DuckDB ``md5(text)`` parity)
    and ``fp_roll`` (64-bit polynomial rolling hash over words — vectorized,
    deterministic, non-SQL; the A4/doc-fingerprint analog)."""
    texts = batch[column].to_pylist()
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    rolls = rolling_fingerprint(texts)
    return batch.append_column("fp_md5", pa.array(md5s, pa.string())).append_column(
        "fp_roll", pa.array(rolls.view(np.int64), pa.int64())
    )


def quality_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Quality-scoring columns, all SQL-expressible (shared oracle formula):

    * ``n_chars``   = length(text)
    * ``n_tokens``  = count of \\S+ runs
    * ``punct_ratio`` = count of [.,;:!?] / max(n_chars,1)
    * ``upper_ratio`` = count of [A-Z] / max(n_chars,1)
    * ``mean_token_len`` = sum(len(token)) / max(n_tokens,1)
    * ``quality_ok``  = n_tokens >= 5 AND punct_ratio <= 0.2 AND
      mean_token_len BETWEEN 2 AND 14
    """
    import polars as pl

    s = pl.from_arrow(batch[column]).fill_null("")
    df = pl.DataFrame({"t": s})
    out = df.select(
        pl.col("t").str.len_chars().cast(pl.Int64).alias("n_chars"),
        pl.col("t").str.count_matches(r"\S+").cast(pl.Int64).alias("n_tokens"),
        pl.col("t").str.count_matches(r"[.,;:!?]").cast(pl.Int64).alias("_np"),
        pl.col("t").str.count_matches(r"[A-Z]").cast(pl.Int64).alias("_nu"),
        pl.col("t").str.count_matches(r"\S").cast(pl.Int64).alias("_nonws"),
    ).with_columns(
        (pl.col("_np") / pl.max_horizontal(pl.col("n_chars"), 1)).alias("punct_ratio"),
        (pl.col("_nu") / pl.max_horizontal(pl.col("n_chars"), 1)).alias("upper_ratio"),
        (pl.col("_nonws") / pl.max_horizontal(pl.col("n_tokens"), 1)).alias("mean_token_len"),
    ).with_columns(
        (
            (pl.col("n_tokens") >= 5)
            & (pl.col("punct_ratio") <= 0.2)
            & pl.col("mean_token_len").is_between(2, 14)
        ).alias("quality_ok")
    ).drop(["_np", "_nu", "_nonws"])
    res = batch
    for name in ["n_chars", "n_tokens", "punct_ratio", "upper_ratio", "mean_token_len", "quality_ok"]:
        if name in res.column_names:  # overwrite (e.g. documents already has n_chars)
            res = res.drop_columns([name])
        res = res.append_column(name, out[name].to_arrow())
    return res


def token_quantiles(ds, qs=((25, 0.25), (50, 0.50), (75, 0.75),
                            (90, 0.90), (99, 0.99)),
                    column: str = "text",
                    group_column: str | None = None) -> pa.Table:
    """Exact (per-group) quantiles of the per-doc token count WITHOUT a
    global sort: per-batch value-histogram combiner → one ``grouped_sum``
    exchange keyed by (group?, count VALUE) — cardinality = groups ×
    distinct doc lengths, independent of corpus size — → the driver
    cumsums the tiny collected histogram(s) and picks the value at
    1-based index ``max(1, ceil(q·n))`` — DuckDB ``quantile_disc``'s
    exact discrete rule, verified against it on edge sizes.

    Returns (group?, quantile:string, n_tokens:int64) — 5 rows per group
    (one group when ``group_column`` is None).  This is the scale-safe
    pattern for ANY integer-valued percentile (lengths, scores, degree
    distributions): the shuffle moves histograms, never rows.
    """
    import math

    import polars as pl

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import collect_to_table

    gcols = [group_column] if group_column else []

    def hist_partial(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[column])
        data = {"n_tokens": s.fill_null("").str.count_matches(r"\S+").cast(pl.Int64)}
        for g in gcols:
            data[g] = pl.from_arrow(batch[g])
        return (
            pl.DataFrame(data)
            .group_by(gcols + ["n_tokens"])
            .agg(pl.len().cast(pl.Int64).alias("_n"))
            .to_arrow()
        )

    empty_fields = [(g, pa.string()) for g in gcols]
    hist = collect_to_table(
        grouped_sum(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            gcols + ["n_tokens"],
            [pl.col("_n").sum().alias("_n")],
            {"n_docs": "_n"},
            num_partitions=16,
        ),
        empty_schema=pa.schema(
            empty_fields + [("n_tokens", pa.int64()), ("n_docs", pa.int64())]
        ),
    )

    def pick(values: list, cums: list, total: int):
        for label, q in qs:
            idx = max(1, math.ceil(q * total))
            yield f"p{label}", next(
                (val for val, c in zip(values, cums) if c >= idx), None
            )

    out_g, out_q, out_v = [], [], []
    df = pl.from_arrow(hist)
    if group_column:
        groups = (
            df.partition_by(gcols, maintain_order=False) if df.height else []
        )
        for grp in sorted(groups, key=lambda g: g[group_column][0]):
            grp = grp.sort("n_tokens").with_columns(
                pl.col("n_docs").cum_sum().alias("_cum")
            )
            for label, v in pick(
                grp["n_tokens"].to_list(), grp["_cum"].to_list(),
                int(grp["n_docs"].sum()),
            ):
                out_g.append(grp[group_column][0])
                out_q.append(label)
                out_v.append(v)
    else:
        df = df.sort("n_tokens").with_columns(pl.col("n_docs").cum_sum().alias("_cum"))
        total = int(df["n_docs"].sum()) if df.height else 0
        for label, v in pick(df["n_tokens"].to_list(), df["_cum"].to_list(), total):
            out_q.append(label)
            out_v.append(v)
    cols = {}
    if group_column:
        cols[group_column] = pa.array(out_g, pa.string())
    cols["quantile"] = pa.array(out_q, pa.string())
    cols["n_tokens"] = pa.array(out_v, pa.int64())
    return pa.table(cols)


def cooccurrence_lift(ds, k: int = 50, min_count: int = 5,
                      column: str = "text", num_partitions: int = 32):
    """Top-k adjacent-bigram collocations by LIFT — the PMI-family
    "what phrases matter in my corpus" op:

        lift(w1, w2) = (c_xy · N) / (c_1 · c_2)

    (PMI = log lift; the log is monotone, so ranking by lift IS ranking
    by PMI while staying in arithmetic both engines reproduce
    bit-identically: every operand is an exact int64 count widened to
    float64 in the SAME operation order as the SQL oracle.)

    Scale shape: per-batch combiners for bigram and unigram counts (the
    exchanges carry one row per (batch, gram)); unigram counts attach to
    the bigram table through two co-partition joins (no broadcast —
    real vocabularies don't fit one); N is the sum of the unigram table
    (a per-batch partial-sum collect, vocab-sized not corpus-sized);
    top-k is per-partition local + tiny driver merge, never a global
    sort.  Returns (w1, w2, c_xy, lift, rank), rank ties broken on
    (w1, w2).
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import broadcast_join, grouped_sum
    from docling_translate_ray.util import collect_to_table

    def gram_partials(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            s = pl.from_arrow(batch[column]).fill_null("")
            long = (
                pl.DataFrame({"t": s})
                .with_row_index("_r")
                .select("_r", pl.col("t").str.extract_all(r"\S+").alias("w"))
                .explode("w")
                .drop_nulls("w")
            )
            if which == "uni":
                out = long.group_by("w").agg(
                    pl.len().cast(pl.Int64).alias("_n")
                )
            else:
                out = (
                    long.with_columns(
                        pl.col("w").shift(-1).over("_r").alias("w2")
                    )
                    .drop_nulls("w2")
                    .rename({"w": "w1"})
                    .group_by(["w1", "w2"])
                    .agg(pl.len().cast(pl.Int64).alias("_n"))
                )
            return out.to_arrow()

        return fn

    unigrams = grouped_sum(
        ds.map_batches(gram_partials("uni"), batch_format="pyarrow"),
        ["w"], [pl.col("_n").sum().alias("_n")], {"c": "_n"},
        num_partitions=num_partitions,
    ).materialize()  # consumed three times (N, join ×2); vocab-sized
    bigrams = grouped_sum(
        ds.map_batches(gram_partials("bi"), batch_format="pyarrow"),
        ["w1", "w2"], [pl.col("_n").sum().alias("_n")], {"c_xy": "_n"},
        num_partitions=num_partitions,
    )

    def partial_sum(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"_s": pa.array(
            [pc.sum(batch["c"]).as_py() or 0], pa.int64())})

    n_total = sum(
        collect_to_table(
            unigrams.map_batches(partial_sum, batch_format="pyarrow"),
            empty_schema=pa.schema([("_s", pa.int64())]),
        )["_s"].to_pylist()
    )

    def rename_uni(new_key: str, new_c: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [new_key if c == "w" else new_c if c == "c" else c
                 for c in batch.column_names]
            )

        return fn

    def keep_frequent(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["c_xy"], min_count))

    filtered = bigrams.map_batches(keep_frequent, batch_format="pyarrow")
    # unigram counts are vocab-sized: both attaches are
    # broadcast-or-exchange (map-side under the row budget, hash
    # partition_join fallback past it)
    joined = broadcast_join(
        broadcast_join(
            filtered,
            unigrams.map_batches(rename_uni("w1", "c1"), batch_format="pyarrow"),
            on=["w1"], how="inner", num_partitions=num_partitions,
        ),
        unigrams.map_batches(rename_uni("w2", "c2"), batch_format="pyarrow"),
        on=["w2"], how="inner", num_partitions=num_partitions,
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            (
                (pl.col("c_xy").cast(pl.Float64) * float(n_total))
                / (pl.col("c1").cast(pl.Float64) * pl.col("c2").cast(pl.Float64))
            ).alias("lift")
        )
        return (
            df.sort(["lift", "w1", "w2"], descending=[True, False, False])
            .head(k)
            .select(["w1", "w2", "c_xy", "lift"])
            .to_arrow()
        )

    cand = collect_to_table(
        joined.map_batches(local_topk, batch_format="pyarrow"),
        empty_schema=pa.schema([("w1", pa.string()), ("w2", pa.string()),
                                ("c_xy", pa.int64()), ("lift", pa.float64())]),
    )
    top = (
        pl.from_arrow(cand)
        .sort(["lift", "w1", "w2"], descending=[True, False, False])
        .head(k)
        .to_arrow()
    )
    from docling_translate_ray.state.checkpoint import normalize_arrow_types

    top = normalize_arrow_types(top)
    return top.append_column("rank", pa.array(range(1, top.num_rows + 1), pa.int64()))


# PII patterns kept RE2-compatible (no lookaround, no \s shorthand) so the
# DuckDB oracle runs the IDENTICAL regexes; rust-regex and RE2 agree on
# every construct used here
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_RE = r"\+[0-9][0-9]?[0-9]?-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"


def pii_scrub_batch(batch: pa.Table, column: str = "text",
                    out_column: str = "text_redacted") -> pa.Table:
    """C4-style PII scrub: replace emails with ``<EMAIL>`` and
    international-format phone numbers with ``<PHONE>``, counting each.
    Vectorized (two compiled-regex passes per batch); appends
    (out_column, n_emails, n_phones)."""
    import polars as pl

    s = pl.from_arrow(batch[column]).fill_null("")
    df = pl.DataFrame({"t": s}).with_columns(
        pl.col("t").str.count_matches(PII_EMAIL_RE).cast(pl.Int64).alias("n_emails"),
        pl.col("t").str.count_matches(PII_PHONE_RE).cast(pl.Int64).alias("n_phones"),
        pl.col("t")
        .str.replace_all(PII_EMAIL_RE, "<EMAIL>")
        .str.replace_all(PII_PHONE_RE, "<PHONE>")
        .alias(out_column),
    )
    res = batch
    for name in [out_column, "n_emails", "n_phones"]:
        if name in res.column_names:
            res = res.drop_columns([name])
        res = res.append_column(name, df[name].to_arrow())
    return res


def rep_signals_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Gopher-style repetition signals per doc, fully vectorized and
    SQL-expressible (shared oracle formula over ``\\S+`` tokens):

    * ``n_words``        = token count
    * ``dup_word_frac``  = (n_words − n_distinct_words) / max(n_words, 1)
    * ``dup_2gram_frac`` = (n_2grams − n_distinct_2grams) / max(n_2grams, 1)
    * ``top_2gram_frac`` = count(most frequent 2gram) / max(n_2grams, 1)
    * ``rep_ok``         = dup_2gram ≤ 0.08 ∧ dup_word ≤ 0.65 ∧ top_2gram ≤ 0.10
      (thresholds chosen to cut real docs on the sf corpora)

    Shape: one explode + two grouped aggregations per batch — no Python
    per row, no cross-batch state (the signals are per-doc by definition).
    """
    import polars as pl

    s = pl.from_arrow(batch[column]).fill_null("")
    base = (
        pl.DataFrame({"t": s})
        .with_row_index("_r")
        .select(
            "_r", pl.col("t").str.extract_all(r"\S+").alias("ws")
        )
        .with_columns(
            pl.col("ws").list.len().cast(pl.Int64).alias("n_words"),
            pl.col("ws").list.n_unique().cast(pl.Int64).alias("_nuw"),
        )
    )
    pairs = (
        base.select("_r", "ws")
        .explode("ws")
        .drop_nulls("ws")
        .with_columns(pl.col("ws").shift(-1).over("_r").alias("_nxt"))
        .drop_nulls("_nxt")
        .with_columns((pl.col("ws") + " " + pl.col("_nxt")).alias("g"))
        .group_by("_r", "g")
        .len()
    )
    ga = pairs.group_by("_r").agg(
        pl.col("len").sum().cast(pl.Int64).alias("_n2"),
        pl.len().cast(pl.Int64).alias("_nd2"),
        pl.col("len").max().cast(pl.Int64).alias("_top"),
    )
    out = (
        base.join(ga, on="_r", how="left")
        .sort("_r")
        .with_columns(
            pl.col("_n2").fill_null(0),
            pl.col("_nd2").fill_null(0),
            pl.col("_top").fill_null(0),
        )
        .with_columns(
            ((pl.col("n_words") - pl.col("_nuw"))
             / pl.max_horizontal(pl.col("n_words"), 1)).alias("dup_word_frac"),
            ((pl.col("_n2") - pl.col("_nd2"))
             / pl.max_horizontal(pl.col("_n2"), 1)).alias("dup_2gram_frac"),
            (pl.col("_top")
             / pl.max_horizontal(pl.col("_n2"), 1)).alias("top_2gram_frac"),
        )
        .with_columns(
            (
                (pl.col("dup_2gram_frac") <= 0.08)
                & (pl.col("dup_word_frac") <= 0.65)
                & (pl.col("top_2gram_frac") <= 0.10)
            ).alias("rep_ok")
        )
    )
    res = batch
    for name in ["n_words", "dup_word_frac", "dup_2gram_frac", "top_2gram_frac", "rep_ok"]:
        if name in res.column_names:
            res = res.drop_columns([name])
        res = res.append_column(name, out[name].to_arrow())
    return res


def compression_ratio_batch(batch: pa.Table, column: str = "text",
                            min_bytes: int = 256,
                            min_ratio_bp: int = 3000) -> pa.Table:
    """zlib-compressibility quality signal (the RefinedWeb/FineWeb-family
    repetitiveness detector the n-gram signals miss): boilerplate-heavy
    or machine-generated text compresses far below natural prose.

    Adds ``n_bytes`` (utf-8 length), ``compress_ratio_bp`` (compressed /
    raw size in integer BASIS POINTS — deterministic across machines for
    a fixed zlib, and exact for downstream oracle-friendly comparisons)
    and ``compress_ok`` (ratio ≥ ``min_ratio_bp`` OR the doc is shorter
    than ``min_bytes`` — tiny docs compress erratically and are the
    length gate's job, not this one's).

    Per-row ``zlib.compress`` is C code that releases the GIL (~100 MB/s
    per core) — the same budget class as the md5 fingerprints this
    engine already pays only where an oracle needs them; there is no
    vectorized substitute, and the signal is per-doc by definition.  No
    SQL analog exists (DuckDB has no zlib), so this ships pytest-pinned
    by property (repeated text ≪ natural prose ≪ random), not
    driver-oracled.
    """
    import zlib

    import polars as pl

    s = pl.from_arrow(batch[column]).fill_null("")
    ratios = np.empty(len(s), dtype=np.int64)
    sizes = np.empty(len(s), dtype=np.int64)
    for i, t in enumerate(s):
        raw = t.encode("utf-8")
        sizes[i] = len(raw)
        ratios[i] = (len(zlib.compress(raw, 6)) * 10_000 // len(raw)
                     if raw else 10_000)
    ok = (ratios >= min_ratio_bp) | (sizes < min_bytes)
    res = batch
    for name, arr in (("n_bytes", pa.array(sizes, pa.int64())),
                      ("compress_ratio_bp", pa.array(ratios, pa.int64())),
                      ("compress_ok", pa.array(ok))):
        if name in res.column_names:
            res = res.drop_columns([name])
        res = res.append_column(name, arr)
    return res


_BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_bpe_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Add ``n_tokens_bpe`` — a BPE-pre-tokenizer-shaped count: runs of
    letters, runs of digits, runs of other non-space symbols (a simplified,
    RE2-safe GPT-2 pre-tokenizer so DuckDB ``regexp_extract_all`` with the
    SAME pattern is the oracle)."""
    import polars as pl

    s = pl.from_arrow(batch[column]).fill_null("")
    n = s.str.count_matches(_BPE_PAT).cast(pl.Int64)
    return batch.append_column("n_tokens_bpe", pa.array(n.to_list(), pa.int64()))


def gopher_quality_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Gopher-rule-shaped quality gates (word-count bounds, mean word
    length bounds, symbol share, bullet share, stopword presence), all
    RE2-expressible so the DuckDB oracle shares the exact formulas:

    * ``n_words``        = count of ``\\S+``
    * ``n_hash``         = count of ``#``; ``n_ellipsis`` = count of ``\\.\\.\\.``
    * ``symbol_ratio``   = (n_hash + n_ellipsis) / max(n_words, 1)
    * ``n_lines``        = 1 + count of ``\\n``; ``n_bullet_lines`` = lines
      starting with ``[-*•]``
    * ``bullet_ratio``   = n_bullet_lines / n_lines
    * ``has_stopword``   = matches ``(^|\\s)(the|and|of|to|in|is)(\\s|$)``
    * ``gopher_ok``      = n_words BETWEEN 10 AND 100000 AND mean word len
      in [2, 12] AND symbol_ratio < 0.1 AND bullet_ratio <= 0.9 AND
      has_stopword
    """
    import polars as pl

    s = pl.from_arrow(batch[column]).fill_null("")
    df = pl.DataFrame({"t": s}).select(
        pl.col("t").str.count_matches(r"\S+").cast(pl.Int64).alias("n_words"),
        pl.col("t").str.count_matches(r"\S").cast(pl.Int64).alias("_nonws"),
        pl.col("t").str.count_matches("#", literal=True).cast(pl.Int64).alias("_nh"),
        pl.col("t").str.count_matches(r"\.\.\.").cast(pl.Int64).alias("_ne"),
        (pl.col("t").str.count_matches(r"\n") + 1).cast(pl.Int64).alias("n_lines"),
        pl.col("t").str.count_matches(r"(?m)^[ \t]*[-*•]").cast(pl.Int64)
        .alias("_nb"),
        pl.col("t").str.contains(r"(^|\s)(the|and|of|to|in|is)(\s|$)")
        .alias("has_stopword"),
    ).with_columns(
        ((pl.col("_nh") + pl.col("_ne")) / pl.max_horizontal(pl.col("n_words"), 1))
        .alias("symbol_ratio"),
        (pl.col("_nb") / pl.col("n_lines")).alias("bullet_ratio"),
        (pl.col("_nonws") / pl.max_horizontal(pl.col("n_words"), 1))
        .alias("_mwl"),
    ).with_columns(
        (
            pl.col("n_words").is_between(10, 100000)
            & pl.col("_mwl").is_between(2, 12)
            & (pl.col("symbol_ratio") < 0.1)
            & (pl.col("bullet_ratio") <= 0.9)
            & pl.col("has_stopword")
        ).alias("gopher_ok")
    ).drop(["_nh", "_ne", "_nb", "_nonws", "_mwl"])
    res = batch
    for name in ("n_words", "n_lines", "has_stopword", "symbol_ratio",
                 "bullet_ratio", "gopher_ok"):
        if name in res.column_names:
            res = res.drop_columns([name])
        res = res.append_column(name, df[name].to_arrow())
    return res


def doc_salient_terms(ds, k: int = 5, column: str = "text",
                      id_column: str = "doc_id", num_partitions: int = 32):
    """Per-document top-``k`` salient terms — the keyword-extraction /
    corpus-statistics op a training pipeline uses for topic tagging.

    Salience is the INTEGER-exact tf-idf analog ``tf × (N_docs − df)``
    (term frequency × inverted document frequency as a plain difference):
    rankings track tf-idf while every comparison is exact int64 math, so
    the DuckDB oracle hash-compares bit-for-bit (a float ``ln(N/df)``
    differs in the last ulp between libms — see pipelines/queries
    docstring on scaled-integer aggregates).

    Scale shape: explode (doc, word) with per-batch tf pre-count →
    ``grouped_sum`` by (doc, word) → df per word from a global DISTINCT →
    one ``partition_join`` on word attaches df → per-doc top-k via ONE
    hash-partition pass keyed by the doc id.  Ties break on (term asc).
    Output: (id, term, tf:int64, df:int64, salience:int64, rank).
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import (
        broadcast_join,
        grouped_sum,
        hash_partition_apply,
    )

    # pin the projection once: count() + the explode below would otherwise
    # execute any upstream pipeline twice (same note as ngram_jaccard_pairs)
    ds = ds.select_columns([id_column, column]).materialize()
    n_docs = ds.count()

    def explode_tf(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).rename(
            {id_column: "_id", column: "t"}
        ).with_columns(
            pl.col("_id").cast(pl.Int64), pl.col("t").fill_null("")
        )
        return (
            df.select(pl.col("_id"), pl.col("t").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
            .group_by(["_id", "w"])
            .agg(pl.len().cast(pl.Int64).alias("_tf"))
            .rename({"w": "term", "_id": id_column})
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()), ("term", pa.string()),
                             ("_tf", pa.int64())]))
        )

    tf_partial = ds.map_batches(explode_tf, batch_format="pyarrow")
    tf = grouped_sum(
        tf_partial, [id_column, "term"],
        [pl.col("_tf").sum().alias("_tf")], {"tf": "_tf"},
        num_partitions=num_partitions,
    )
    # document frequency: tf's (doc, term) keys are already GLOBALLY unique
    # (grouped_sum co-partitions equal keys and finalizes one row per key),
    # so counting rows per term IS the distinct-doc count — no extra
    # distinct() exchange needed
    df_counts = grouped_sum(
        tf.select_columns([id_column, "term"]),
        ["term"],
        [pl.len().cast(pl.Int64).alias("_df")], {"df": "_df"},
        num_partitions=num_partitions,
    )
    # df_counts is vocab-sized (one row per term): broadcast-or-exchange —
    # map-side attach under the row budget, partition_join past it
    joined = broadcast_join(tf, df_counts, on=["term"], how="inner",
                            num_partitions=num_partitions)

    def topk_block(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part)
            .with_columns(
                (pl.col("tf") * (n_docs - pl.col("df"))).alias("salience")
            )
            .sort([id_column, "salience", "term"],
                  descending=[False, True, False])
            .group_by(id_column, maintain_order=True)
            .head(k)
            .with_columns(
                pl.int_range(1, pl.len() + 1).over(id_column).alias("rank")
            )
            .select([id_column, "term", "tf", "df", "salience", "rank"])
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()), ("term", pa.string()),
                             ("tf", pa.int64()), ("df", pa.int64()),
                             ("salience", pa.int64()), ("rank", pa.int64())]))
        )

    return hash_partition_apply(joined, [id_column], topk_block,
                                num_partitions=num_partitions)


def word_commonness(ds, column: str = "text", id_column: str = "doc_id",
                    num_partitions: int = 32):
    """Unigram corpus-frequency fluency score — the integer-exact analog
    of the CCNet/KenLM perplexity filter: a doc whose words are globally
    frequent scores high (fluent/common prose), a doc of rare junk tokens
    scores low.  Per doc: ``commonness_sum = Σ_w tf(w) · corpus_count(w)``
    and ``mean_commonness = commonness_sum / n_tokens``.  All ranking
    happens in int64 (the float mean is one final division both engines
    compute from the same integers, so the oracle hash-compares exactly;
    a float ``log p(w)`` sum would differ in the last ulp between libms).

    Scale shape — TWO exchanges total (round-3 rework; the round-2 plan
    spent four plus a recomputed input and benched 10 s at sf0.1):
    because equal (doc, word) pairs are co-partitioned whenever the
    partition key is the word ALONE, one word-hash exchange suffices for
    per-doc tf finalize AND the corpus count AND the weighting — the
    corpus count of a word is word-local, a polars window sum inside the
    partition.  Per-batch tf pre-count is the combiner (a hot word adds
    ≤ num_blocks rows to its partition, never its corpus frequency);
    per-doc totals then take one more doc-keyed ``grouped_sum``.  The
    vocabulary is never exchanged separately and the corpus never
    rescanned.  Docs with zero tokens have no (doc, word) rows and are
    absent from the output (the oracle mirrors this).
    Output: (id, n_tokens, commonness_sum, mean_commonness).
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import (
        grouped_sum,
        hash_partition_apply,
    )

    ds = ds.select_columns([id_column, column])

    def explode_tf(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).rename(
            {id_column: "_id", column: "t"}
        ).with_columns(
            pl.col("_id").cast(pl.Int64), pl.col("t").fill_null("")
        )
        return (
            df.select(pl.col("_id"), pl.col("t").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
            .group_by(["_id", "w"])
            .agg(pl.len().cast(pl.Int64).alias("_tf"))
            .rename({"_id": id_column, "w": "term"})
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()), ("term", pa.string()),
                             ("_tf", pa.int64())]))
        )

    def weigh_partition(part: pa.Table) -> pa.Table:
        # all rows of any word live here → finalize tf, count the corpus,
        # and weight, in one vectorized pass
        df = (
            pl.from_arrow(part)
            .group_by([id_column, "term"])
            .agg(pl.col("_tf").sum().alias("tf"))
            .with_columns(pl.col("tf").sum().over("term").alias("corpus_n"))
        )
        return df.select(
            pl.col(id_column),
            pl.col("tf").alias("_nt"),
            (pl.col("tf") * pl.col("corpus_n")).alias("_cs"),
        ).to_arrow()

    weighted = hash_partition_apply(
        ds.map_batches(explode_tf, batch_format="pyarrow"),
        ["term"], weigh_partition, num_partitions=num_partitions,
    )
    totals = grouped_sum(
        weighted,
        [id_column],
        [pl.col("_nt").sum().alias("_nt"), pl.col("_cs").sum().alias("_cs")],
        {"n_tokens": "_nt", "commonness_sum": "_cs"},
        num_partitions=num_partitions,
    )

    def add_mean(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.with_columns(
            (pl.col("commonness_sum").cast(pl.Float64)
             / pl.col("n_tokens")).alias("mean_commonness")
        ).to_arrow().cast(
            pa.schema([(id_column, pa.int64()), ("n_tokens", pa.int64()),
                       ("commonness_sum", pa.int64()),
                       ("mean_commonness", pa.float64())])
        )

    return totals.map_batches(add_mean, batch_format="pyarrow")


def quality_tiers(ds, column: str = "text", id_column: str = "doc_id",
                  extract: str | None = None, num_partitions: int = 32):
    """CCNet-style corpus tiering (Wenzek et al. 2020: bucket a crawl
    into head/middle/tail by language-model score terciles, then train
    on the head) — the "tier extraction" step of a web-text pipeline,
    on this engine's integer-exact fluency score.

    Per doc: ``int_mean = commonness_sum // n_tokens`` (the
    :func:`word_commonness` integers; floor division keeps every
    boundary comparison in int64 — no float quantiles anywhere).
    Tercile boundaries use the ``quantile_disc`` discrete rule
    (1-based index ``max(1, ceil(q·n))`` — the :func:`token_quantiles`
    convention, verified against DuckDB), then
    ``tier = tail | middle | head`` by ``int_mean <= boundary``.
    Zero-token docs have no score and are absent (oracle mirrors).

    Scale shape: the scored table is a NARROW two-int64 projection of
    the corpus, materialized once between the two passes it feeds
    (boundary histogram + assignment) — the accepted two-pass-scan cost,
    same as ``packing.pack_sequences``' counts projection.  The
    boundary histogram exchange is keyed by the score VALUE (cardinality
    = distinct integer means, vocabulary-scale, never corpus-scale); the
    driver holds only the cumsummed histogram; assignment is a pure
    per-batch map against two broadcast int64s.

    ``extract="head"`` (or any tier) returns only that tier's docs —
    the actual extraction; default returns every doc labeled.
    Output: (id, int_mean, tier).
    """
    import math

    import polars as pl

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import collect_to_table

    tiers = ("tail", "middle", "head")
    if extract is not None and extract not in tiers:
        raise ValueError(f"extract must be one of {tiers} (got {extract!r})")

    def to_int_mean(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            pl.col(id_column),
            (pl.col("commonness_sum") // pl.col("n_tokens"))
            .alias("int_mean"),
        ).to_arrow().cast(pa.schema([(id_column, pa.int64()),
                                     ("int_mean", pa.int64())]))

    scored = (
        word_commonness(ds, column=column, id_column=id_column,
                        num_partitions=num_partitions)
        .map_batches(to_int_mean, batch_format="pyarrow")
        .materialize()
    )

    hist = collect_to_table(
        grouped_sum(
            scored, ["int_mean"],
            [pl.len().cast(pl.Int64).alias("_n")], {"n_docs": "_n"},
            num_partitions=16,
        ),
        empty_schema=pa.schema([("int_mean", pa.int64()),
                                ("n_docs", pa.int64())]),
    )
    out_schema = pa.schema([(id_column, pa.int64()),
                            ("int_mean", pa.int64()),
                            ("tier", pa.string())])
    if hist.num_rows == 0:
        import ray.data

        return ray.data.from_arrow(out_schema.empty_table())
    df = pl.from_arrow(hist).sort("int_mean")
    values = df["int_mean"].to_list()
    cums = df["n_docs"].cum_sum().to_list()
    total = cums[-1]
    b1, b2 = (
        next(v for v, c in zip(values, cums)
             if c >= max(1, math.ceil(q * total)))
        for q in (1.0 / 3, 2.0 / 3)
    )

    def assign(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            pl.when(pl.col("int_mean") <= b1).then(pl.lit("tail"))
            .when(pl.col("int_mean") <= b2).then(pl.lit("middle"))
            .otherwise(pl.lit("head")).alias("tier")
        )
        if extract is not None:
            df = df.filter(pl.col("tier") == extract)
        return df.to_arrow().cast(out_schema)

    return scored.map_batches(assign, batch_format="pyarrow")


# language-ID heuristic: unicode-script ranges for CJK/Hangul, stopword hit
# rates for latin languages.  Deterministic; rows-only oracle.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "para"},
}


class LangId:
    """Actor-pool language-ID stage (stateful: tables built once per actor).

    The M20 lang-mapping + engine-dispatch analog (translation/utils.py:11-48)
    recast as a detection operator a web corpus needs.  The batch path is
    fully vectorized (polars regex counts for the script ranges + list-eval
    stopword hits, numpy for the decision) — ``detect_one`` is the frozen
    scalar spec it must match (pinned by a property test).
    """

    _STRIP = ".,;:!?\"'()"

    def __init__(self, column: str = "text") -> None:
        self._column = column
        self._stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self._stop_lists = {lang: sorted(ws) for lang, ws in _STOPWORDS.items()}
        self._langs = list(_STOPWORDS)  # decision order = insertion order

    def detect_one(self, text: str) -> str:
        if not text:
            return "und"
        n = len(text)
        hangul = sum(1 for c in text if "가" <= c <= "힯")
        kana = sum(1 for c in text if "぀" <= c <= "ヿ")
        han = sum(1 for c in text if "一" <= c <= "鿿")
        if hangul / n > 0.1:
            return "ko"
        if kana / n > 0.05:
            return "ja"
        if han / n > 0.1:
            return "zh"
        toks = [w.strip(self._STRIP).lower() for w in text.split()]
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang, stop in self._stop.items():
            hits = sum(1 for t in toks if t in stop)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        n_rows = batch.num_rows
        if n_rows == 0:
            return batch.append_column("lang_pred", pa.array([], pa.string()))
        s = pl.Series(batch[self._column].to_pylist(), dtype=pl.String).fill_null("")
        df = pl.DataFrame({"t": s})
        m = df.select(
            pl.col("t").str.len_chars().cast(pl.Int64).alias("_n"),
            pl.col("t").str.count_matches(r"[가-힯]").cast(pl.Int64).alias("_hang"),
            pl.col("t").str.count_matches(r"[぀-ヿ]").cast(pl.Int64).alias("_kana"),
            pl.col("t").str.count_matches(r"[一-鿿]").cast(pl.Int64).alias("_han"),
        )
        # stopword hits: explode tokens ONCE, normalize once, then one
        # grouped pass with an is_in per language (4 vectorized membership
        # tests over the flat token column — no per-list evaluation)
        toks = (
            df.with_row_index("_r")
            .select(pl.col("_r"), pl.col("t").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
            .with_columns(
                pl.col("w").str.strip_chars(self._STRIP)
                .str.to_lowercase().alias("_nw")
            )
        )
        hits = np.zeros((len(self._langs), n_rows), dtype=np.int64)
        if toks.height:
            agg = toks.group_by("_r").agg(
                *[pl.col("_nw").is_in(self._stop_lists[lang]).sum()
                  .cast(pl.Int64).alias(f"_h_{lang}") for lang in self._langs]
            )
            ridx = agg["_r"].to_numpy().astype(np.int64)
            for li, lang in enumerate(self._langs):
                hits[li, ridx] = agg[f"_h_{lang}"].to_numpy()
        n = m["_n"].to_numpy().astype(np.float64)
        safe_n = np.maximum(n, 1.0)
        best_idx = np.argmax(hits, axis=0)  # first max wins = insertion order
        best_hits = hits[best_idx, np.arange(n_rows)]
        lang_arr = np.array(self._langs, dtype=object)
        out = np.where(best_hits > 0, lang_arr[best_idx], "und").astype(object)
        out[(m["_han"].to_numpy() / safe_n) > 0.1] = "zh"
        out[(m["_kana"].to_numpy() / safe_n) > 0.05] = "ja"
        out[(m["_hang"].to_numpy() / safe_n) > 0.1] = "ko"
        out[n == 0] = "und"
        return batch.append_column(
            "lang_pred", pa.array(out.tolist(), pa.string())
        )


class LangMix:
    """Mixed-language document detection — the per-LINE langid vote.

    CCNet keeps per-document language labels, but web pages are often
    bilingual (navigation in one language, body in another; comment
    sections; boilerplate-translated shops) and a single doc-level
    label silently mislabels half the tokens.  This stage runs the
    SAME frozen :class:`LangId` decision chain per line, then votes:

        main_lang  — the plurality line language (ties → smallest
                     lang string, deterministic)
        n_lines    — non-empty lines
        main_pct   — ``100 * plurality_count // n_lines``
        is_mixed   — ``main_pct < min_main_pct`` (default 70)

    Zero exchanges: each document row arrives whole in one batch, so
    the explode → per-line LangId → per-doc vote all happen inside one
    ``map_batches`` call (actor pool — LangId's stopword tables build
    once per actor).  Documents with no non-empty lines are omitted.
    """

    def __init__(self, id_column: str = "doc_id", column: str = "text",
                 min_main_pct: int = 70) -> None:
        self._id, self._col = id_column, column
        self._pct = min_main_pct
        self._lid = LangId(column="_line")

    _OUT = pa.schema([
        ("doc_id", pa.int64()), ("main_lang", pa.string()),
        ("n_lines", pa.int64()), ("main_pct", pa.int64()),
        ("is_mixed", pa.bool_()),
    ])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        lines = (
            pl.from_arrow(batch.select([self._id, self._col]))
            .rename({self._id: "_id", self._col: "_t"})
            .with_columns(pl.col("_id").cast(pl.Int64),
                          pl.col("_t").fill_null(""))
            .with_columns(pl.col("_t").str.split("\n").alias("_line"))
            .explode("_line")
            .with_columns(pl.col("_line").str.strip_chars(" \t\r"))
            .filter(pl.col("_line") != "")
            .select("_id", "_line")
        )
        if lines.height == 0:
            return self._OUT.empty_table()
        tagged = self._lid(lines.to_arrow())
        out = (
            pl.from_arrow(tagged)
            .group_by(["_id", "lang_pred"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .sort(["_id", "cnt", "lang_pred"],
                  descending=[False, True, False])
            .with_columns(
                pl.col("cnt").sum().over("_id").alias("n_lines"))
            .group_by("_id", maintain_order=True)
            .agg(pl.first("lang_pred").alias("main_lang"),
                 pl.first("n_lines").alias("n_lines"),
                 pl.first("cnt").alias("_top"))
            .with_columns(
                (100 * pl.col("_top") // pl.col("n_lines"))
                .alias("main_pct"))
            .with_columns((pl.col("main_pct") < self._pct)
                          .alias("is_mixed"))
            .rename({"_id": "doc_id"})
            .select(["doc_id", "main_lang", "n_lines", "main_pct",
                     "is_mixed"])
        )
        return out.to_arrow().cast(self._OUT)


def lang_mix(ds, id_column: str = "doc_id", column: str = "text",
             min_main_pct: int = 70, concurrency=None):
    """Dataset op: per-document line-language vote (see
    :class:`LangMix`).  Map-only — no shuffle anywhere."""
    from docling_translate_ray.util import auto_pool_size

    return ds.select_columns([id_column, column]).map_batches(
        LangMix, fn_constructor_kwargs={
            "id_column": id_column, "column": column,
            "min_main_pct": min_main_pct},
        batch_format="pyarrow",
        concurrency=concurrency or auto_pool_size(),
    )


def heavy_hitters(ds, column: str = "text", theta_bp: int = 300,
                  num_partitions: int = 32) -> pa.Table:
    """EXACT frequent-token mining (heavy hitters) without counting the
    whole vocabulary: candidate generation + exact recount.

    A token whose global share is ≥ ``theta_bp`` basis points must have a
    local share ≥ ``theta_bp`` in at least one batch (averaging argument
    over ``Σc_b / Σn_b`` — all-integer comparison ``10000·c ≥ θ·n`` on
    both levels, so the guarantee is exact, not approximate).  So:

    * pass 1: per batch, count tokens and keep those with local share ≥ θ
      — at most ``10000/θ`` candidates per batch, a tiny driver collect;
    * pass 2: recount ONLY the broadcast candidate set exactly (per-batch
      combiner → one narrow grouped_sum), with the per-batch token total
      riding along as a null-word row, and apply the global threshold.

    Output equals SQL ``HAVING 10000*count >= θ*total`` exactly — the
    vocabulary-sized shuffle of a full ``top_words`` never happens.
    Returns a pyarrow Table (word, n_occurrences).
    """
    import polars as pl

    import ray

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import collect_to_table

    tok_schema = pa.schema([("word", pa.string())])

    def candidates(batch: pa.Table) -> pa.Table:
        w = (
            pl.from_arrow(batch)
            .select(pl.col(column).fill_null("").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
        )
        nb = w.height
        if nb == 0:
            return tok_schema.empty_table()
        return (
            w.group_by("w").agg(pl.len().cast(pl.Int64).alias("c"))
            .filter(10000 * pl.col("c") >= theta_bp * nb)
            .select(pl.col("w").alias("word"))
            .to_arrow().cast(tok_schema)
        )

    cand = collect_to_table(
        ds.map_batches(candidates, batch_format="pyarrow"),
        empty_schema=tok_schema,
    )
    cand_ref = ray.put(
        pa.table({"word": pa.array(sorted(set(cand["word"].to_pylist())),
                                   pa.string())})
    )

    def recount(batch: pa.Table) -> pa.Table:
        cands = pl.from_arrow(ray.get(cand_ref))["word"]
        w = (
            pl.from_arrow(batch)
            .select(pl.col(column).fill_null("").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
        )
        counts = (
            w.filter(pl.col("w").is_in(cands))
            .group_by("w").agg(pl.len().cast(pl.Int64).alias("_c"))
            .rename({"w": "word"})
        )
        total = pl.DataFrame({
            "word": pl.Series([None], dtype=pl.String),
            "_c": pl.Series([w.height], dtype=pl.Int64),
        })
        return pl.concat([counts, total]).to_arrow().cast(
            pa.schema([("word", pa.string()), ("_c", pa.int64())])
        )

    out = collect_to_table(
        grouped_sum(
            ds.map_batches(recount, batch_format="pyarrow"),
            ["word"],
            [pl.col("_c").sum().alias("_c")],
            {"n_occurrences": "_c"},
            num_partitions=num_partitions,
        ),
        empty_schema=pa.schema([("word", pa.string()),
                                ("n_occurrences", pa.int64())]),
    )
    df = pl.from_arrow(out)
    n_total = int(df.filter(pl.col("word").is_null())["n_occurrences"].sum())
    return (
        df.filter(
            pl.col("word").is_not_null()
            & (10000 * pl.col("n_occurrences") >= theta_bp * n_total)
        )
        .to_arrow()
        .cast(pa.schema([("word", pa.string()), ("n_occurrences", pa.int64())]))
    )


def badwords_flag_batch(batch: pa.Table, words: list[str],
                        column: str = "text",
                        mode: str = "word") -> pa.Table:
    """C4-style blocklist flagging (the "List of Dirty, Naughty ..."
    filter every web-curation pipeline runs): append ``badword_hit``
    per row.

    * ``mode="word"`` — hit when any LOWERCASED whitespace token
      equals a blocklist word (the repo's lockstep ``\\S+`` tokenizer;
      DuckDB parity = ``list_has_any(regexp_extract_all(lower(text),
      '@NONWS@'), [...])``, pinned in pytest);
    * ``mode="substring"`` — hit when the lowercased text CONTAINS any
      blocklist string (polars ``contains_any`` — Aho-Corasick, one
      scan for the whole list).

    Pure per-batch vectorized map: the blocklist is bound into the
    closure (callers broadcast it once per actor via the usual
    map_batches capture), no shuffle, scales linearly with docs.
    """
    import polars as pl

    if mode not in ("word", "substring"):
        raise ValueError(f"mode must be 'word' or 'substring' (got {mode!r})")
    lowered = [w.lower() for w in words]
    df = pl.from_arrow(batch)
    low = pl.col(column).fill_null("").str.to_lowercase()
    if mode == "word":
        hit = (low.str.extract_all(r"\S+")
               .list.eval(pl.element().is_in(lowered)).list.any())
    else:
        hit = low.str.contains_any(lowered)
    out = df.with_columns(hit.fill_null(False).alias("badword_hit"))
    return out.to_arrow().cast(pa.schema(
        list(batch.schema) + [pa.field("badword_hit", pa.bool_())]))
