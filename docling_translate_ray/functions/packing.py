"""Sequence packing — the concatenate-then-chunk layout step of an LLM
training-data pipeline: assign every document a global token offset in
``id`` order, then ``seq_id = offset // capacity`` (the training sequence
the doc STARTS in) and ``seq_offset = offset % capacity``.

The core is a **distributed exclusive prefix sum** (a scan — the one
classic data-parallel primitive a groupby cannot express):

1. one narrow pass computes ``(id, n_tokens, range_bucket)`` per doc
   (``bucket = id // bucket_width`` — ids need NOT be dense, buckets may
   be ragged or empty);
2. per-bucket token totals flow through one ``grouped_sum`` exchange; the
   driver holds only ``n_buckets`` rows (≈ id_range / bucket_width; 10k
   rows for 10⁹ docs at the default width) and cumsums them into
   per-bucket base offsets, broadcast once via ``ray.put``;
3. one hash-partition exchange keyed by bucket: each partition sorts its
   buckets' rows by id, vectorized-cumsums within the bucket, and adds
   the bucket base — every offset is globally exact.

The narrow counts projection (2×int64/row) is materialized between the
two passes so token counting runs once; at 10⁹ docs that is ~16 GB in the
object store (spillable), the accepted cost of any two-pass scan.
"""

from __future__ import annotations

import pyarrow as pa

_COUNTS_SCHEMA_COLS = ["n_tokens", "_bucket"]


def chunk_docs_batch(batch: pa.Table, window: int = 64, stride: int = 48,
                     id_column: str = "doc_id",
                     column: str = "text") -> pa.Table:
    """Overlapping fixed-token chunking (the RAG/embedding layout step):
    explode each doc into windows of ``window`` tokens starting every
    ``stride`` tokens (final window may be short; empty docs emit no
    chunks).  Pure per-row explode — no shuffle, no state; scale is
    block-parallel by construction.

    Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    import polars as pl

    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window (got {stride}, {window})")
    out_schema = pa.schema(
        [
            (id_column, pa.int64()),
            ("chunk_id", pa.int64()),
            ("n_chunk_tokens", pa.int64()),
            ("chunk_text", pa.string()),
        ]
    )
    s = pl.from_arrow(batch[column]).fill_null("")
    ids = pl.from_arrow(batch[id_column]).cast(pl.Int64)
    exploded = (
        pl.DataFrame({id_column: ids, "t": s})
        .with_columns(
            # explicit inner dtype: a batch of all-empty texts otherwise
            # degrades ws to list[null] and list.join fails
            pl.col("t").str.extract_all(r"\S+").cast(pl.List(pl.String)).alias("ws")
        )
        .with_columns(pl.col("ws").list.len().cast(pl.Int64).alias("_n"))
        .with_columns(
            pl.int_ranges(0, (pl.col("_n") + stride - 1) // stride).alias("chunk_id")
        )
        .explode("chunk_id")
        .drop_nulls("chunk_id")  # 0-token docs explode to a null chunk row
    )
    if exploded.height == 0:
        # polars quirk: expression-offset list.slice on a 0-row frame
        # degrades to List(Null) even under an explicit cast, so
        # short-circuit all-empty batches with the declared schema
        return out_schema.empty_table()
    out = (
        exploded
        .with_columns(
            pl.col("ws")
            .list.slice(pl.col("chunk_id") * stride, window)
            .alias("_chunk")
        )
        .with_columns(
            pl.col("_chunk").list.len().cast(pl.Int64).alias("n_chunk_tokens"),
            pl.col("_chunk").list.join(" ").alias("chunk_text"),
        )
        .select([id_column, "chunk_id", "n_chunk_tokens", "chunk_text"])
    )
    return out.to_arrow().cast(out_schema)


def pack_sequences(ds, capacity: int = 512, id_column: str = "doc_id",
                   column: str = "text", bucket_width: int = 100_000,
                   num_partitions: int = 32):
    """Returns a Dataset (id, n_tokens, tok_offset, seq_id, seq_offset)
    where ``tok_offset`` is the exclusive prefix sum of ``n_tokens`` in
    ascending ``id_column`` order."""
    import polars as pl
    import ray

    from docling_translate_ray.stages.shuffle import grouped_sum, hash_partition_apply
    from docling_translate_ray.util import collect_to_table

    if capacity <= 0:
        raise ValueError(f"capacity must be positive (got {capacity})")

    def counts_batch(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[column]).fill_null("")
        ids = pl.from_arrow(batch[id_column]).cast(pl.Int64)
        return (
            pl.DataFrame(
                {
                    id_column: ids,
                    "n_tokens": s.str.count_matches(r"\S+").cast(pl.Int64),
                }
            )
            .with_columns((pl.col(id_column) // bucket_width).alias("_bucket"))
            .to_arrow()
        )

    counts = ds.map_batches(counts_batch, batch_format="pyarrow").materialize()

    bucket_sums = collect_to_table(
        grouped_sum(
            counts,
            ["_bucket"],
            [pl.col("n_tokens").sum().alias("_s")],
            {"total": "_s"},
            num_partitions=min(num_partitions, 16),
        ),
        empty_schema=pa.schema([("_bucket", pa.int64()), ("total", pa.int64())]),
    )
    sdf = pl.from_arrow(bucket_sums).sort("_bucket")
    bases = sdf.select(
        "_bucket", (pl.col("total").cum_sum() - pl.col("total")).alias("_base")
    )
    bases_ref = ray.put(bases.to_arrow())

    def finalize(part: pa.Table) -> pa.Table:
        b = pl.from_arrow(ray.get(bases_ref))
        df = (
            pl.from_arrow(part)
            .sort(id_column)
            .join(b, on="_bucket", how="left")
            .with_columns(
                (
                    pl.col("n_tokens").cum_sum().over("_bucket")
                    - pl.col("n_tokens")
                    + pl.col("_base")
                ).alias("tok_offset")
            )
            .with_columns(
                (pl.col("tok_offset") // capacity).alias("seq_id"),
                (pl.col("tok_offset") % capacity).alias("seq_offset"),
            )
        )
        return df.select(
            [id_column, "n_tokens", "tok_offset", "seq_id", "seq_offset"]
        ).to_arrow().cast(
            pa.schema(
                [
                    (id_column, pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("tok_offset", pa.int64()),
                    ("seq_id", pa.int64()),
                    ("seq_offset", pa.int64()),
                ]
            )
        )

    return hash_partition_apply(counts, ["_bucket"], finalize, num_partitions)


def token_budget_select(ds, budget_tokens: int | None = None,
                        budget_pct: int | None = None,
                        score_column: str = "score",
                        token_column: str = "n_tokens",
                        id_column: str = "doc_id",
                        num_partitions: int = 32,
                        max_boundary_rows: int = 2_000_000):
    """Corpus selection under a token budget — the data-mixing primitive
    "take the best documents until the training budget is full": exactly
    the rows a global ``ORDER BY score DESC, id ASC`` with an inclusive
    running token sum ≤ budget would keep, computed WITHOUT a global sort
    by threshold refinement:

    1. one ``grouped_sum`` by score → the score-cardinality table
       ``(score, Σtokens)`` (distinct scores ≪ docs — the only exchange);
    2. the driver sorts that SMALL table, cumsums, and finds the boundary
       score ``s*``: every doc with ``score > s*`` is fully in;
    3. the single boundary group (``score == s*``) is collected
       (``(id, tokens)`` rows of ONE group — bounded; loud failure past
       ``max_boundary_rows``, the fenced-exact-tool convention) and its
       by-id prefix fills the remaining budget;
    4. one broadcast filter keeps ``score > s*`` rows plus the boundary
       prefix ids.

    ``budget_pct`` (of the corpus' total tokens, integer floor division)
    makes the budget scale-free; pass ``budget_tokens`` for an absolute
    cap.  Ties are deterministic (score desc, id asc on both engines).
    Output: ``(id, score, n_tokens)`` of the selected docs.
    """
    import polars as pl

    import ray

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import collect_to_table

    if (budget_tokens is None) == (budget_pct is None):
        raise ValueError("pass exactly one of budget_tokens / budget_pct")

    narrow = ds.select_columns([id_column, score_column, token_column])

    score_tbl = collect_to_table(
        grouped_sum(
            narrow.map_batches(
                lambda b: b.select([score_column, token_column])
                .rename_columns([score_column, "_t"]),
                batch_format="pyarrow",
            ),
            [score_column],
            [pl.col("_t").sum().alias("_t")], {"toks": "_t"},
            num_partitions=num_partitions,
        ),
        empty_schema=pa.schema([(score_column, pa.int64()),
                                ("toks", pa.int64())]),
    )
    groups = pl.from_arrow(score_tbl).sort(score_column, descending=True)
    total = int(groups["toks"].sum()) if groups.height else 0
    budget = budget_tokens if budget_tokens is not None \
        else total * budget_pct // 100

    run = 0
    s_star = None  # boundary score; None = everything fits
    remaining = 0
    for score, toks in groups.iter_rows():
        if run + toks <= budget:
            run += toks
            continue
        s_star = score
        remaining = budget - run
        break

    sel_schema = pa.schema([(id_column, pa.int64()),
                            (score_column, pa.int64()),
                            (token_column, pa.int64())])
    if s_star is None:
        return narrow  # whole corpus fits the budget

    def boundary_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch[score_column], s_star))

    btbl = collect_to_table(
        narrow.map_batches(boundary_rows, batch_format="pyarrow"),
        empty_schema=sel_schema,
    )
    if btbl.num_rows > max_boundary_rows:
        raise ValueError(
            f"boundary score group has {btbl.num_rows} rows "
            f"(> max_boundary_rows={max_boundary_rows}): score resolution "
            "is too coarse for driver-side refinement — use a finer score"
        )
    bdf = pl.from_arrow(btbl).sort(id_column)
    keep_mask = bdf[token_column].cum_sum() <= remaining
    boundary_ids = bdf.filter(keep_mask)[id_column].to_list()
    ids_ref = ray.put(pa.array(boundary_ids, pa.int64()))

    def select(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _ray

        keep = pc.or_(
            pc.greater(batch[score_column], s_star),
            pc.is_in(batch[id_column], value_set=_ray.get(ids_ref)),
        )
        return batch.filter(keep)

    return narrow.map_batches(select, batch_format="pyarrow")
