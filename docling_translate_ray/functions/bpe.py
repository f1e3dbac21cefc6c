"""Distributed BPE merge-pair counting — the first merge step of
byte-pair-encoding tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"): count every
adjacent symbol pair across the corpus (weighted by occurrence) and
rank candidates for the next merge.

Symbols here are unicode code points inside whitespace tokens (the
repo's lockstep ``\\S+`` tokenizer); a word of length L contributes its
L−1 adjacent pairs WITH multiplicity ("aaa" yields "aa" twice), which
is exactly what the DuckDB oracle's ``substr(w, i, 2)`` per position
computes — Python slicing and DuckDB ``substr``/``length`` are both
code-point-based, so the two engines agree on every CJK/emoji token.

Scale shape: the per-batch combiner tokenizes vectorized (polars
``extract_all``), folds to batch-local word frequencies, then loops
only the batch-UNIQUE words in Python to fold pairs×frequency into a
dict (the md5-over-unique-tokens convention of ``functions/dsir``) —
the exchange carries one ``(pair, count)`` row per (batch, pair),
pair-vocabulary-sized, never corpus-sized.  One ``grouped_sum`` by
pair, then local-top-k → k-bounded driver merge (no global sort), the
``q_top_words`` pattern.  Full BPE training iterates this with a merge
table broadcast per round; one round is the primitive.

Reference parity note: the reference repo tokenizes with pretrained
model tokenizers; corpus-level tokenizer TRAINING prep is part of the
beyond-reference training-data operator suite.
"""

from __future__ import annotations

import pyarrow as pa

_PARTIAL_SCHEMA = pa.schema([
    ("pair", pa.string()),
    ("_n", pa.int64()),
])


def _pair_partial(column: str):
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "t": pl.Series(batch[column].to_pylist(),
                           dtype=pl.String).fill_null("")
        })
        words = (
            df.select(pl.col("t").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
            .group_by("w")
            .agg(pl.len().cast(pl.Int64).alias("f"))
        )
        acc: dict[str, int] = {}
        for w, f in zip(words["w"], words["f"]):
            for i in range(len(w) - 1):
                p = w[i:i + 2]
                acc[p] = acc.get(p, 0) + f
        if not acc:
            return _PARTIAL_SCHEMA.empty_table()
        return pa.table({
            "pair": pa.array(list(acc.keys()), pa.string()),
            "_n": pa.array(list(acc.values()), pa.int64()),
        })

    return fn


def bpe_pair_counts(ds, k: int = 50, column: str = "text",
                    num_partitions: int = 32) -> pa.Table:
    """Top-``k`` adjacent-symbol pairs by corpus count (ties broken on
    the pair string ascending).  Returns a small Arrow table
    ``(pair, n_occurrences)`` — the merge-candidate ranking."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.state.checkpoint import normalize_arrow_types
    from docling_translate_ray.util import collect_to_table

    counts = grouped_sum(
        ds.map_batches(_pair_partial(column), batch_format="pyarrow"),
        ["pair"],
        [pl.col("_n").sum().alias("_n")],
        {"n_occurrences": "_n"},
        num_partitions=num_partitions,
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .sort(["n_occurrences", "pair"], descending=[True, False])
            .head(k)
            .to_arrow()
        )

    cand = collect_to_table(
        counts.map_batches(local_topk, batch_format="pyarrow"),
        empty_schema=pa.schema([("pair", pa.string()),
                                ("n_occurrences", pa.int64())]),
    )
    top = (
        pl.from_arrow(cand)
        .sort(["n_occurrences", "pair"], descending=[True, False])
        .head(k)
        .to_arrow()
    )
    return normalize_arrow_types(top)
