"""Bigram language-model fluency scoring — the integer-exact analog of
the CCNet/KenLM perplexity filter at the bigram level.

Model: CCNet (Wenzek et al. 2020) scores every document with a 5-gram
KenLM and keeps/buckets by perplexity; the signal is "how predictable
is each next token given its context".  A float ``Σ log p(w2|w1)``
cannot be hash-compared across engines (last-ulp libm drift), so this
is the repo's integer-exact reformulation (same convention as
``functions/dsir.py`` and ``text_stats.word_commonness``): the
add-one-smoothed conditional probability of each bigram is scaled to
an integer

    S[w1,w2] = ((c2[w1,w2] + 1) * SCALE) // (c1[w1] + V)

where ``c2`` is the corpus bigram count, ``c1[w1] = Σ_w2 c2[w1,w2]``
is the bigram-CONTEXT count of ``w1`` (exactly the conditional
denominator), ``V`` is the number of distinct context types (the
add-one support), and ``//`` is floor division over arbitrary-
precision integers (HUGEINT in the DuckDB oracle).  A document's
score is ``Σ cnt_doc(w1,w2) · S[w1,w2]`` — monotone per-bigram in the
same direction as the log-probability, deterministic, exactly
reproducible in SQL.  High ``lm_avg`` = predictable/fluent prose; low
= rare-junk token soup (the CCNet "tail").

Scale shape — the corpus is tokenized ONCE; three exchanges total,
none carrying text:

1. per-batch combiner: explode adjacent-token bigrams, collapse to the
   narrow feature table ``(doc_id, w1, w2, cnt)``, persisted to Parquet
   once (resumable; read twice, never re-tokenized);
2. ``V``: batch-distinct ``w1`` → one vocabulary-sized exchange of
   single short keys → a driver-held int;
3. the w1-keyed exchange: because every row of a context ``w1`` is
   co-partitioned when the partition key is ``w1`` ALONE, ``c2``
   (window over (w1,w2)), ``c1`` (window over w1) and the weighting
   are all partition-local — the ``word_commonness`` exchange-collapse
   applied to bigrams.  Payload per row: one int id, two token keys,
   one count;
4. a doc-keyed ``grouped_sum`` finalizes ``(n_bigrams, lm_score)``.

``hash_keys=True`` is the 100 TB payload mode (the ``dup_span_mask``
lesson): tokens are xxhashed to int64 right after the tokenizer, so
the two exchanges carry ``(int64, int64)`` keys instead of strings
(~4× narrower on web text).  Collisions merge two contexts'
statistics — a smoothing-like perturbation, vanishing at 2^64 — so
the string mode stays the oracle-lockstep definition and the hashed
mode is parity-tested against it.

Reference parity note: the reference repo has no LM-quality stage;
beyond-reference training-data operator suite (CCNet perplexity
bucketing is the published model).
"""

from __future__ import annotations

import pyarrow as pa

_SCALE = 1_000_000

_FEAT_FIELDS = [("doc_id", pa.int64()), ("cnt", pa.int64())]


def _feature_schema(hash_keys: bool) -> pa.Schema:
    kt = pa.int64() if hash_keys else pa.string()
    return pa.schema([("doc_id", pa.int64()), ("w1", kt), ("w2", kt),
                      ("cnt", pa.int64())])


def _explode_bigrams(id_column: str, column: str, hash_keys: bool):
    """Per-batch combiner: tokenize (``\\S+`` — the repo's lockstep word
    tokenizer), form adjacent-pair bigrams via two list slices exploded
    in lockstep, collapse to ``(doc_id, w1, w2, cnt)``.  Docs with < 2
    tokens contribute no rows (the oracle mirrors this)."""
    schema = _feature_schema(hash_keys)

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch.select([id_column, column]))
            .rename({id_column: "_id", column: "_t"})
            .with_columns(pl.col("_id").cast(pl.Int64),
                          pl.col("_t").fill_null(""))
            .select("_id", pl.col("_t").str.extract_all(r"\S+").alias("ws"))
            .filter(pl.col("ws").list.len() >= 2)
        )
        if df.height == 0:
            return schema.empty_table()
        out = (
            df.with_columns(
                pl.col("ws").list.slice(0, pl.col("ws").list.len() - 1)
                .alias("w1"),
                pl.col("ws").list.slice(1).alias("w2"),
            )
            .drop("ws")
            .explode(["w1", "w2"])
        )
        if hash_keys:
            out = out.with_columns(
                pl.col("w1").hash(seed=7).reinterpret(signed=True),
                pl.col("w2").hash(seed=7).reinterpret(signed=True),
            )
        return (
            out.group_by(["_id", "w1", "w2"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .rename({"_id": "doc_id"})
            .select(["doc_id", "w1", "w2", "cnt"])
            .to_arrow()
            .cast(schema)
        )

    return fn


def bigram_lm_score(ds, scratch_dir: str, id_column: str = "doc_id",
                    column: str = "text", num_partitions: int = 32,
                    hash_keys: bool = False):
    """Score every document by smoothed bigram predictability.  Returns a
    Dataset of ``(doc_id, n_bigrams, lm_score, lm_avg)`` where
    ``lm_avg = lm_score // n_bigrams`` (the per-bigram mean, still an
    int) — docs with fewer than two tokens are absent.

    ``scratch_dir``: where the narrow bigram feature table is persisted
    between passes (written once, read twice).
    """
    import shutil

    import polars as pl
    import ray

    from docling_translate_ray.stages.shuffle import (
        distinct,
        grouped_sum,
        hash_partition_apply,
    )

    shutil.rmtree(scratch_dir, ignore_errors=True)
    ds.select_columns([id_column, column]).map_batches(
        _explode_bigrams(id_column, column, hash_keys),
        batch_format="pyarrow",
    ).write_parquet(scratch_dir)
    import glob as _glob
    import os as _os

    if not _glob.glob(_os.path.join(scratch_dir, "*.parquet")):
        # no doc had >= 2 tokens — zero feature rows write zero files
        return ray.data.from_arrow(pa.schema(
            [(id_column, pa.int64()), ("n_bigrams", pa.int64()),
             ("lm_score", pa.int64()), ("lm_avg", pa.int64())]
        ).empty_table())
    feats = ray.data.read_parquet(scratch_dir)

    # pass 1: V = distinct context types — single-key exchange, driver int
    n_contexts = distinct(
        feats.select_columns(["w1"]), ["w1"],
        num_partitions=min(num_partitions, 16),
    ).count()

    # pass 2: the w1-keyed exchange — c2/c1/S/weighting all local
    def weigh(part: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(part)
            .with_columns(
                pl.col("cnt").sum().over(["w1", "w2"]).alias("_c2"),
                pl.col("cnt").sum().over("w1").alias("_c1"),
            )
        )
        if df.height and df["_c2"].max() >= (2 ** 63 - 1) // _SCALE:
            raise ValueError(
                "bigram count exceeds the int64-exact range at SCALE=1e6 — "
                "shard the corpus or lower SCALE")
        df = (
            df
            .with_columns(
                (((pl.col("_c2") + 1) * _SCALE)
                 // (pl.col("_c1") + n_contexts)).alias("_s")
            )
        )
        return (
            df.select("doc_id", "cnt",
                      (pl.col("cnt") * pl.col("_s")).alias("_sc"))
            .to_arrow()
        )

    weighted = hash_partition_apply(
        feats, ["w1"], weigh, num_partitions=num_partitions)

    out = grouped_sum(
        weighted, ["doc_id"],
        [pl.col("cnt").sum().alias("_n"), pl.col("_sc").sum().alias("_w")],
        {"n_bigrams": "_n", "lm_score": "_w"},
        num_partitions=num_partitions,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            (pl.col("lm_score") // pl.col("n_bigrams")).alias("lm_avg"))
        return df.select(
            ["doc_id", "n_bigrams", "lm_score", "lm_avg"]).to_arrow()

    out = out.map_batches(finalize, batch_format="pyarrow")
    if id_column != "doc_id":
        out = out.rename_columns({"doc_id": id_column})
    return out
