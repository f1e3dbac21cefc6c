"""Trained quality classifier — a hashed-bag-of-words Naive-Bayes-analog
fit ON the cluster, the learned-filter slot of web-curation pipelines
(CCNet / RefinedWeb gate documents with a fasttext-style linear
classifier trained on labeled seed corpora; the reference repo has no
learned filter — beyond-reference training-data operator suite).

Model: the supervised two-class extension of the DSIR substrate
(``functions/dsir.py``).  Training is pure counting — per hashed token
bucket, how often it appears under each label in the TRAIN split — so
it parallelizes as one narrow bucket-keyed ``grouped_sum`` (exchange
≤ B rows per block) with no sequential dependence, unlike
SGD-family trainers.  Scoring uses the repo's integer-exact house
style (the driver gate hash-compares values, so float ``Σ log p`` is
out — same reformulation as bm25's ``N−df`` idf analog and DSIR's
scaled ratios): per bucket the two SCALED SMOOTHED likelihood ratios

    S_pos[b] = ((n_pos[b]+1) · SCALE · (N_neg+B)) // ((n_neg[b]+1) · (N_pos+B))
    S_neg[b] = ((n_neg[b]+1) · SCALE · (N_pos+B)) // ((n_pos[b]+1) · (N_neg+B))

(add-one smoothing over B buckets, floor division, arbitrary-precision
ints on the driver / HUGEINT in the DuckDB oracle), a document scores
``Σ_b cnt_b · S[b]`` under each class, and the prediction is the
argmax (ties → negative).  A bucket unseen in training falls back to
the all-smoothing default ratio — exactly what the formulas give at
``n_pos = n_neg = 0``.  Buckets are ``md5(token)[:prefix]`` hex
strings (B = 16^prefix), the ``dataset_split``/DSIR lockstep trick:
the string itself is the key on both engines.

Scale shape (the DSIR recipe): the corpus collapses per batch to the
narrow feature table ``(id, bucket, cnt, cnt_pos, is_train)`` — ≤ B
rows per document — persisted to Parquet ONCE (text is never
re-tokenized); pass 1 aggregates train-split bucket counts (≤ B-row
exchange per block), the ≤ B-row weight table lives on the driver and
broadcasts into pass 2, a doc-keyed ``grouped_sum`` over the held-out
features.  No corpus-sized exchange ever carries text.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_SCALE = 1_000_000

_FEATURE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("bucket", pa.string()),
    ("cnt", pa.int64()),
    ("cnt_pos", pa.int64()),
    ("is_train", pa.bool_()),
])


class _ExplodeLabeled:
    """ACTOR-pool combiner (the ``dsir._ExplodeFeatures`` shape, plus
    the label/split flags): tokenize ``\\S+``, bucket by
    ``md5[:prefix]`` with a persistent Zipf-friendly token→bucket
    cache, collapse to (id, bucket, cnt, cnt_pos, is_train)."""

    _CACHE_CAP = 2_000_000

    def __init__(self, id_column: str, column: str, label_column: str,
                 train_column: str, prefix: int) -> None:
        self._id, self._col = id_column, column
        self._lab, self._tr = label_column, train_column
        self._prefix = prefix
        self._bucket_of: dict[str, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            batch.select([self._id, self._col, self._lab, self._tr]))
        toks = (
            df.rename({self._id: "_id", self._col: "_t",
                       self._lab: "_y", self._tr: "_tr"})
            .with_columns(pl.col("_id").cast(pl.Int64),
                          pl.col("_t").fill_null(""))
            .select("_id", "_y", "_tr",
                    pl.col("_t").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
        )
        if toks.height == 0:
            return _FEATURE_SCHEMA.empty_table()
        cache = self._bucket_of
        if len(cache) > self._CACHE_CAP:
            cache = self._bucket_of = {}
        uniq = toks["w"].unique()
        miss = [w for w in uniq if w not in cache]
        for w in miss:
            cache[w] = hashlib.md5(w.encode("utf-8")).hexdigest()[:self._prefix]
        bmap = pl.DataFrame({"w": uniq, "bucket": [cache[w] for w in uniq]})
        out = (
            toks.join(bmap, on="w", how="left")
            .group_by(["_id", "bucket"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"),
                 pl.col("_y").first().alias("_y"),
                 pl.col("_tr").first().alias("_tr"))
            .with_columns(
                (pl.col("cnt") * pl.col("_y").cast(pl.Int64)).alias("cnt_pos"))
            .rename({"_id": "doc_id", "_tr": "is_train"})
            .select(["doc_id", "bucket", "cnt", "cnt_pos", "is_train"])
        )
        return out.to_arrow().cast(_FEATURE_SCHEMA)


def nb_train(feats, prefix: int = 2, num_partitions: int = 16):
    """Pass 1 over a persisted feature Dataset: train-split bucket
    counts → the ≤ B-row integer weight table.  Returns
    ``(weights_df, defaults)`` where ``weights_df`` is a polars frame
    ``(bucket, s_pos, s_neg)`` and ``defaults`` the unseen-bucket
    ``(s_pos, s_neg)`` pair."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import grouped_sum

    B = 16 ** prefix

    def train_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.field("is_train"))

    g = grouped_sum(
        feats.map_batches(train_only, batch_format="pyarrow"),
        ["bucket"],
        [pl.col("cnt").sum().alias("_n"),
         pl.col("cnt_pos").sum().alias("_p")],
        {"n_all": "_n", "n_pos": "_p"},
        num_partitions=min(num_partitions, 16),
    ).take_all()  # ≤ B rows by construction
    n_pos_tot = sum(r["n_pos"] for r in g)
    n_neg_tot = sum(r["n_all"] - r["n_pos"] for r in g)

    def s_pair(n_pos: int, n_neg: int) -> tuple[int, int]:
        s_pos = ((n_pos + 1) * _SCALE * (n_neg_tot + B)) \
            // ((n_neg + 1) * (n_pos_tot + B))
        s_neg = ((n_neg + 1) * _SCALE * (n_pos_tot + B)) \
            // ((n_pos + 1) * (n_neg_tot + B))
        return s_pos, s_neg

    rows = {r["bucket"]: s_pair(r["n_pos"], r["n_all"] - r["n_pos"])
            for r in g}
    if any(s >= 2 ** 62 for pair in rows.values() for s in pair):
        raise ValueError(
            "nb bucket weight exceeds int64 range — one class is too small "
            "relative to the other for the integer-exact formulation")
    defaults = s_pair(0, 0)
    weights_df = pl.DataFrame({
        "bucket": list(rows),
        "s_pos": pl.Series([p for p, _ in rows.values()], dtype=pl.Int64),
        "s_neg": pl.Series([n for _, n in rows.values()], dtype=pl.Int64),
    })
    return weights_df, defaults


def nb_classify(ds, scratch_dir: str, label_column: str = "label",
                train_column: str = "is_train", id_column: str = "doc_id",
                column: str = "text", prefix: int = 2,
                num_partitions: int = 32):
    """Train on the ``train_column`` split, score every HELD-OUT
    document.  Returns a Dataset of ``(doc_id, n_tokens, label,
    score_pos, score_neg, pred)`` — zero-token docs are absent (no
    feature rows; the oracle mirrors this).

    ``scratch_dir``: where the narrow feature table is persisted
    between the two aggregation passes (written once, read twice).
    """
    import shutil

    import polars as pl
    import ray

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import auto_pool_size

    shutil.rmtree(scratch_dir, ignore_errors=True)
    feats = ds.map_batches(
        _ExplodeLabeled, batch_format="pyarrow",
        fn_constructor_args=(id_column, column, label_column,
                             train_column, prefix),
        concurrency=auto_pool_size(),
    )
    feats.write_parquet(scratch_dir)
    feats = ray.data.read_parquet(scratch_dir)

    weights_df, (def_pos, def_neg) = nb_train(
        feats, prefix=prefix, num_partitions=num_partitions)

    # pass 2: held-out docs only, broadcast ≤ B-row weight join
    def weigh(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch)
            .filter(~pl.col("is_train"))
            .join(weights_df, on="bucket", how="left")
            .with_columns(pl.col("s_pos").fill_null(def_pos),
                          pl.col("s_neg").fill_null(def_neg))
        )
        return (
            df.with_columns((pl.col("cnt") * pl.col("s_pos")).alias("_sp"),
                            (pl.col("cnt") * pl.col("s_neg")).alias("_sn"))
            .select(["doc_id", "cnt", "cnt_pos", "_sp", "_sn"])
            .to_arrow()
        )

    scored = grouped_sum(
        feats.map_batches(weigh, batch_format="pyarrow"),
        ["doc_id"],
        [pl.col("cnt").sum().alias("_n"),
         pl.col("cnt_pos").sum().alias("_np"),
         pl.col("_sp").sum().alias("_p"),
         pl.col("_sn").sum().alias("_g")],
        {"n_tokens": "_n", "n_pos_tok": "_np",
         "score_pos": "_p", "score_neg": "_g"},
        num_partitions=num_partitions,
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.with_columns((pl.col("n_pos_tok") > 0).alias("label"),
                            (pl.col("score_pos") > pl.col("score_neg"))
                            .alias("pred"))
            .select(["doc_id", "n_tokens", "label",
                     "score_pos", "score_neg", "pred"])
            .to_arrow()
        )

    out = scored.map_batches(finish, batch_format="pyarrow")
    if id_column != "doc_id":
        out = out.rename_columns({"doc_id": id_column})
    return out
