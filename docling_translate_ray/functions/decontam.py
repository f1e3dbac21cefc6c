"""Benchmark decontamination — drop/flag corpus documents that share any
word n-gram with an evaluation set (the GPT-3/PaLM-style 13-gram overlap
rule; ``n`` is a parameter because short synthetic docs need smaller n).

Scale shape: n-grams never travel as strings — each is hashed to int64
(vectorized polars xxhash) at the batch where it is born.

* ``strategy="broadcast"`` (eval sets are normally tiny): the distinct
  eval-hash array is collected once (fenced at ``max_broadcast``),
  ``ray.put`` once, and every corpus batch does one vectorized
  ``np.isin`` — zero shuffle.
* ``strategy="join"``: corpus (id, hash) pairs semi-join the eval hashes
  via ``partition_join`` (one co-partition exchange), contaminated ids
  are ``distinct``-ed, and the flag comes back through one more
  co-partition left join — no driver-side set, no broadcast, for the
  day the "eval set" is itself corpus-sized (e.g. cross-corpus leakage).
* ``strategy="auto"``: broadcast while the eval n-gram count fits the
  fence, join past it.

A hash collision can only create a FALSE POSITIVE contamination flag
(~n_grams²/2⁶⁴ expected pairs — at 10¹² corpus n-grams that is a handful
of extra dropped docs, the conservative direction for decontamination).

Docs with fewer than ``n`` words produce no n-grams and are never
flagged (matching the SQL oracle's ``len(ws) >= n`` guard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ngram_hash_pairs(batch: pa.Table, n: int, column: str,
                      id_column: str | None) -> pa.Table:
    """Explode a text batch to (id?, _gh) rows — one per DISTINCT word
    n-gram per doc, hashed to int64."""
    import polars as pl

    s = pl.from_arrow(batch[column]).fill_null("")
    df = pl.DataFrame({"t": s}).with_row_index("_r")
    if id_column is not None:
        df = df.with_columns(
            pl.from_arrow(batch[id_column]).cast(pl.Int64).alias(id_column)
        )
    long = (
        df.select(
            "_r",
            *( [id_column] if id_column is not None else [] ),
            pl.col("t").str.extract_all(r"\S+").alias("w"),
        )
        .explode("w")
        .drop_nulls("w")
        .with_columns(
            [pl.col("w").shift(-i).over("_r").alias(f"_w{i}") for i in range(1, n)]
        )
        .drop_nulls([f"_w{i}" for i in range(1, n)])
        .with_columns(
            pl.concat_str(
                ["w"] + [f"_w{i}" for i in range(1, n)], separator=" "
            ).alias("_g")
        )
        .with_columns(
            pl.col("_g").hash(seed=0).reinterpret(signed=True).alias("_gh")
        )
    )
    keep = ([id_column] if id_column is not None else []) + ["_gh"]
    return long.select(["_r"] + keep).unique(["_r", "_gh"]).select(keep).to_arrow()


def decontaminate(corpus_ds, eval_ds, n: int = 13, column: str = "text",
                  id_column: str = "doc_id", strategy: str = "auto",
                  max_broadcast: int = 5_000_000, num_partitions: int = 32):
    """Flag every corpus doc sharing ≥1 word n-gram with the eval set.

    Returns a Dataset (id_column, contaminated:bool) with one row per
    corpus doc.
    """
    import ray

    from docling_translate_ray.stages.shuffle import distinct, partition_join
    from docling_translate_ray.util import collect_to_table

    if strategy not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")

    eval_pairs = eval_ds.map_batches(
        lambda b: _ngram_hash_pairs(b, n, column, None), batch_format="pyarrow"
    )
    eval_hashes = distinct(eval_pairs, ["_gh"], num_partitions=num_partitions)

    if strategy == "auto":
        strategy = "join" if eval_hashes.count() > max_broadcast else "broadcast"

    if strategy == "broadcast":
        tbl = collect_to_table(
            eval_hashes, empty_schema=pa.schema([("_gh", pa.int64())])
        )
        if tbl.num_rows > max_broadcast:
            raise ValueError(
                f"eval set has {tbl.num_rows} n-grams > max_broadcast="
                f"{max_broadcast}; use strategy='join'"
            )
        ref = ray.put(np.sort(np.asarray(tbl["_gh"].to_pylist(), dtype=np.int64)))

        def flag_batch(batch: pa.Table) -> pa.Table:
            import polars as pl

            hashes = ray.get(ref)
            pairs = _ngram_hash_pairs(batch, n, column, id_column)
            gh = np.asarray(pairs["_gh"].to_pylist(), dtype=np.int64)
            hit_ids = np.unique(
                np.asarray(pairs[id_column].to_pylist(), dtype=np.int64)[
                    np.isin(gh, hashes)
                ]
            )
            ids = pl.from_arrow(batch[id_column]).cast(pl.Int64).to_numpy()
            return pa.table(
                {
                    id_column: pa.array(ids, pa.int64()),
                    "contaminated": pa.array(np.isin(ids, hit_ids), pa.bool_()),
                }
            )

        return corpus_ds.map_batches(flag_batch, batch_format="pyarrow")

    # distributed: semi-join pairs against eval hashes, then flag-join back
    corpus_pairs = corpus_ds.map_batches(
        lambda b: _ngram_hash_pairs(b, n, column, id_column),
        batch_format="pyarrow",
    )
    ids_only = corpus_ds.select_columns([id_column])
    hits = partition_join(
        corpus_pairs, eval_hashes, on=["_gh"], how="semi",
        num_partitions=num_partitions,
    )
    contaminated = distinct(
        hits.select_columns([id_column]), [id_column], num_partitions=num_partitions
    ).map_batches(
        lambda b: b.append_column(
            "contaminated", pa.array([True] * b.num_rows, pa.bool_())
        ),
        batch_format="pyarrow",
    )
    flagged = partition_join(
        ids_only, contaminated, on=[id_column], how="left",
        num_partitions=num_partitions,
    )

    def fill_false(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "contaminated" not in batch.column_names:
            # zero hits: partition_join's empty-right shortcut returned the
            # bare left side — every doc is clean
            return batch.append_column(
                "contaminated", pa.array([False] * batch.num_rows, pa.bool_())
            )
        col = pc.fill_null(batch["contaminated"], False)
        return batch.set_column(
            batch.schema.get_field_index("contaminated"), "contaminated", col
        )

    return flagged.map_batches(fill_false, batch_format="pyarrow")
