"""Deterministic training-shard layout — the global-shuffle-then-shard
step that precedes LLM training: give every document a reproducible
pseudo-random shuffle key (md5 of the salted doc id — layout-, engine-
and cluster-size-independent, the ``q_dataset_split`` convention), pick
the shard from the key's hex prefix, and order each shard by the full
key.  Together that is a stable global permutation of the corpus — the
"sample-level global shuffle" training recipes call for — WITHOUT
``random_shuffle`` (whose permutation depends on block layout and so
cannot be oracle-checked or reproduced across engines).

Scale shape: one narrow keyed exchange (the shuffle itself — a global
permutation is inherently all-to-all, but the payload is ``(shard,
32-byte key, 2×int64)`` per doc, never the text); shard count is
``16**hex_digits`` (4 hex digits ≈ 64k shards at corpus scale), so each
shard is one partition-local sort — no global sort ever runs.  With
``out_dir`` set, each shard additionally lands as ONE parquet file named
by its shard id (write-then-stats in the same block pass), so a resumed
run can skip finished shards and a trainer streams shards independently.

Verification: the returned per-shard stats carry ``order_check`` =
Σ rank·(doc_id mod 9973) over the within-shard key order — an
order-SENSITIVE checksum, so the DuckDB oracle (``row_number() OVER
(PARTITION BY shard ORDER BY key)``) proves not just membership but the
exact within-shard sequence.

Reference parity note: the reference repo processes one document per
run (`/root/reference/src/core.py`); corpus-level shard layout is part
of the beyond-reference training-data operator suite.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

STATS_SCHEMA = pa.schema([
    ("shard", pa.string()),
    ("n_docs", pa.int64()),
    ("total_chars", pa.int64()),
    ("order_check", pa.int64()),
])


def _keyed_partial(id_column: str, column: str, salt: str, hex_digits: int,
                   keep_payload: bool):
    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        ids = batch[id_column].to_pylist()
        keys = [
            hashlib.md5(f"{salt}:{i}".encode("utf-8")).hexdigest()
            for i in ids
        ]
        n_chars = (
            pl.from_arrow(batch[column]).fill_null("")
            .str.len_chars().cast(pl.Int64)
        )
        cols = {
            "shard": pa.array([k[:hex_digits] for k in keys], pa.string()),
            "key": pa.array(keys, pa.string()),
            "_w": pa.array([i % 9973 for i in ids], pa.int64()),
            "n_chars": n_chars.to_arrow().cast(pa.int64()),
        }
        if keep_payload:
            cols[id_column] = batch[id_column]
            cols[column] = batch[column]
        return pa.table(cols)

    return fn


def train_shards(ds, hex_digits: int = 1, id_column: str = "doc_id",
                 column: str = "text", salt: str = "shard",
                 out_dir: str | None = None, num_partitions: int = 32):
    """Shard the corpus into ``16**hex_digits`` deterministic training
    shards; returns a Dataset of per-shard stats
    ``(shard, n_docs, total_chars, order_check)``.

    With ``out_dir``, each shard's full rows (id + text), sorted by the
    shuffle key, are also written as ``{out_dir}/shard-<id>.parquet``
    (one file per shard — shards are the resume/streaming unit).
    """
    import os

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    if not (1 <= hex_digits <= 4):  # 16 … 65536 shards
        raise ValueError(f"hex_digits must be in 1..4 (got {hex_digits})")
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)

    def block(part: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.parquet as pq

        df = pl.from_arrow(part).sort("key")
        if out_dir is not None:
            for (s,), sub in df.group_by("shard"):
                pq.write_table(
                    sub.select([id_column, column, "key"]).to_arrow(),
                    os.path.join(out_dir, f"shard-{s}.parquet"),
                )
        out = (
            df.with_columns(
                pl.col("key").cum_count().over("shard").cast(pl.Int64)
                .alias("_rk")
            )
            .group_by("shard")
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_chars").sum().alias("total_chars"),
                (pl.col("_rk") * pl.col("_w")).sum().alias("order_check"),
            )
        )
        return out.to_arrow().cast(STATS_SCHEMA)

    keyed = ds.map_batches(
        _keyed_partial(id_column, column, salt, hex_digits,
                       keep_payload=out_dir is not None),
        batch_format="pyarrow",
    )
    return hash_partition_apply(
        keyed, ["shard"], block,
        num_partitions=min(num_partitions, 16 ** hex_digits),
    )
