"""Feature-hash text embedder — the deterministic text→vector bridge.

Every vector operator in this engine (knn/IVF/PQ in functions/knn.py /
pq.py, SemDeDup, embedding near-dup) consumes an ``embedding`` column;
real pipelines produce it with a learned model (fasttext / sentence
encoders) that cannot live in this sandbox.  This module fills the slot
with the hashing trick (Weinberger 2009 "Feature Hashing for Large
Scale Multitask Learning"): token → md5 bucket (dim) + md5-bit sign,
signed counts accumulated per (doc, dim).  Deterministic, integer-exact
and SQL-replayable — exactly the engine-lockstep discipline the other
oracles use — while behaving like a real bag-of-words embedding
(duplicate docs collide at cosine 1.0, token-overlapping docs land
near; pinned in tests/test_embed.py).

Output is SPARSE long form ``(id, dim, val)`` with ``val != 0`` — the
honest shape at corpus scale (256 dims × mostly-zero rows would be
read amplification) and the hash-comparable one (a list column
stringifies differently in pandas vs DuckDB).  :func:`densify_batch`
converts to the dense ``list<float>`` the ANN family eats.

Scale shape: ONE actor-pool map stage (the classifier's
``_ExplodeLabeled`` pattern — per-actor token→(dim, sign) cache so the
Zipf head hashes once per actor, vectorized explode/join/group inside
the batch) followed by one narrow (id, dim)-keyed merge exchange.  Text
never crosses an exchange, and the exchange rows are physically NARROW
— ``(int64 id, uint8 dim, int32 val)``, the hex rendering of ``dim``
happens AFTER the merge — with the exchange itself spilled through
scratch parquet (:func:`..stages.shuffle.hash_partition_apply_spill`)
so peak object-store memory is bounded by in-flight blocks, not the
39M-row sparse table (2.6 GiB plasma at 960k pages before round 5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SPARSE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("dim", pa.string()),      # 2-hex-char md5 bucket: 256 dims
    ("val", pa.int64()),
])

# exchange rows: dim as its raw byte, val as int32 (|val| ≤ tokens/doc)
_NARROW_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("dim", pa.uint8()),
    ("val", pa.int32()),
])

_HEXES = [f"{b:02x}" for b in range(256)]


class HashEmbedder:
    """Actor-pool kernel: docs → PARTIAL sparse signed counts
    ``(doc_id, dim: uint8, val: int32)`` (per batch; merge across
    batches is the caller's exchange — hex rendering happens there,
    post-merge).

    ``hash_mode="md5"`` is DuckDB-oracle lockstep: dim =
    ``md5(tok)[:2]``, sign = +1 when ``md5(tok)[2]`` ∈ 0-7 else −1
    (the oracle replays both from the same hex digest) — a per-UNIQUE-
    token Python loop behind a Zipf cache.  ``hash_mode="xx64"``
    (production default of :func:`hash_embed`) derives dim = low byte
    and sign = bit 8 of the vectorized polars token hash — no Python
    loop at all; feature-hashing only needs hash-distribution quality,
    not a specific digest (the r03 md5-loop lesson)."""

    _CACHE_CAP = 2_000_000

    def __init__(self, id_column: str = "doc_id", column: str = "text",
                 hash_mode: str = "md5"):
        self._id, self._col = id_column, column
        self._mode = hash_mode
        self._of: dict[str, tuple[int, int]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        toks = (
            pl.from_arrow(batch.select([self._id, self._col]))
            .rename({self._id: "_id", self._col: "_t"})
            .with_columns(pl.col("_id").cast(pl.Int64),
                          pl.col("_t").fill_null(""))
            .select("_id", pl.col("_t").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
        )
        if toks.height == 0:
            return _NARROW_SCHEMA.empty_table()
        if self._mode == "xx64":
            tagged = toks.with_columns(
                pl.col("w").hash(seed=11).alias("_h")
            ).with_columns(
                (pl.col("_h") % 256).cast(pl.UInt8).alias("dim"),
                (1 - 2 * ((pl.col("_h") // 256) % 2).cast(pl.Int32))
                .alias("s"),
            )
        else:  # md5: oracle lockstep, per-unique-token loop + cache
            cache = self._of
            if len(cache) > self._CACHE_CAP:
                cache = self._of = {}
            uniq = toks["w"].unique()
            for w in uniq:
                if w not in cache:
                    h = hashlib.md5(w.encode("utf-8")).hexdigest()
                    cache[w] = (int(h[:2], 16),
                                1 if int(h[2], 16) < 8 else -1)
            hmap = pl.DataFrame({
                "w": uniq,
                "dim": pl.Series([cache[w][0] for w in uniq],
                                 dtype=pl.UInt8),
                "s": pl.Series([cache[w][1] for w in uniq],
                               dtype=pl.Int32),
            })
            tagged = toks.join(hmap, on="w", how="left")
        out = (
            tagged.group_by(["_id", "dim"])
            .agg(pl.col("s").sum().cast(pl.Int32).alias("val"))
            .rename({"_id": "doc_id"})
            .select(["doc_id", "dim", "val"])
        )
        return out.to_arrow().cast(_NARROW_SCHEMA)


def hash_embed(ds, id_column: str = "doc_id", column: str = "text",
               concurrency: int | tuple | None = None,
               num_partitions: int = 32, hash_mode: str = "md5",
               exchange: str = "spill", scratch_dir: str | None = None):
    """Dataset op: documents → sparse hashed embedding rows
    ``(id, dim: 2-hex string, val: int64)``, zero rows dropped.  One
    actor-pool stage + one narrow (id, dim)-keyed merge exchange.

    ``hash_mode``: ``"md5"`` (oracle lockstep) or ``"xx64"`` (fully
    vectorized — use at corpus scale).  ``exchange``: ``"spill"``
    (default — the merge spills through scratch parquet, peak plasma
    bounded by in-flight blocks) or ``"plasma"`` (pure object-store
    exchange; fine when the sparse table is small).  Both physical
    paths produce identical rows (parity pytest).
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import (
        hash_partition_apply,
        hash_partition_apply_spill,
    )
    from docling_translate_ray.util import auto_pool_size

    if concurrency is None:
        concurrency = auto_pool_size()
    partial = ds.select_columns([id_column, column]).map_batches(
        HashEmbedder, fn_constructor_kwargs={
            "id_column": id_column, "column": column,
            "hash_mode": hash_mode},
        batch_format="pyarrow", concurrency=concurrency,
    ).map_batches(
        lambda b: b.rename_columns([id_column, "dim", "val"]),
        batch_format="pyarrow")

    def final(part: pa.Table) -> pa.Table:
        # merge partials, drop cancelled dims, render dim's hex AFTER
        # the merge (the exchange carried the raw byte)
        return (
            pl.from_arrow(part)
            .group_by([id_column, "dim"])
            .agg(pl.col("val").sum().cast(pl.Int64).alias("val"))
            .filter(pl.col("val") != 0)
            .with_columns(
                pl.col("dim").cast(pl.UInt32)
                .replace_strict(list(range(256)), _HEXES,
                                return_dtype=pl.String))
            .select([id_column, "dim", "val"])
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()), ("dim", pa.string()),
                             ("val", pa.int64())]))
        )

    if exchange == "spill":
        return hash_partition_apply_spill(
            partial, [id_column, "dim"], final,
            num_partitions=num_partitions, scratch_dir=scratch_dir,
            label="id,dim:embed_merge",
            empty_schema=pa.schema([(id_column, pa.int64()),
                                    ("dim", pa.uint8()),
                                    ("val", pa.int32())]))
    return hash_partition_apply(
        partial, [id_column, "dim"], final,
        num_partitions=num_partitions, label="id,dim:embed_merge")


def densify_batch(batch: pa.Table, id_column: str = "doc_id",
                  dims: int = 256) -> pa.Table:
    """Sparse (id, dim, val) rows — ALL rows of each doc co-present in
    the batch (i.e. after the merge exchange, grouped or re-keyed by
    id) — → dense ``(id, embedding: list<float>)`` for the ANN family.
    ``dim`` hex decodes to the vector index (vectorized)."""
    import polars as pl

    ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
    if len(ids) == 0:
        return pa.table({
            id_column: pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        })
    dim_idx = (pl.Series("d", batch["dim"]).str.to_integer(base=16)
               .cast(pl.Int64).to_numpy())
    vals = np.asarray(batch["val"].to_pylist(), dtype=np.float64)
    uniq, inv = np.unique(ids, return_inverse=True)
    dense = np.zeros((len(uniq), dims), dtype=np.float64)
    dense[inv, dim_idx] = vals
    return pa.table({
        id_column: pa.array(uniq, pa.int64()),
        "embedding": pa.array(list(dense), pa.list_(pa.float64())),
    })
