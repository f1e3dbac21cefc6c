"""Deduplication family over a document table (training-data pipeline ops).

Five dedup modes, each expressed Ray-Data-first:

* **exact** — md5 content hash → per-batch combiner → ``groupby(hash)`` keep
  first (min doc_id): the A1 analog (core.py:454) at corpus scale.
* **MinHash + LSH** — word shingles → k minhashes (vectorized numpy
  permutations) → band signatures → ``groupby(band)`` candidate buckets →
  exact Jaccard verify → canonical = min doc_id per duplicate cluster.
* **SimHash** — 64-bit sign-aggregated token hashes; near-dup = Hamming
  distance ≤ t within LSH-style chunk buckets.
* **n-gram Jaccard** — exact pairwise Jaccard verification (used as the
  verifier inside LSH; standalone for small candidate sets).
* **embedding cosine** — random-hyperplane LSH buckets over normalized
  vectors → within-bucket pairwise cosine ≥ τ.

Partitioning assumptions are documented per function; every shuffle is a
``groupby`` on a content-derived key (uniformly distributed by construction,
so no salting needed — unlike url/host keys).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# ---------------------------------------------------------------- exact

def add_md5(batch: pa.Table, column: str = "text") -> pa.Table:
    h = [hashlib.md5((t or "").encode()).hexdigest() for t in batch[column].to_pylist()]
    return batch.append_column("content_md5", pa.array(h, pa.string()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Distinct rows by content hash; canonical row = min id.

    Per-batch combiner first (duplicates within a batch never shuffle), then
    one ``groupby(content_md5)``.  Returns columns: content_md5, <id>, n_dups.
    """

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def combiner(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(add_md5(batch, column))
        agg = df.group_by("content_md5").agg(
            pl.col(id_column).min().alias(id_column),
            pl.len().cast(pl.Int64).alias("n_dups"),
        )
        return agg.to_arrow()

    def finalize(part: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(part)
            .group_by("content_md5")
            .agg(
                pl.col(id_column).min().alias(id_column),
                pl.col("n_dups").sum().alias("n_dups"),
            )
            .to_arrow()
        )

    return hash_partition_apply(
        ds.map_batches(combiner, batch_format="pyarrow"),
        ["content_md5"],
        finalize,
    )


# ---------------------------------------------------------------- minhash

class MinHasher:
    """Actor-pool stage: add a ``minhash`` (list<uint64>) signature column.

    Permutation coefficients are seeded in ``__init__`` (once per actor —
    the model-load pattern); per row the signature is a vectorized
    ``min((a*h+b) mod p)`` over the shingle hash vector.
    """

    def __init__(self, column: str = "text", num_perm: int = 64, k_shingle: int = 3,
                 seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        # odd multipliers → bijections of Z/2^64; min-wise behavior is
        # indistinguishable from prime-modulus permutations for LSH purposes
        self.a = (rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
        # order-sensitive shingle combine: position-wise odd multipliers
        self.cmix = (rng.randint(0, 1 << 62, size=k_shingle).astype(np.uint64)
                     << np.uint64(1)) | np.uint64(1)
        self.num_perm = num_perm
        self.k = k_shingle
        self.column = column

    def _shingle_hashes(self, token_hashes: np.ndarray) -> np.ndarray:
        """k-gram hashes from per-token hashes, fully vectorized: the
        shingle hash is a position-weighted wrap-around mix of its k token
        hashes (strided windows — no per-shingle Python)."""
        n = len(token_hashes)
        if n == 0:
            return token_hashes
        k = min(self.k, n)
        with np.errstate(over="ignore"):
            acc = token_hashes[: n - k + 1] * self.cmix[0]
            for j in range(1, k):
                acc = acc ^ (token_hashes[j : n - k + 1 + j] * self.cmix[j])
        return acc

    def signature(self, text: str) -> np.ndarray:
        toks = (text or "").split()
        if not toks:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        import polars as pl

        # vectorized per-token xxhash (stable for fixed seed+polars version)
        th = pl.Series(toks).hash(seed=7).to_numpy().astype(np.uint64)
        base = self._shingle_hashes(th)
        with np.errstate(over="ignore"):
            # (S, P) wrap-around permuted hashes, min over shingles — one matmul-shaped op
            vals = base[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch[self.column].to_pylist()]
        arr = pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
        return batch.append_column("minhash", arr)


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_dedup(ds, column: str = "text", id_column: str = "doc_id",
                      threshold: float = 0.7, num_perm: int = 64, num_bands: int = 16,
                      concurrency: int | None = None):
    """Near-duplicate clusters via MinHash-LSH + exact-Jaccard verify.

    Returns rows ``(doc_id, canonical_id)`` for docs in a near-dup pair
    (canonical = min id of the verified pair group).  Pipeline: signature
    (actor pool) → band explode → ``groupby(band_id, band_key)`` → pairwise
    verify *within bucket only* (buckets are tiny by construction —
    collision probability tuned by bands×rows) → min-label per doc.

    Partitioning assumption: band_key is hash-uniform; a degenerate corpus
    (thousands of identical docs) makes one bucket huge — exact-dedup first
    (cheaper) and run LSH on the survivors, which is the documented usage.
    """
    if num_bands < 1 or num_perm % num_bands != 0:
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of num_bands "
            f"({num_bands}) — rows-per-band = num_perm // num_bands drives the "
            "collision probability and must be >= 1"
        )
    if concurrency is None:
        from docling_translate_ray.util import auto_pool_size

        concurrency = auto_pool_size()

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"column": column, "num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # carry text for the verify step (needed inside the bucket)
    bands = sigs.map_batches(
        lambda b: _explode_bands_with_text(b, num_bands, id_column, column),
        batch_format="pyarrow",
    )

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def verify_partition(part: pa.Table) -> pa.Table:
        """One call per hash partition: vectorized filter to multi-member
        buckets, then pairwise exact-Jaccard verify inside each tiny
        bucket.  Shingle sets are computed ONCE per doc per partition and
        each (lo, hi) pair is verified once even when it collides in many
        bands (exact dups collide in all of them)."""
        import polars as pl

        df = pl.from_arrow(part)
        multi = df.filter(pl.len().over(["band_id", "band_key"]) > 1)
        shingles: dict[int, frozenset] = {}
        checked: set[tuple[int, int]] = set()
        out_id, out_canon = [], []
        if multi.height:
            for bucket in multi.partition_by(["band_id", "band_key"]):
                ids = bucket[id_column].to_list()
                texts = bucket["_text"].to_list()
                for did, txt in zip(ids, texts):
                    if did not in shingles:
                        shingles[did] = frozenset(word_shingles(txt or ""))
                ids_sorted = sorted(ids)
                for i in range(len(ids_sorted)):
                    for j in range(i + 1, len(ids_sorted)):
                        key = (ids_sorted[i], ids_sorted[j])
                        if key in checked:
                            continue
                        checked.add(key)
                        sa, sb = shingles[key[0]], shingles[key[1]]
                        union = len(sa | sb)
                        sim = (len(sa & sb) / union) if union else 1.0
                        if sim >= threshold:
                            out_id.extend(key)
                            out_canon.extend([key[0], key[0]])
        return pa.table(
            {
                id_column: pa.array(out_id, pa.int64()),
                "canonical_id": pa.array(out_canon, pa.int64()),
            }
        )

    cand = hash_partition_apply(bands, ["band_id", "band_key"], verify_partition)
    # pair labels → per-CLUSTER canonical (transitive closure, A~B~C ⇒ one
    # cluster under min id even when A~C itself fails the threshold)
    return _resolve_transitive(cand, id_column)


def _explode_bands_with_text(batch: pa.Table, num_bands: int, id_column: str, column: str) -> pa.Table:
    ids = batch[id_column].to_pylist()
    sigs = batch["minhash"].to_pylist()
    texts = batch[column].to_pylist()
    o_band, o_key, o_id, o_text = [], [], [], []
    for did, sig, txt in zip(ids, sigs, texts):
        r = len(sig) // num_bands
        for b in range(num_bands):
            chunk = tuple(sig[b * r : (b + 1) * r])
            o_band.append(b)
            o_key.append(hashlib.blake2b(repr(chunk).encode(), digest_size=8).hexdigest())
            o_id.append(did)
            o_text.append(txt)
    return pa.table(
        {
            "band_id": pa.array(o_band, pa.int32()),
            "band_key": pa.array(o_key, pa.string()),
            id_column: pa.array(o_id, pa.int64()),
            "_text": pa.array(o_text, pa.string()),
        }
    )


def _resolve_transitive(labels_ds, id_column: str) -> pa.Table:
    """Union-find closure over (id → canonical_id) labels so every member
    of a connected near-dup component points at the component's TRUE
    minimum id — a per-pair min is not a per-cluster min (A~B, B~C without
    A~C must still merge into one cluster under min(A)).

    The label table only contains dup-cluster members — a small fraction
    of the corpus by construction (run exact dedup first on mostly-dup
    corpora, as the module docstring prescribes) — so the closure is a
    driver-side union-find over the collected pairs; the expensive part
    (candidate generation + verification) stays distributed."""
    import ray.data

    parent: dict[int, int] = {}
    seen: set[int] = set()

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for b in labels_ds.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for i, c in zip(t[id_column].to_pylist(), t["canonical_id"].to_pylist()):
            seen.add(i)
            seen.add(c)
            ri, rc = find(i), find(c)
            if ri != rc:
                lo, hi = min(ri, rc), max(ri, rc)
                parent[hi] = lo

    ids = sorted(seen)
    return ray.data.from_arrow(pa.table(
        {
            id_column: pa.array(ids, pa.int64()),
            "canonical_id": pa.array([find(i) for i in ids], pa.int64()),
        }
    ))


def ngram_jaccard_pairs(ds, column: str = "text", id_column: str = "doc_id",
                        threshold_pct: int = 80, k: int = 3):
    """EXACT all-pairs n-gram Jaccard (the LSH verifier as a standalone op).

    The full (id → shingle set) index is broadcast once (``ray.put``); each
    batch compares its docs against every higher id — O(n²) pair work split
    across batches, zero shuffle.  This is the small/medium-corpus exact
    tool (and the oracle for LSH recall); at corpus scale use
    :func:`minhash_lsh_dedup`, which only verifies colliding candidates.

    The threshold compares as integers (``100·|∩| ≥ pct·|∪|``) so the DuckDB
    oracle (list_intersect/list_distinct) matches bit-exactly — no float
    division on either side.  Returns (id_a, id_b, inter_size, union_size)
    with ``id_a < id_b``.
    """
    import ray

    # pin the (id, text) projection once: it feeds BOTH the driver-side
    # index build and the distributed pair scan below — without this the
    # upstream pipeline would execute twice
    ds = ds.select_columns([id_column, column]).materialize()

    index: dict[int, frozenset] = {}
    for b in ds.iter_batches(
        batch_format="pyarrow", batch_size=8192
    ):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for i, txt in zip(t[id_column].to_pylist(), t[column].to_pylist()):
            index[i] = frozenset(word_shingles(txt or "", k))
    idx_ref = ray.put(index)

    class PairFinder:
        def __init__(self) -> None:
            self._idx = ray.get(idx_ref)
            self._ids = sorted(self._idx)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_i, out_u = [], [], [], []
            for a in batch[id_column].to_pylist():
                sa = self._idx[a]
                for bid in self._ids:
                    if bid <= a:
                        continue
                    sb = self._idx[bid]
                    inter = len(sa & sb)
                    union = len(sa | sb)
                    if 100 * inter >= threshold_pct * union:
                        out_a.append(a)
                        out_b.append(bid)
                        out_i.append(inter)
                        out_u.append(union)
            return pa.table(
                {
                    "id_a": pa.array(out_a, pa.int64()),
                    "id_b": pa.array(out_b, pa.int64()),
                    "inter_size": pa.array(out_i, pa.int64()),
                    "union_size": pa.array(out_u, pa.int64()),
                }
            )

    from docling_translate_ray.util import auto_pool_size

    return ds.select_columns([id_column]).map_batches(
        PairFinder, batch_format="pyarrow", concurrency=auto_pool_size()
    )


# ---------------------------------------------------------------- simhash

class SimHasher:
    """Add a 64-bit ``simhash`` column (sign-aggregated token hash bits)."""

    def __init__(self, column: str = "text") -> None:
        self.column = column
        self._bit_cols = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        import polars as pl

        # vectorized: per-token xxhash → (T, 64) bit matrix → signed votes
        th = pl.Series(toks).hash(seed=11).to_numpy().astype(np.uint64)
        bits = (th[:, None] >> self._bit_cols[None, :]) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out_bits = (votes > 0).astype(np.uint64)
        return int((out_bits << self._bit_cols).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = np.array([self.simhash(t) for t in batch[self.column].to_pylist()],
                        dtype=np.uint64)
        return batch.append_column("simhash", pa.array(vals.view(np.int64), pa.int64()))


def simhash_near_dup(ds, id_column: str = "doc_id", max_hamming: int = 3,
                     concurrency: int | None = None):
    """Near-dup pairs by SimHash: 4×16-bit chunk buckets (a pair within
    Hamming ≤ 3 of 64 bits shares at least one exact 16-bit chunk — pigeonhole)
    → within-bucket Hamming verify.  Returns (doc_id, canonical_id) with
    per-cluster canonical ids (transitive closure)."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} > 3 breaks the 4-chunk pigeonhole "
            "guarantee (a pair differing in 4+ bits may share no exact "
            "16-bit chunk and would be silently missed); increase the chunk "
            "count instead"
        )
    if concurrency is None:
        from docling_translate_ray.util import auto_pool_size

        concurrency = auto_pool_size()
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)

    def explode_chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        hs = np.array(batch["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
        o_c, o_k, o_id, o_h = [], [], [], []
        for did, h in zip(ids, hs):
            for c in range(4):
                o_c.append(c)
                o_k.append(int((h >> np.uint64(16 * c)) & np.uint64(0xFFFF)))
                o_id.append(did)
                o_h.append(int(h))
        return pa.table(
            {
                "chunk_id": pa.array(o_c, pa.int32()),
                "chunk_key": pa.array(o_k, pa.int64()),
                id_column: pa.array(o_id, pa.int64()),
                "_sim": pa.array(np.array(o_h, dtype=np.uint64).view(np.int64), pa.int64()),
            }
        )

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def verify_partition(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        multi = df.filter(pl.len().over(["chunk_id", "chunk_key"]) > 1)
        pairs: dict[int, int] = {}
        if multi.height:
            for bucket in multi.partition_by(["chunk_id", "chunk_key"]):
                ids = bucket[id_column].to_list()
                hs = bucket["_sim"].to_numpy().view(np.uint64)
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        if bin(int(hs[i] ^ hs[j])).count("1") <= max_hamming:
                            lo, hi = sorted((ids[i], ids[j]))
                            pairs[hi] = min(pairs.get(hi, lo), lo)
                            pairs.setdefault(lo, lo)
        return pa.table(
            {
                id_column: pa.array(list(pairs.keys()), pa.int64()),
                "canonical_id": pa.array(list(pairs.values()), pa.int64()),
            }
        )

    cand = hash_partition_apply(
        sigs.map_batches(explode_chunks, batch_format="pyarrow"),
        ["chunk_id", "chunk_key"],
        verify_partition,
    )
    return _resolve_transitive(cand, id_column)


# ---------------------------------------------------------------- embedding

def embedding_near_dup(ds, id_column: str = "vec_id", column: str = "embedding",
                       threshold: float = 0.95, num_planes: int = 8, seed: int = 42):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets.

    Vectors are L2-normalized per batch (numpy); the bucket key is the sign
    pattern over ``num_planes`` seeded hyperplanes — cos ≥ 0.95 pairs almost
    always share a bucket (collision prob (1-θ/π)^p); verify is an exact
    within-bucket pairwise matmul.  Returns (vec_id, canonical_id) with
    per-cluster canonical ids (transitive closure).
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = np.array(batch[column].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table({"bucket_key": pa.array([], pa.int64()),
                             id_column: pa.array([], pa.int64()),
                             "_vec": pa.array([], pa.list_(pa.float64()))})
        from docling_translate_ray.functions.knn import _normalize

        dim = mat.shape[1]
        rng = np.random.RandomState(seed)
        planes = rng.randn(dim, num_planes)
        mat = _normalize(mat)
        signs = (mat @ planes > 0).astype(np.int64)
        keys = (signs * (1 << np.arange(num_planes))).sum(axis=1)
        return pa.table(
            {
                "bucket_key": pa.array(keys, pa.int64()),
                id_column: batch[id_column],
                "_vec": pa.array(mat.tolist(), pa.list_(pa.float64())),
            }
        )

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def verify_partition(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        multi = df.filter(pl.len().over("bucket_key") > 1)
        out_id, out_canon, out_cos = [], [], []
        if multi.height:
            for bucket in multi.partition_by("bucket_key"):
                ids = bucket[id_column].to_list()
                mat = np.array(bucket["_vec"].to_list(), dtype=np.float64)
                sims = mat @ mat.T
                pairs: dict[int, tuple[int, float]] = {}
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        if sims[i, j] >= threshold:
                            lo, hi = sorted((ids[i], ids[j]))
                            cur = pairs.get(hi)
                            if cur is None or lo < cur[0]:
                                pairs[hi] = (lo, float(sims[i, j]))
                            pairs.setdefault(lo, (lo, 1.0))
                for k, (c, s) in pairs.items():
                    out_id.append(k)
                    out_canon.append(c)
                    out_cos.append(s)
        return pa.table(
            {
                id_column: pa.array(out_id, pa.int64()),
                "canonical_id": pa.array(out_canon, pa.int64()),
                "cosine": pa.array(out_cos, pa.float64()),
            }
        )

    cand = hash_partition_apply(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket_key"],
        verify_partition,
    ).map_batches(
        lambda b: b.select([id_column, "canonical_id"]), batch_format="pyarrow"
    )
    return _resolve_transitive(cand, id_column)
