"""Product quantization (PQ) — the vector-compression half of the ANN
family (brute-force ``knn_topk`` → partition-pruned ``knn_ivf`` → PQ
codes for when the vectors themselves no longer fit).

Model: Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search" — split each d-dim vector into ``m`` subvectors,
k-means each subspace independently, store only the ``m`` centroid ids
(codes); query with ASYMMETRIC distance (ADC): one ``(m, k)`` lookup
table of query-to-centroid distances, a vector's approximate distance
is the sum of ``m`` table lookups.  64 dims × 8 bytes become ``m``
small ints — the compression that lets a 10^12-vector corpus keep its
search structure in memory.

Integer-exact reformulation (the repo's oracle convention): vectors
quantize through the same ``floor(x·10^6 + ½) + offset`` transform as
:func:`~docling_translate_ray.functions.knn.kmeans_int`, codebooks are
its integer Lloyd centroids (floor-mean), and ADC distances are exact
int64 sums — so the DuckDB oracle (two unrolled k-means chains over
the d-ranges + LUT join) hash-matches exactly.

Physical shape:

* TRAIN+ENCODE: ``m`` independent :func:`kmeans_int` runs over sliced
  subvector views (each = the model-state-on-driver combiner loop; the
  codebooks total ``m·k·(d/m)`` ints on the driver), then the per-
  subspace assignments meet in ``m-1`` broadcast-or-exchange joins on
  the id — codes are narrow ``(id, m × int64)`` rows.
* SEARCH: the LUT broadcasts once via ``ray.put`` (``m·k`` ints);
  scoring is a vectorized per-batch map over the CODES ONLY (the
  original vectors are never read again) with a per-batch local top-k
  combiner and a k-bounded driver merge — the same bounded-merge shape
  as ``knn_topk``.

Reference parity note: the reference repo has no vector stage; this is
part of the beyond-reference training-data operator suite (with
functions/knn.py and functions/semdedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_translate_ray.functions.knn import (
    _KM_OFFSET,
    _KM_SCALE,
    kmeans_int,
)


def pq_train_encode(ds, m: int = 2, k: int = 4, iterations: int = 2,
                    id_column: str = "vec_id", column: str = "embedding",
                    num_partitions: int = 16):
    """Train ``m`` per-subspace integer codebooks and encode every
    vector.  Returns ``(codes_ds, codebooks)`` where ``codes_ds`` has
    ``(id_column, code_0 .. code_{m-1})`` (codes are centroid ids —
    kmeans_int's surviving-seed labels, deterministic) and
    ``codebooks`` is a list of ``(cids, int_matrix)`` per subspace."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import broadcast_join

    first = ds.select_columns([column]).take(1)
    if not first:
        raise ValueError("pq: empty input dataset")
    dim = len(first[0][column])
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    sub = dim // m

    codes = None
    codebooks = []
    for j in range(m):
        lo = j * sub

        def slice_fn(batch: pa.Table, lo=lo) -> pa.Table:
            df = (pl.from_arrow(batch.select([id_column, column]))
                  .with_columns(pl.col(column).list.slice(lo, sub)))
            return df.to_arrow().cast(pa.schema([
                (id_column, pa.int64()),
                (column, pa.list_(pa.float64()))]))

        assign, cb = kmeans_int(
            ds.map_batches(slice_fn, batch_format="pyarrow"),
            k=k, iterations=iterations, id_column=id_column,
            column=column, return_centroids=True)
        codebooks.append(cb)

        tag = f"code_{j}"

        def rename(batch: pa.Table, tag=tag) -> pa.Table:
            return batch.rename_columns([id_column, tag])

        assign = assign.map_batches(rename, batch_format="pyarrow")
        codes = assign if codes is None else broadcast_join(
            codes, assign, on=[id_column], how="inner",
            num_partitions=num_partitions)
    return codes, codebooks


def _scale_query(query_vec) -> np.ndarray:
    q = np.asarray(query_vec, dtype=np.float64)
    return (np.floor(q * _KM_SCALE + 0.5).astype(np.int64) + _KM_OFFSET)


def pq_topk(codes_ds, codebooks, query_vec, k: int = 10,
            id_column: str = "vec_id", _scaled_query=None):
    """Approximate top-k by asymmetric distance over PQ codes: returns
    a pyarrow Table ``(id_column, pq_dist, rank)`` with rank 1..k by
    ``(pq_dist ASC, id ASC)`` — integer-exact, oracle-comparable.
    ``_scaled_query`` (internal) bypasses the quantize transform with an
    already-int query — the residual IVF-PQ path computes per-cluster
    query residuals in the integer domain."""
    import ray

    from docling_translate_ray.util import collect_to_table

    q = (_scale_query(query_vec) if _scaled_query is None
         else np.asarray(_scaled_query, dtype=np.int64))
    m = len(codebooks)
    sub = len(q) // m
    luts = []
    for j, (cids, cmat) in enumerate(codebooks):
        d = cmat - q[j * sub:(j + 1) * sub][None, :]
        luts.append({int(c): int(v) for c, v in
                     zip(cids.tolist(),
                         np.einsum("kd,kd->k", d, d).tolist())})
    ref = ray.put(luts)

    out_schema = pa.schema([
        (id_column, pa.int64()), ("pq_dist", pa.int64())])

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return out_schema.empty_table()
        luts_now = ray.get(ref)
        df = pl.from_arrow(batch)
        df = df.with_columns(
            sum(pl.col(f"code_{j}").replace_strict(
                luts_now[j], return_dtype=pl.Int64)
                for j in range(m)).alias("pq_dist"))
        return (df.sort(["pq_dist", id_column]).head(k)
                .select([id_column, "pq_dist"])
                .to_arrow().cast(out_schema))

    cand = collect_to_table(
        codes_ds.map_batches(score, batch_format="pyarrow"),
        empty_schema=out_schema)
    import polars as pl

    out = (pl.from_arrow(cand)
           .sort(["pq_dist", id_column])
           .head(k)
           .with_columns((pl.int_range(pl.len()) + 1)
                         .cast(pl.Int64).alias("rank")))
    return out.to_arrow().cast(pa.schema(
        list(out_schema) + [pa.field("rank", pa.int64())]))


_CODES_SUBDIR = "codes"
_PART_COL = "cpart"
_COARSE_FILE = "coarse.parquet"
_CODEBOOKS_FILE = "codebooks.parquet"
_FLAGS_FILE = "flags.parquet"
_CURRENT_FILE = "CURRENT"


def _resolve_gen(index_dir: str) -> str:
    """Root of the LIVE index generation: ``CURRENT`` names a
    ``gen-*`` subdirectory (the atomic-rebuild layout); an index built
    before the pointer existed is its own root (legacy layout)."""
    import os

    cur = os.path.join(index_dir, _CURRENT_FILE)
    if os.path.exists(cur):
        with open(cur) as f:
            return os.path.join(index_dir, f.read().strip())
    return index_dir


def build_ivfpq_index(ds, index_dir: str, n_coarse: int = 4, m: int = 2,
                      k: int = 4, iterations: int = 2,
                      id_column: str = "vec_id", column: str = "embedding",
                      num_partitions: int = 16, residual: bool = False):
    """ONE-TIME IVF-PQ build (the standing structure a 10^12-vector
    corpus actually serves from): a coarse integer k-means partitions
    the ids, PQ codes replace the vectors, and the index on disk is
    coarse-partitioned parquet of NARROW code rows
    (``index_dir/codes/cpart=<c>/``) plus two small meta tables (coarse
    centroids, per-subspace codebooks).  Queries
    (:func:`ivfpq_topk`) physically read only their ``n_probe``
    partition directories of codes — the vectors are gone from the
    serving path entirely.

    Codes are of the RAW vectors by default (no residual re-encoding),
    so a full-probe query equals flat :func:`pq_topk` exactly — which
    is what the driver oracle checks (the same knn_ivf-vs-knn_topk
    full-probe-is-exact pattern).

    ``residual=True`` trains and encodes ``vec − coarse_centroid``
    instead (Jégou 2011 §IV "IVFADC": residuals concentrate near zero,
    so the same m×k code budget quantizes finer — measured on planted
    clusters in tests/test_pq.py).  Integer-exact formulation: the
    residual is computed IN the int domain (``q(x) − c + OFFSET``, the
    uniform re-offset keeping values positive) and re-emitted as floats
    whose re-quantization is exact — the PQ codebooks therefore live in
    the ``r_int + 2·OFFSET`` domain (quantizer re-adds OFFSET), and the
    per-cluster query residual matches it — so kmeans_int over
    residuals and the SQL oracle's identical residual CTE reproduce the
    codes bit-for-bit.  Queries need a PER-PROBED-CLUSTER lookup table
    (the query's residual differs per cluster); the ``residual`` flag
    is recorded in the generation's flags table and honored by
    :func:`ivfpq_topk`.  Returns ``(codebooks, coarse)``.

    Crash-safe rebuild: meta tables AND the codes tree are written into
    a fresh ``gen-<uuid>`` subdirectory, then the tiny ``CURRENT``
    pointer file flips atomically (``os.replace``) — a crash at ANY
    point leaves readers on the previous complete generation, never on
    new-meta-without-codes (whose missing partition dirs a probe would
    silently skip).  Stale generations are pruned only after the flip.
    """
    import os
    import shutil
    import uuid

    import pyarrow.parquet as pqt

    from docling_translate_ray.stages.shuffle import broadcast_join

    coarse_assign, coarse = kmeans_int(
        ds, k=n_coarse, iterations=iterations, id_column=id_column,
        column=column, return_centroids=True)
    pq_input = ds
    if residual:
        import ray

        from docling_translate_ray.functions.knn import _to_int_matrix

        ccids_a, ccmat_a = coarse
        order = np.argsort(ccids_a)
        cids_sorted = ccids_a[order]
        cmat_sorted = ccmat_a[order]
        cent_ref = ray.put((cids_sorted, cmat_sorted))

        res_schema = pa.schema([
            (id_column, pa.int64()), (column, pa.list_(pa.float64()))])

        def to_residual(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return res_schema.empty_table()
            cids_now, cmat_now = ray.get(cent_ref)
            mat = _to_int_matrix(batch, column)
            cl = np.asarray(batch["cluster_id"].to_pylist(), dtype=np.int64)
            cent_rows = cmat_now[np.searchsorted(cids_now, cl)]
            # int residual, re-offset positive, re-emitted as floats
            # whose floor(x·10^6+½) re-quantization is exact (|r| ≤
            # ~2·10^7 ⇒ float64 round-trip error ≪ ½)
            res = (mat - cent_rows + _KM_OFFSET).astype(np.float64) / _KM_SCALE
            return pa.table({
                id_column: batch[id_column],
                column: pa.array(res.tolist(), pa.list_(pa.float64())),
            }).cast(res_schema)

        pq_input = broadcast_join(
            ds.select_columns([id_column, column]), coarse_assign,
            on=[id_column], how="inner", num_partitions=num_partitions,
        ).map_batches(to_residual, batch_format="pyarrow")
    codes, codebooks = pq_train_encode(
        pq_input, m=m, k=k, iterations=iterations, id_column=id_column,
        column=column, num_partitions=num_partitions)

    gen = "gen-" + uuid.uuid4().hex[:12]
    gen_dir = os.path.join(index_dir, gen)
    os.makedirs(gen_dir, exist_ok=True)
    ccids, ccmat = coarse
    pqt.write_table(pa.table({
        "cid": pa.array(ccids.tolist(), pa.int64()),
        "vals": pa.array(ccmat.tolist(), pa.list_(pa.int64())),
    }), os.path.join(gen_dir, _COARSE_FILE))
    rows_s, rows_c, rows_v = [], [], []
    for j, (cids, cmat) in enumerate(codebooks):
        for c, v in zip(cids.tolist(), cmat.tolist()):
            rows_s.append(j)
            rows_c.append(c)
            rows_v.append(v)
    pqt.write_table(pa.table({
        "subspace": pa.array(rows_s, pa.int64()),
        "cid": pa.array(rows_c, pa.int64()),
        "vals": pa.array(rows_v, pa.list_(pa.int64())),
    }), os.path.join(gen_dir, _CODEBOOKS_FILE))
    pqt.write_table(pa.table({
        "residual": pa.array([residual], pa.bool_()),
    }), os.path.join(gen_dir, _FLAGS_FILE))

    def to_part(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [_PART_COL if n == "cluster_id" else n
             for n in batch.schema.names])

    placed = broadcast_join(
        codes, coarse_assign.map_batches(to_part, batch_format="pyarrow"),
        on=[id_column], how="inner", num_partitions=num_partitions)
    placed.write_parquet(os.path.join(gen_dir, _CODES_SUBDIR),
                         partition_cols=[_PART_COL])
    tmp_ptr = os.path.join(index_dir, _CURRENT_FILE + ".tmp-" + gen)
    with open(tmp_ptr, "w") as f:
        f.write(gen)
    os.replace(tmp_ptr, os.path.join(index_dir, _CURRENT_FILE))
    for name in os.listdir(index_dir):  # prune superseded generations
        if name.startswith("gen-") and name != gen:
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
        elif name in (_CODES_SUBDIR, _COARSE_FILE, _CODEBOOKS_FILE):
            # legacy pre-pointer layout at the index root
            p = os.path.join(index_dir, name)
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
    return codebooks, coarse


def load_ivfpq_meta(index_dir: str):
    """Return ``(codebooks, (ccids, ccmat))`` from the meta tables of
    the live generation (:func:`_resolve_gen`)."""
    import os

    import pyarrow.parquet as pqt

    index_dir = _resolve_gen(index_dir)
    ct = pqt.read_table(os.path.join(index_dir, _COARSE_FILE)).sort_by("cid")
    coarse = (np.asarray(ct["cid"].to_pylist(), dtype=np.int64),
              np.asarray(ct["vals"].to_pylist(), dtype=np.int64))
    bt = pqt.read_table(os.path.join(index_dir, _CODEBOOKS_FILE))
    codebooks = []
    for j in sorted(set(bt["subspace"].to_pylist())):
        sel = bt.filter(
            pa.compute.equal(bt["subspace"], j)).sort_by("cid")
        codebooks.append((
            np.asarray(sel["cid"].to_pylist(), dtype=np.int64),
            np.asarray(sel["vals"].to_pylist(), dtype=np.int64)))
    return codebooks, coarse


def load_ivfpq_flags(index_dir: str) -> dict:
    """Build-time flags of the live generation; an index written before
    the flags table existed is a raw-vector (non-residual) one."""
    import os

    import pyarrow.parquet as pqt

    p = os.path.join(_resolve_gen(index_dir), _FLAGS_FILE)
    if not os.path.exists(p):
        return {"residual": False}
    t = pqt.read_table(p)
    return {"residual": bool(t["residual"][0].as_py())}


def ivfpq_probe_cids(index_dir: str, query_vec, n_probe: int) -> list[int]:
    """The coarse partitions a query would read (ascending int distance,
    ties to the lowest cid) — exposed so tests can prove the pruning."""
    _, (ccids, ccmat) = load_ivfpq_meta(index_dir)
    qi = _scale_query(query_vec)
    d = ccmat - qi[None, :]
    dist = np.einsum("kd,kd->k", d, d)
    order = np.lexsort((ccids, dist))[:n_probe]
    return [int(ccids[i]) for i in order]


def ivfpq_topk(index_dir: str, query_vec, n_probe: int = 2, k: int = 10,
               id_column: str = "vec_id"):
    """ADC top-k over ONLY the ``n_probe`` nearest coarse partitions'
    code files — the pruned standing-index read.  On a raw-vector index
    a full probe (``n_probe == n_coarse``) is exactly flat
    :func:`pq_topk`.  On a residual index (IVFADC) every probed
    partition gets its OWN lookup table — the query's residual against
    that partition's coarse centroid — and the per-partition top-k
    merge on the driver stays k-bounded (n_probe × k rows)."""
    import os

    import ray.data

    out_schema = pa.schema([(id_column, pa.int64()),
                            ("pq_dist", pa.int64()),
                            ("rank", pa.int64())])
    codebooks, (ccids, ccmat) = load_ivfpq_meta(index_dir)
    gen_dir = _resolve_gen(index_dir)
    probe = ivfpq_probe_cids(index_dir, query_vec, n_probe)

    def part_paths(c: int) -> list[str]:
        pdir = os.path.join(gen_dir, _CODES_SUBDIR, f"{_PART_COL}={c}")
        if not os.path.isdir(pdir):
            return []
        return [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                if f.endswith(".parquet")]

    if not load_ivfpq_flags(index_dir)["residual"]:
        paths = [p for c in probe for p in part_paths(c)]
        if not paths:
            return out_schema.empty_table()
        return pq_topk(ray.data.read_parquet(paths), codebooks, query_vec,
                       k=k, id_column=id_column)

    import polars as pl

    qs = _scale_query(query_vec)
    pos = {int(c): i for i, c in enumerate(ccids.tolist())}
    parts = []
    for c in probe:
        paths = part_paths(c)
        if not paths:
            continue
        # codebook domain is r_int + 2·OFFSET: the residual floats are
        # emitted at (r_int + OFFSET)/SCALE and pq_train_encode's
        # quantizer adds the second OFFSET — match it exactly
        qres = qs - ccmat[pos[c]] + 2 * _KM_OFFSET
        parts.append(pq_topk(
            ray.data.read_parquet(paths), codebooks, None, k=k,
            id_column=id_column, _scaled_query=qres,
        ).drop_columns(["rank"]))
    if not parts:
        return out_schema.empty_table()
    merged = (pl.from_arrow(pa.concat_tables(parts))
              .sort(["pq_dist", id_column]).head(k)
              .with_columns((pl.int_range(pl.len()) + 1)
                            .cast(pl.Int64).alias("rank")))
    return merged.to_arrow().cast(out_schema)


def ivfpq_insert(ds, index_dir: str, id_column: str = "vec_id",
                 column: str = "embedding") -> None:
    """Append new vectors to an EXISTING IVF-PQ index using the live
    generation's OWN frozen model (coarse centroids + per-subspace
    codebooks — NO retrain): each vector is coarse-assigned (ties to
    the lowest cid, the kmeans_int rule), residual-shifted when the
    generation was built ``residual=True`` (codebook domain
    ``r_int + 2·OFFSET`` — see :func:`build_ivfpq_index`), per-subspace
    encoded against the frozen codebooks, and written as uuid-named
    part files into the generation's ``codes/cpart=<c>/`` dirs —
    probe-visible immediately, old vectors' codes untouched.

    Re-encoding is bit-identical to the build (same int kernels), so
    re-inserting already-indexed vectors creates EXACT duplicate rows
    that :func:`ivfpq_compact` collapses — the shared standing-index
    crash contract (duplicates possible in the crash window, loss
    impossible).  A concurrent :func:`build_ivfpq_index` rebuild flips
    ``CURRENT`` to a fresh generation and supersedes all inserts (the
    rebuild reads the base dataset); inserts between rebuilds are the
    crawl-cadence path, exactly like ``minhash_index_insert`` /
    ``url_index_insert``."""
    import os

    import ray

    codebooks, (ccids, ccmat) = load_ivfpq_meta(index_dir)
    residual = load_ivfpq_flags(index_dir)["residual"]
    gen_dir = _resolve_gen(index_dir)
    m = len(codebooks)
    sub = ccmat.shape[1] // m
    ref = ray.put((codebooks, ccids, ccmat))

    out_schema = pa.schema(
        [(id_column, pa.int64())]
        + [(f"code_{j}", pa.int64()) for j in range(m)]
        + [(_PART_COL, pa.int64())])

    def encode(batch: pa.Table) -> pa.Table:
        from docling_translate_ray.functions.knn import _to_int_matrix

        if batch.num_rows == 0:
            return out_schema.empty_table()
        cbs, cn, cm = ray.get(ref)
        mat = _to_int_matrix(batch, column)
        d = mat[:, None, :] - cm[None, :, :]
        best = np.argmin(np.einsum("bkd,bkd->bk", d, d), axis=1)
        cpart = cn[best]  # cn sorted ascending → ties to lowest cid
        enc = mat
        if residual:
            # build emitted residual floats whose re-quantization lands
            # at r_int + 2·OFFSET; encode in that domain directly
            enc = mat - cm[best] + 2 * _KM_OFFSET
        cols = {id_column:
                batch[id_column].combine_chunks().cast(pa.int64())}
        for j, (cids_j, cmat_j) in enumerate(cbs):
            seg = enc[:, j * sub:(j + 1) * sub]
            dj = seg[:, None, :] - cmat_j[None, :, :]
            bj = np.argmin(np.einsum("bkd,bkd->bk", dj, dj), axis=1)
            cols[f"code_{j}"] = pa.array(cids_j[bj], pa.int64())
        cols[_PART_COL] = pa.array(cpart, pa.int64())
        return pa.table(cols).cast(out_schema)

    (ds.select_columns([id_column, column])
       .map_batches(encode, batch_format="pyarrow")
       .write_parquet(os.path.join(gen_dir, _CODES_SUBDIR),
                      partition_cols=[_PART_COL]))


def ivfpq_compact(index_dir: str, id_column: str = "vec_id",
                  max_files_per_partition: int = 1) -> dict:
    """Merge each coarse partition's insert generations into one
    id-sorted file (the shared LSM maintenance contract —
    rename-visible-before-delete, exact-duplicate rows collapse)."""
    import os

    from docling_translate_ray.util import compact_partition_dirs

    load_ivfpq_meta(index_dir)  # fail loudly on a non-index dir
    base = os.path.join(_resolve_gen(index_dir), _CODES_SUBDIR)
    pdirs = [os.path.join(base, d) for d in sorted(os.listdir(base))
             if os.path.isdir(os.path.join(base, d))] \
        if os.path.isdir(base) else []
    return compact_partition_dirs(
        pdirs, sort_keys=(id_column,),
        max_files_per_partition=max_files_per_partition)
