"""Inverted text index — term → posting rows (doc_id, tf), physically
partitioned by term hash: the IVF pattern (functions/knn.py) applied to
text search.

* :func:`build_inverted_index` — ONE pass explodes (term, doc_id, tf) per
  doc and writes ``index_dir/postings/tpart=<hash(term) % P>/`` hive
  parquet.  The shuffle-free layout relies on the writer's task-level
  partitioning (every task writes its own files under the right
  partition dirs); a term's postings may span files but never partitions.
* :func:`lookup_postings` — computes the query terms' partitions with the
  SAME stable hash and physically reads ONLY those partition directories
  (the other ``P - |parts|`` are never listed), then filters to the exact
  terms.  Lookup cost scales with partition size (corpus/P), not corpus.

Term hashing is polars ``hash_rows`` (process-stable xxhash — the same
kernel contract as ``stages.shuffle.add_pkey``); ``P`` is recorded in
``index_meta.parquet`` and re-read at lookup, so build and probe can be
different processes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_POSTINGS_SUBDIR = "postings"
_META_FILE = "index_meta.parquet"
_PART_COL = "tpart"
_HASH_SEED = 42


def _term_partitions(terms, num_partitions: int) -> np.ndarray:
    import polars as pl

    if not isinstance(terms, pl.Series):
        terms = pl.Series("term", list(terms), dtype=pl.String)
    h = pl.DataFrame({"term": terms}).hash_rows(seed=_HASH_SEED).to_numpy()
    return (h % np.uint64(num_partitions)).astype(np.int32)


def _explode_postings_fn(column: str, id_column: str, num_partitions: int):
    """Per-batch (term, id, tf, tpart) explode — shared by build and
    insert so both generations partition terms identically."""
    import polars as pl

    def explode_postings(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[column]).fill_null("")
        ids = pl.from_arrow(batch[id_column]).cast(pl.Int64)
        out = (
            pl.DataFrame({id_column: ids, "t": s})
            .select(id_column, pl.col("t").str.extract_all(r"\S+").alias("term"))
            .explode("term")
            .drop_nulls("term")
            .group_by([id_column, "term"])
            .agg(pl.len().cast(pl.Int64).alias("tf"))
            # dl (doc token count) denormalized onto every posting row —
            # the classic impact-index trade: +8 B/posting buys
            # join-free length-normalized scoring (bm25_rank) at query
            # time.  A doc's text is one input row, so the window sum
            # over this batch IS the doc's full length.
            .with_columns(pl.col("tf").sum().over(id_column).alias("dl"))
        )
        tbl = out.select(["term", id_column, "tf", "dl"]).to_arrow().cast(
            pa.schema([("term", pa.string()), (id_column, pa.int64()),
                       ("tf", pa.int64()), ("dl", pa.int64())])
        )
        parts = _term_partitions(out["term"], num_partitions)
        return tbl.append_column(_PART_COL, pa.array(parts, pa.int32()))

    return explode_postings


def build_inverted_index(ds, index_dir: str, num_partitions: int = 32,
                         column: str = "text",
                         id_column: str = "doc_id") -> str:
    import shutil

    import pyarrow.parquet as pq

    explode_postings = _explode_postings_fn(column, id_column, num_partitions)

    os.makedirs(index_dir, exist_ok=True)
    # rebuild replaces the whole postings store (same rationale as the IVF
    # build: uuid-named parts from a prior generation must not survive)
    shutil.rmtree(os.path.join(index_dir, _POSTINGS_SUBDIR), ignore_errors=True)
    pq.write_table(
        pa.table({"num_partitions": pa.array([num_partitions], pa.int64()),
                  "id_column": pa.array([id_column], pa.string()),
                  "column": pa.array([column], pa.string())}),
        os.path.join(index_dir, _META_FILE),
    )
    ds.map_batches(explode_postings, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, _POSTINGS_SUBDIR), partition_cols=[_PART_COL]
    )
    return index_dir


def inverted_index_insert(ds, index_dir: str) -> None:
    """Append a document increment to an EXISTING index (the crawl-cadence
    mirror of ``functions/dedup.minhash_index_insert``): the increment's
    postings are exploded with the index's OWN recorded term hash / P and
    written into the same ``tpart=`` partition dirs — parquet part files
    are uuid-named per execution, so appends never overwrite and a later
    lookup sees old + new generations as one dataset.  The standing
    corpus is never rescanned.  Caller contract: ids are unique across
    the index's whole lifetime."""
    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(index_dir, _META_FILE))
    num_partitions = int(meta["num_partitions"][0].as_py())
    id_column = meta["id_column"][0].as_py()
    column = meta["column"][0].as_py()
    ds.map_batches(
        _explode_postings_fn(column, id_column, num_partitions),
        batch_format="pyarrow",
    ).write_parquet(
        os.path.join(index_dir, _POSTINGS_SUBDIR), partition_cols=[_PART_COL]
    )


def inverted_index_compact(index_dir: str,
                           max_files_per_partition: int = 1) -> dict:
    """LSM-style postings maintenance (the mirror of
    ``functions/dedup.minhash_index_compact``): merge each ``tpart=``
    directory's accumulated insert generations into one term-sorted
    parquet file, bounding lookup read fan-out after many crawl-cadence
    inserts — term sorting also tightens parquet row-group statistics
    for the exact-term filter inside :func:`lookup_postings`.  Same
    crash contract as the shared machinery: duplicates possible in the
    crash window (benign: ids are unique per lifetime, so a duplicated
    posting row only double-counts a tf if the window is never
    compacted again), loss impossible; re-running heals."""
    import pyarrow.parquet as pq

    from docling_translate_ray.util import compact_partition_dirs

    pq.read_table(os.path.join(index_dir, _META_FILE))  # fail loudly
    base = os.path.join(index_dir, _POSTINGS_SUBDIR)
    pdirs = [os.path.join(base, d) for d in sorted(os.listdir(base))
             if os.path.isdir(os.path.join(base, d))] \
        if os.path.isdir(base) else []
    return compact_partition_dirs(
        pdirs, sort_keys=("term",),
        max_files_per_partition=max_files_per_partition)


def lookup_postings(index_dir: str, terms: list[str],
                    with_dl: bool = False):
    """Postings for ``terms`` via a pruned partition read; returns a
    Dataset (term, <id_column>, tf[, dl]) — empty if no term's partition
    exists.  ``with_dl=True`` also reads the per-posting doc-length
    column (stored at build/insert time; an index written before dl
    storage must be rebuilt to use it)."""
    import pyarrow.parquet as pq

    import ray.data

    meta = pq.read_table(os.path.join(index_dir, _META_FILE))
    num_partitions = int(meta["num_partitions"][0].as_py())
    id_column = meta["id_column"][0].as_py()
    cols = ["term", id_column, "tf"] + (["dl"] if with_dl else [])
    want = sorted(set(terms))
    parts = sorted({int(p) for p in _term_partitions(want, num_partitions)})
    paths: list[str] = []
    for p in parts:
        pdir = os.path.join(index_dir, _POSTINGS_SUBDIR, f"{_PART_COL}={p}")
        if os.path.isdir(pdir):
            paths.extend(
                os.path.join(pdir, f)
                for f in sorted(os.listdir(pdir))
                if f.endswith(".parquet")
            )
    empty = pa.table({"term": pa.array([], pa.string()),
                      id_column: pa.array([], pa.int64()),
                      "tf": pa.array([], pa.int64()),
                      **({"dl": pa.array([], pa.int64())}
                         if with_dl else {})})
    if not paths:
        return ray.data.from_arrow(empty)

    want_arr = pa.array(want, pa.string())

    def keep_terms(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch.filter(pc.is_in(batch["term"], value_set=want_arr))
        return out.select(cols)

    return ray.data.read_parquet(
        paths, columns=cols
    ).map_batches(keep_terms, batch_format="pyarrow")


def search_rank(index_dir: str, terms: list[str], n_docs: int):
    """Ranked retrieval over the index: every doc matching ≥1 query term,
    scored by the integer-exact tf-idf analog ``Σ tf · (n_docs − df)``
    (same salience as ``text_stats.doc_salient_terms`` — a float idf
    would drift between engines).

    Scale shape: postings arrive via the PRUNED partition read
    (:func:`lookup_postings` — cost scales with |query terms| ×
    partition size, never the corpus); per-term document frequencies are
    a tiny ``grouped_sum`` (≤ |terms| rows) joined back as a broadcast;
    per-doc scores are one more combiner-first ``grouped_sum`` keyed by
    doc.  Returns a Dataset ``(doc_id, score, n_terms_matched)``.
    """
    import polars as pl

    import ray

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import collect_to_table

    postings = lookup_postings(index_dir, terms)
    id_column = [c for c in postings.schema().names if c not in ("term", "tf")][0]

    dfreq = collect_to_table(
        grouped_sum(
            postings.map_batches(
                lambda b: b.select(["term"]).append_column(
                    "_one", pa.array([1] * b.num_rows, pa.int64())),
                batch_format="pyarrow",
            ),
            ["term"],
            [pl.col("_one").sum().alias("_one")],
            {"df": "_one"},
        ),
        empty_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )
    df_ref = ray.put(dfreq)

    def weight(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(ray.get(df_ref))
        df = pl.from_arrow(batch).join(d, on="term", how="inner")
        return df.select(
            pl.col(id_column),
            (pl.col("tf") * (n_docs - pl.col("df"))).alias("_s"),
            pl.lit(1, dtype=pl.Int64).alias("_m"),
        ).to_arrow()

    return grouped_sum(
        postings.map_batches(weight, batch_format="pyarrow"),
        [id_column],
        [pl.col("_s").sum().alias("_s"), pl.col("_m").sum().alias("_m")],
        {"score": "_s", "n_terms_matched": "_m"},
    )


def bm25_rank(index_dir: str, terms: list[str], n_docs: int, avgdl: int,
              k1_milli: int = 1200, b_milli: int = 750):
    """Okapi BM25 ranked retrieval over the index — :func:`search_rank`
    with the BM25 tf saturation + doc-length normalization, in integer
    fixed point (milli units) so the DuckDB oracle replays it
    bit-for-bit (a float BM25 would drift between engines; same
    rationale as search_rank's integer idf analog, which this keeps:
    ``idf = n_docs − df``).

    Per matched posting, with S=1000, k1m=``k1_milli``, bm=``b_milli``::

        tf_norm_milli = tf·(k1m+S)·S·S·avgdl
                        // (tf·S·S·avgdl + k1m·((S−bm)·avgdl + bm·dl))
        score_milli   = Σ_terms (n_docs − df) · tf_norm_milli

    which is floor(1000 · tf(k1+1)/(tf + k1(1−b+b·dl/avgdl))) exactly.
    All-int64: safe while tf·avgdl < ~4·10^9 (tf and avgdl are token
    counts; a 10^5-token doc against a 10^4 average is still 10^9).

    ``avgdl`` (mean doc token count, floor) and ``n_docs`` are corpus
    stats the caller maintains — at scale they come from the ingest
    lineage, never a corpus rescan here.  ``dl`` rides on every posting
    row (stored at build time), so scoring needs NO doc-side join: cost
    stays |terms| × partition size, like search_rank.

    Scale shape identical to search_rank: pruned partition read →
    tiny per-term df grouped_sum broadcast → one combiner-first
    grouped_sum keyed by doc.  Returns (doc_id, score_milli,
    n_terms_matched).
    """
    import polars as pl

    import ray

    from docling_translate_ray.stages.shuffle import grouped_sum
    from docling_translate_ray.util import collect_to_table

    if avgdl < 1:
        raise ValueError(f"bm25_rank: avgdl must be >= 1 (got {avgdl})")
    postings = lookup_postings(index_dir, terms, with_dl=True)
    id_column = [c for c in postings.schema().names
                 if c not in ("term", "tf", "dl")][0]

    dfreq = collect_to_table(
        grouped_sum(
            postings.map_batches(
                lambda b: b.select(["term"]).append_column(
                    "_one", pa.array([1] * b.num_rows, pa.int64())),
                batch_format="pyarrow",
            ),
            ["term"],
            [pl.col("_one").sum().alias("_one")],
            {"df": "_one"},
        ),
        empty_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )
    df_ref = ray.put(dfreq)
    S = 1000

    def weight(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(ray.get(df_ref))
        df = pl.from_arrow(batch).join(d, on="term", how="inner")
        num = pl.col("tf") * ((k1_milli + S) * S * S * avgdl)
        den = (pl.col("tf") * (S * S * avgdl)
               + (k1_milli * (S - b_milli) * avgdl)
               + (k1_milli * b_milli) * pl.col("dl"))
        return df.select(
            pl.col(id_column),
            ((n_docs - pl.col("df")) * (num // den)).alias("_s"),
            pl.lit(1, dtype=pl.Int64).alias("_m"),
        ).to_arrow()

    return grouped_sum(
        postings.map_batches(weight, batch_format="pyarrow"),
        [id_column],
        [pl.col("_s").sum().alias("_s"), pl.col("_m").sum().alias("_m")],
        {"score_milli": "_s", "n_terms_matched": "_m"},
    )
