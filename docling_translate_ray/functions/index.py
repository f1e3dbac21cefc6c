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


def build_inverted_index(ds, index_dir: str, num_partitions: int = 32,
                         column: str = "text",
                         id_column: str = "doc_id") -> str:
    import shutil

    import polars as pl
    import pyarrow.parquet as pq

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
        )
        tbl = out.select(["term", id_column, "tf"]).to_arrow().cast(
            pa.schema([("term", pa.string()), (id_column, pa.int64()),
                       ("tf", pa.int64())])
        )
        parts = _term_partitions(out["term"], num_partitions)
        return tbl.append_column(_PART_COL, pa.array(parts, pa.int32()))

    os.makedirs(index_dir, exist_ok=True)
    # rebuild replaces the whole postings store (same rationale as the IVF
    # build: uuid-named parts from a prior generation must not survive)
    shutil.rmtree(os.path.join(index_dir, _POSTINGS_SUBDIR), ignore_errors=True)
    pq.write_table(
        pa.table({"num_partitions": pa.array([num_partitions], pa.int64()),
                  "id_column": pa.array([id_column], pa.string())}),
        os.path.join(index_dir, _META_FILE),
    )
    ds.map_batches(explode_postings, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, _POSTINGS_SUBDIR), partition_cols=[_PART_COL]
    )
    return index_dir


def lookup_postings(index_dir: str, terms: list[str]):
    """Postings for ``terms`` via a pruned partition read; returns a
    Dataset (term, <id_column>, tf) — empty if no term's partition exists."""
    import pyarrow.parquet as pq

    import ray.data

    meta = pq.read_table(os.path.join(index_dir, _META_FILE))
    num_partitions = int(meta["num_partitions"][0].as_py())
    id_column = meta["id_column"][0].as_py()
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
                      "tf": pa.array([], pa.int64())})
    if not paths:
        return ray.data.from_arrow(empty)

    want_arr = pa.array(want, pa.string())

    def keep_terms(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch.filter(pc.is_in(batch["term"], value_set=want_arr))
        return out.select(["term", id_column, "tf"])

    return ray.data.read_parquet(
        paths, columns=["term", id_column, "tf"]
    ).map_batches(keep_terms, batch_format="pyarrow")
