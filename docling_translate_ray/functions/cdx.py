"""CDX-style sorted URL index — the Common-Crawl index-service analog
(range-partitioned SURT-sorted parquet + a boundary manifest, prefix
lookups reading ONLY the partitions whose key range intersects the
prefix).  Completes the standing-index family next to the MinHash band
store (functions/dedup), the BM25 postings store (functions/index) and
the IVF-PQ codes tree (functions/pq); reference analog: the history /
output-layout bookkeeping of `/root/reference/src/core.py` generalised
to a queryable per-URL index.

SURT spec (frozen; the DuckDB oracle mirrors it regex-for-regex — the
construct subset is RE2 ∩ rust-regex, no lookaround, no ``\\s``):

1. drop the fragment               (``#.*$`` → "")
2. drop the query string           (``\\?.*$`` → "")
3. host = the authority of a ``scheme://`` URL, lowercased, with
   userinfo (``user@``), a ``:port`` suffix and a leading ``www.``
   label dropped (:func:`urltools.extract_hosts`); scheme-less rows
   have no authority and get host ""
4. path = the remainder after ``scheme://authority``, LOWERCASED
5. ``surt = ','.join(reversed(host.split('.'))) + ')' + path``
   (``https://WWW.Example.COM/A/B`` → ``com,example)/a/b``)

Scale shape:

* **build** — one vectorized SURT pass; partition boundaries come from
  TWO levels of evenly-spaced per-block sampling (level 1: ≤16 keys per
  input block; level 2: ≤16 keys per batch of level-1 rows), so the
  driver-side collect is ~16²/batch_rows of the block count, never the
  corpus (fenced with an explicit budget below).  Rows map to
  ``spart = searchsorted(boundaries, surt)`` — the boundary list
  (< num_partitions short strings) rides in the task closure, the one
  exchange is the partitioned parquet write itself.
* **lookup** — a prefix ``p`` matches only surts in
  ``[p, next(p))``; both ends map through the SAME searchsorted, so the
  read touches only the partition directories in that index range
  (prune PROVEN in tests by deleting every other partition).  Row-group
  statistics inside each partition tighten further after
  :func:`url_index_compact` sorts by surt.
* **insert / compact** — crawl-cadence appends write uuid-named part
  files into the existing ``spart=`` dirs using the manifest's OWN
  recorded boundaries (the standing corpus is never rescanned);
  LSM-style compaction merges generations per partition, sorted by
  surt (same crash contract as the MinHash/postings stores: duplicate
  rows possible in the crash window, loss impossible).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_META_FILE = "cdx_meta.parquet"
_PARTS_SUBDIR = "surt_parts"
_PART_COL = "spart"
# driver-side budget for the boundary sample collect (two-level spaced
# sampling keeps the real count orders of magnitude below this; the
# fence exists so a pathological block layout fails loudly, not slowly)
_MAX_SAMPLE_ROWS = 1_000_000
_N_SAMPLES = 16  # spaced keys kept per block (level 1) / batch (level 2)

_SCHEME_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def surt_series(s):
    """Vectorized SURT of a polars String Series of URLs (spec above)."""
    from docling_translate_ray.functions.urltools import extract_hosts

    u = s.fill_null("")
    u = u.str.replace(r"#.*$", "")  # 1. fragment
    u = u.str.replace(r"\?.*$", "")  # 2. query
    host = extract_hosts(u)  # 3. host (lower, userinfo/port/www dropped)
    path = u.str.replace(_SCHEME_AUTH_RE, "").str.to_lowercase()  # 4.
    return (host.str.split(".").list.reverse().list.join(",")
            + ")" + path)  # 5.


def surt_batch(batch: pa.Table, url_column: str = "url") -> pa.Table:
    """map_batches body: append a ``surt`` column."""
    import polars as pl

    surt = surt_series(pl.from_arrow(batch[url_column]))
    return batch.append_column("surt", surt.to_arrow().cast(pa.string()))


def _spaced_samples_fn(url_column: str | None):
    """Per-block combiner: the block's row count + ≤ _N_SAMPLES
    evenly-spaced SORTED surt keys (a spaced sample bounds rank error by
    count/n_samples per block — the frontier_schedule hot-key recipe).
    ``url_column=None`` means the input already carries ``surt``
    (level-2 reduction over level-1 sample rows)."""
    import polars as pl

    def sample_block(batch: pa.Table) -> pa.Table:
        if url_column is None:
            surt = pl.from_arrow(batch["surt"])
        else:
            surt = surt_series(pl.from_arrow(batch[url_column]))
        df = pl.DataFrame({"surt": surt}).sort("surt")
        n = df.height
        if n == 0:
            return pa.table({"surt": pa.array([], pa.string()),
                             "_n": pa.array([], pa.int64())})
        idx = (pl.int_range(0, _N_SAMPLES) * (n - 1)
               // max(_N_SAMPLES - 1, 1)).unique()
        out = df.select(pl.col("surt").gather(idx))
        return pa.table({
            "surt": out["surt"].to_arrow().cast(pa.string()),
            "_n": pa.array([n] * out.height, pa.int64()),
        })

    return sample_block


def _sample_boundaries(ds, url_column: str,
                       num_partitions: int) -> list[str]:
    """num_partitions-1 internal SURT boundaries from two-level spaced
    sampling (collect is per-block samples of per-block samples — tiny)."""
    level1 = ds.select_columns([url_column]).map_batches(
        _spaced_samples_fn(url_column), batch_format="pyarrow")
    level2 = level1.map_batches(
        _spaced_samples_fn(None), batch_format="pyarrow")
    rows = level2.take_all()  # FENCED: ≤ _N_SAMPLES per level-1 batch
    if len(rows) > _MAX_SAMPLE_ROWS:
        raise ValueError(
            f"cdx boundary sample exploded ({len(rows)} rows > "
            f"{_MAX_SAMPLE_ROWS}): add a sampling level")
    keys = sorted(r["surt"] for r in rows)
    if not keys:
        return []
    cut = [keys[(i * (len(keys) - 1)) // num_partitions]
           for i in range(1, num_partitions)]
    # dedupe while preserving order (heavy key skew can repeat a cut;
    # fewer, unique boundaries just mean fewer, larger partitions)
    seen: set[str] = set()
    out = []
    for b in cut:
        if b not in seen:
            seen.add(b)
            out.append(b)
    return out


def _assign_fn(url_column: str, id_column: str, boundaries: list[str]):
    import polars as pl

    bnd = np.array(boundaries, dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([url_column, id_column]))
        surt = surt_series(df[url_column])
        spart = np.searchsorted(
            bnd, np.asarray(surt.to_list(), dtype=object), side="right")
        return pa.table({
            "surt": surt.to_arrow().cast(pa.string()),
            id_column: df[id_column].cast(pl.Int64).to_arrow(),
            url_column: df[url_column].fill_null("").to_arrow()
            .cast(pa.string()),
            _PART_COL: pa.array(spart.astype(np.int64), pa.int64()),
        })

    return assign


def build_url_index(ds, index_dir: str, num_partitions: int = 16,
                    url_column: str = "url",
                    id_column: str = "doc_id") -> str:
    """Build (or REPLACE) a sorted URL index under ``index_dir``."""
    import shutil

    import pyarrow.parquet as pq

    boundaries = _sample_boundaries(ds, url_column, num_partitions)
    os.makedirs(index_dir, exist_ok=True)
    shutil.rmtree(os.path.join(index_dir, _PARTS_SUBDIR),
                  ignore_errors=True)
    pq.write_table(
        pa.table({
            "boundaries": pa.array([boundaries], pa.list_(pa.string())),
            "url_column": pa.array([url_column], pa.string()),
            "id_column": pa.array([id_column], pa.string()),
        }),
        os.path.join(index_dir, _META_FILE),
    )
    ds.map_batches(
        _assign_fn(url_column, id_column, boundaries),
        batch_format="pyarrow",
    ).write_parquet(os.path.join(index_dir, _PARTS_SUBDIR),
                    partition_cols=[_PART_COL])
    return index_dir


def _read_meta(index_dir: str) -> tuple[list[str], str, str]:
    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(index_dir, _META_FILE))
    return (meta["boundaries"][0].as_py(),
            meta["url_column"][0].as_py(),
            meta["id_column"][0].as_py())


def url_index_insert(ds, index_dir: str) -> None:
    """Append a URL increment to an EXISTING index with the manifest's
    recorded boundaries (uuid part names — appends never overwrite; a
    lookup sees old + new generations as one dataset)."""
    boundaries, url_column, id_column = _read_meta(index_dir)
    ds.map_batches(
        _assign_fn(url_column, id_column, boundaries),
        batch_format="pyarrow",
    ).write_parquet(os.path.join(index_dir, _PARTS_SUBDIR),
                    partition_cols=[_PART_COL])


def url_index_compact(index_dir: str,
                      max_files_per_partition: int = 1) -> dict:
    """Merge each partition's insert generations into one surt-sorted
    file (bounds lookup fan-out; sorting tightens row-group stats)."""
    from docling_translate_ray.util import compact_partition_dirs

    _read_meta(index_dir)  # fail loudly on a non-index dir
    base = os.path.join(index_dir, _PARTS_SUBDIR)
    pdirs = [os.path.join(base, d) for d in sorted(os.listdir(base))
             if os.path.isdir(os.path.join(base, d))] \
        if os.path.isdir(base) else []
    return compact_partition_dirs(
        pdirs, sort_keys=("surt",),
        max_files_per_partition=max_files_per_partition)


def _prefix_upper(prefix: str) -> str | None:
    """Smallest string > every string with this prefix (rightmost
    incrementable char bumped, tail dropped); None = unbounded."""
    for i in range(len(prefix) - 1, -1, -1):
        if ord(prefix[i]) < 0x10FFFF:
            return prefix[:i] + chr(ord(prefix[i]) + 1)
    return None


def url_index_lookup(index_dir: str, prefix: str):
    """All index rows whose surt starts with ``prefix`` — reading ONLY
    the partition directories whose boundary range intersects
    ``[prefix, next(prefix))``.  Returns a Dataset with columns
    (surt, <id_column>, <url_column>)."""
    import bisect

    import ray.data

    boundaries, url_column, id_column = _read_meta(index_dir)
    lo = bisect.bisect_right(boundaries, prefix)
    upper = _prefix_upper(prefix)
    hi = (bisect.bisect_right(boundaries, upper)
          if upper is not None else len(boundaries))
    base = os.path.join(index_dir, _PARTS_SUBDIR)
    paths: list[str] = []
    for p in range(lo, hi + 1):
        pdir = os.path.join(base, f"{_PART_COL}={p}")
        if os.path.isdir(pdir):
            paths.extend(os.path.join(pdir, f)
                         for f in sorted(os.listdir(pdir))
                         if f.endswith(".parquet"))
    empty = pa.table({"surt": pa.array([], pa.string()),
                      id_column: pa.array([], pa.int64()),
                      url_column: pa.array([], pa.string())})
    if not paths:
        return ray.data.from_arrow(empty)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.starts_with(batch["surt"], prefix))

    return (
        ray.data.read_parquet(paths,
                              columns=["surt", id_column, url_column])
        .map_batches(keep, batch_format="pyarrow")
    )
