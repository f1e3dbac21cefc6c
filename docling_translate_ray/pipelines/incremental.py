"""Incremental extraction across crawl snapshots (LSM-style corpus state).

At crawl cadence most pages do not change; re-extracting 10^12 documents
per snapshot is the single largest avoidable cost in a web pipeline.  This
module composes :func:`..functions.crawl.snapshot_diff` with the durable
extraction job (:func:`..pipelines.extract.run_extract_job`) so snapshot
``N`` pays extraction ONLY for its added + changed pages:

* ``run_incremental_extract_job(prev_pages, new_pages, prev_out, out)`` —
  diff the two raw-page snapshots (16-byte fingerprints through one
  url-hash exchange), extract the delta pages with the full checkpointed
  job machinery (buckets / lineage / resume all apply to the delta), and
  record a MANIFEST making the new corpus state a lazy view:
  ``state(N) = state(N-1) − tombstones(N) + delta_docs(N)``.
* ``read_corpus_docs(out)`` — resolve that view: recursively read the
  base state, anti-join the tombstoned urls, union the delta docs.
  Nothing is copied forward — an unchanged page extracted in snapshot 1
  is stored exactly once no matter how many snapshots follow (the
  manifest chain replaces the rewrite a copy-forward merge would do over
  ~the whole corpus every snapshot).

Invariant (oracle-checked by the ``incremental_extract`` driver entry):
``read_corpus_docs`` after an incremental run is row-identical to a full
re-extraction of the new snapshot.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

_MANIFEST_FILE = "manifest.json"
_TOMBSTONES_SUBDIR = "tombstones"
_DELTA_PAGES_SUBDIR = "delta_pages"
_FINGERPRINTS_SUBDIR = "fingerprints"
_DELTA_SUBDIR = "delta"

# partition columns the durable layouts add; dropped from the merged view
# so base and delta always union on the logical doc schema
_LAYOUT_COLS = ("bucket", "shard")


def _docs_view(out_dir: str):
    """The docs table of ONE extract-job output dir (no manifest logic)."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(out_dir, "docs"))
    drop = [c for c in _LAYOUT_COLS if c in ds.schema().names]
    return ds.drop_columns(drop) if drop else ds


def _walk_chain(out_dir: str):
    """Manifest chain → (base_dir, hops) with hops oldest-first:
    ``[(tomb_dir|None, delta_docs_dir|None, level), ...]``, level 1..N."""
    rev = []
    cur = out_dir
    while True:
        mpath = os.path.join(cur, _MANIFEST_FILE)
        if not os.path.isfile(mpath):
            break
        with open(mpath) as f:
            m = json.load(f)
        rev.append((
            os.path.join(cur, _TOMBSTONES_SUBDIR) if m["n_tombstones"] else None,
            os.path.join(cur, _DELTA_SUBDIR) if m["n_delta_pages"] else None,
        ))
        cur = m["base"]
    hops = [(t, d, i + 1) for i, (t, d) in enumerate(reversed(rev))]
    return cur, hops


def read_corpus_docs(out_dir: str, max_broadcast_tombstones: int = 20_000_000):
    """Current corpus state at ``out_dir``: a plain extract-job output is
    read directly; an incremental output resolves its whole manifest
    chain in ONE pass via the kill rule — a doc written at hop ``L``
    (base = 0) is current iff no tombstone at a LATER hop names its url
    (every "changed" url is tombstoned at the hop that rewrote it, so the
    rule also supersedes older versions).

    While the chain's total tombstones fit ``max_broadcast_tombstones``
    the per-url max tombstone level broadcasts via ``ray.put`` and every
    level filters per batch — ZERO exchanges regardless of chain depth
    (the first version anti-partition_join'ed the FULL state once per
    hop); past the budget one url-keyed exchange resolves the argmax
    instead."""
    import ray
    import ray.data

    base_dir, hops = _walk_chain(out_dir)
    levels = [(_docs_view(base_dir), 0)]
    for tomb_dir, delta_dir, lv in hops:
        if delta_dir is not None:
            levels.append((_docs_view(delta_dir), lv))
    tomb_dirs = [(t, lv) for t, _, lv in hops if t is not None]
    if not tomb_dirs:
        out = levels[0][0]
        for ds, _ in levels[1:]:
            out = out.union(ds)
        return out

    import polars as pl

    import pyarrow.parquet as pq

    n_tombs = 0
    for t, _ in tomb_dirs:
        for f in os.listdir(t):
            if f.endswith(".parquet"):
                n_tombs += pq.read_metadata(os.path.join(t, f)).num_rows

    if n_tombs <= max_broadcast_tombstones:
        from docling_translate_ray.util import collect_to_table

        parts = []
        for t, lv in tomb_dirs:
            tbl = collect_to_table(
                ray.data.read_parquet(t, columns=["url"]),
                empty_schema=pa.schema([("url", pa.string())]),
            )
            parts.append(pl.from_arrow(tbl).with_columns(
                pl.lit(lv, dtype=pl.Int64).alias("_tlv")))
        kill = (
            pl.concat(parts).group_by("url").agg(pl.col("_tlv").max())
            .to_arrow().cast(pa.schema([("url", pa.string()),
                                        ("_tlv", pa.int64())]))
        )
        kill_ref = ray.put(kill)

        def survivors(level: int):
            def fn(batch: pa.Table) -> pa.Table:
                import ray as _ray

                k = pl.from_arrow(_ray.get(kill_ref))
                df = pl.from_arrow(batch)
                joined = df.join(k, on="url", how="left")
                return joined.filter(
                    pl.col("_tlv").fill_null(-1) <= level
                ).drop("_tlv").to_arrow()

            return fn

        out = None
        for ds, lv in levels:
            filtered = ds.map_batches(survivors(lv), batch_format="pyarrow")
            out = filtered if out is None else out.union(filtered)
        return out

    # distributed fallback (tombstones past the broadcast budget): the
    # per-hop anti partition_join chain — correct by induction, at the
    # cost of one full-state exchange per hop
    from docling_translate_ray.stages.shuffle import partition_join

    state = _docs_view(base_dir)
    for tomb_dir, delta_dir, lv in hops:
        if tomb_dir is not None:
            state = partition_join(
                state, ray.data.read_parquet(tomb_dir, columns=["url"]),
                on=["url"], how="anti")
        if delta_dir is not None:
            state = state.union(_docs_view(delta_dir))
    return state


def run_incremental_extract_job(
    prev_pages_path: str,
    new_pages_path: str,
    prev_out_dir: str,
    out_dir: str,
    content_column: str = "html",
    **extract_kwargs,
) -> dict:
    """Extract snapshot ``new_pages_path`` given that ``prev_out_dir``
    already holds the extraction of ``prev_pages_path``.  Only added +
    changed pages are parsed; removed + changed urls become tombstones.
    ``extract_kwargs`` flow to :func:`..pipelines.extract.run_extract_job`
    for the delta (engine, layout, speed_mode, resume, ... all work —
    a killed incremental run resumes inside its delta job).

    Returns the delta-job stats plus ``n_added / n_changed / n_removed``
    and ``manifest`` (the path making :func:`read_corpus_docs` lazy)."""
    import ray.data

    import pyarrow.compute as pc

    from docling_translate_ray.pipelines.extract import read_pages, run_extract_job
    from docling_translate_ray.stages.shuffle import partition_join

    os.makedirs(out_dir, exist_ok=True)
    # xx64 fingerprints: the diff compares them for equality only, and the
    # vectorized polars hash beats the per-row md5 loop ~30× per byte (the
    # md5 mode exists for SQL-oracle lockstep, not production).  The new
    # snapshot's fingerprints are PERSISTED into out_dir, so the NEXT
    # incremental run diffs against that ~50-byte/url table instead of
    # re-reading this whole crawl — after the first hop, a snapshot's
    # pages are read exactly once, ever.
    from docling_translate_ray.functions.crawl import (
        _fingerprint_batch,
        diff_fingerprints,
    )

    def fp_of(pages_path):
        return read_pages(pages_path).map_batches(
            lambda b: _fingerprint_batch(b, "url", content_column, 0, "xx64")
            .drop_columns(["side"]),
            batch_format="pyarrow",
        )

    new_fp_dir = os.path.join(out_dir, _FINGERPRINTS_SUBDIR)
    fp_of(new_pages_path).write_parquet(new_fp_dir)
    prev_fp_dir = os.path.join(prev_out_dir, _FINGERPRINTS_SUBDIR)
    old_fp = (
        ray.data.read_parquet(prev_fp_dir)
        if os.path.isdir(prev_fp_dir)
        else fp_of(prev_pages_path)  # first hop: base was a plain extract
    )
    diff = diff_fingerprints(
        old_fp, ray.data.read_parquet(new_fp_dir)
    ).materialize()  # diff rows only — the small side by crawl-cadence construction

    def keep(kinds: tuple[str, ...], cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch["change"], value_set=pa.array(kinds))
            ).select(cols)

        return fn

    tomb_dir = os.path.join(out_dir, _TOMBSTONES_SUBDIR)
    tombs = diff.map_batches(keep(("removed", "changed"), ["url", "change"]),
                             batch_format="pyarrow")
    tombs.write_parquet(tomb_dir)

    # delta pages: filter the new snapshot down to the added/changed urls.
    # The fresh-url set is delta-sized (crawl cadence) — broadcast it via
    # ray.put and filter pages per batch, so page payloads NEVER enter an
    # exchange (the first version semi-partition_join'ed the whole
    # snapshot's html through a url-hash shuffle to keep 7% of it — 5×
    # slower than a full re-extract at 960k pages); past the broadcast
    # budget fall back to that semi-join
    fresh = diff.map_batches(keep(("added", "changed"), ["url"]),
                             batch_format="pyarrow").materialize()
    delta_pages_dir = os.path.join(out_dir, _DELTA_PAGES_SUBDIR)
    if fresh.count() <= 20_000_000:
        import ray

        from docling_translate_ray.util import collect_to_table

        urls_ref = ray.put(
            collect_to_table(
                fresh, empty_schema=pa.schema([("url", pa.string())])
            )["url"].combine_chunks().cast(pa.string())
        )

        def keep_fresh(batch: pa.Table) -> pa.Table:
            import ray as _ray

            return batch.filter(
                pc.is_in(batch["url"].cast(pa.string()),
                         value_set=_ray.get(urls_ref))
            )

        delta_pages = read_pages(new_pages_path).map_batches(
            keep_fresh, batch_format="pyarrow")
    else:
        delta_pages = partition_join(read_pages(new_pages_path), fresh,
                                     on=["url"], how="semi")
    delta_pages.write_parquet(delta_pages_dir)

    counts = {k: 0 for k in ("added", "removed", "changed")}
    for row in diff.groupby("change").count().take_all():
        counts[row["change"]] = row["count()"]

    delta_out = os.path.join(out_dir, _DELTA_SUBDIR)
    n_delta = counts["added"] + counts["changed"]
    if n_delta:
        job = run_extract_job(delta_pages_dir, delta_out, **extract_kwargs)
    else:
        job = {"doc_count": 0, "skipped_buckets": 0}

    manifest = {
        "base": os.path.abspath(prev_out_dir),
        "n_tombstones": counts["removed"] + counts["changed"],
        "n_delta_pages": n_delta,
    }
    with open(os.path.join(out_dir, _MANIFEST_FILE), "w") as f:
        json.dump(manifest, f)
    return {
        **job,
        "n_added": counts["added"],
        "n_changed": counts["changed"],
        "n_removed": counts["removed"],
        "manifest": os.path.join(out_dir, _MANIFEST_FILE),
    }


def compact_corpus_state(out_dir: str, compact_dir: str,
                         n_buckets: int = 64) -> dict:
    """Major compaction: materialize a manifest CHAIN into one flat,
    url-bucketed docs dir (``compact_dir/docs/bucket=*/``) that
    :func:`read_corpus_docs` serves with zero anti-joins.

    A long snapshot chain costs one anti-join per level at every read;
    compaction pays that once and resets the chain — the classic LSM
    trade, chosen by the operator, not forced per snapshot.  The write is
    url-hash bucketed (same bucket rule as the extract job's ``bucket``
    layout) so downstream per-url joins stay co-located.  Returns
    ``{"doc_count": n, "buckets": n_buckets}``.
    """
    from docling_translate_ray.stages.shuffle import PKEY, add_pkey

    state = read_corpus_docs(out_dir)

    def bucketize(batch: pa.Table) -> pa.Table:
        keyed = add_pkey(batch, ["url"], n_buckets)
        return keyed.append_column(
            "bucket",
            keyed[PKEY].cast(pa.int32()),
        ).drop_columns([PKEY])

    docs_dir = os.path.join(compact_dir, "docs")
    state.map_batches(bucketize, batch_format="pyarrow").write_parquet(
        docs_dir, partition_cols=["bucket"]
    )
    import pyarrow.parquet as pq

    n = 0
    for root, _, files in os.walk(docs_dir):
        for f in files:
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(root, f)).num_rows
    return {"doc_count": n, "buckets": n_buckets}
