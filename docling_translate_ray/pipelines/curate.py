"""Corpus curation — the composite training-data pipeline (C4/RefinedWeb
shape) built from this engine's operators:

    documents → quality score (vectorized) → quality filter
              → exact dedup (md5 hash partition, min-id winner)
              → MinHash-LSH near-dedup (drop non-canonical members)
              → curated corpus + per-stage counts

Scale notes per stage:

* quality: pure ``map_batches`` — streams.
* exact dedup: winners are selected with one content-hash ``groupby``; the
  survivor rows are recovered with a hash-partitioned **semi join** on the
  id (both sides large → never broadcast).
* near-dedup: the drop set (non-canonical members of near-dup clusters) is
  a small fraction of the corpus by construction — it IS the duplicates —
  so it travels as a broadcast ``ray.put`` set probed per batch.  If a
  corpus is mostly duplicates, run exact dedup first (it is, here) and the
  residual near-dup set stays small.
"""

from __future__ import annotations

import pyarrow as pa

from docling_translate_ray.functions import dedup as fdedup
from docling_translate_ray.functions import text_stats as fts


def curate_docs(ds, id_column: str = "doc_id", column: str = "text",
                minhash_threshold: float = 0.7):
    """Return (curated_ds, stats) — curated rows keep (id, text) plus the
    quality columns; ``stats`` has per-stage survivor counts."""
    import ray

    stats: dict[str, int] = {"n_input": ds.count()}

    def quality_filter(batch: pa.Table) -> pa.Table:
        out = fts.quality_batch(batch, column)
        return out.filter(out["quality_ok"])

    quality = ds.map_batches(quality_filter, batch_format="pyarrow")
    # pin: three downstream consumers (count, winners, joins) must not
    # re-run the upstream filter chain
    quality = quality.materialize()
    stats["n_quality_ok"] = quality.count()

    # exact dedup winners (content_md5 → min id), then semi-join survivors
    # (partition_join: measured 3-6× faster than Dataset.join on wide rows)
    from docling_translate_ray.stages.shuffle import partition_join

    winners = fdedup.exact_dedup(quality, column=column, id_column=id_column)
    surv = partition_join(
        quality, winners.select_columns([id_column]), on=[id_column], how="inner"
    ).materialize()
    stats["n_exact_unique"] = surv.count()

    # near-dup labels: members of clusters that are NOT the canonical doc
    labels = fdedup.minhash_lsh_dedup(
        surv, column=column, id_column=id_column, threshold=minhash_threshold
    )
    drop: set[int] = set()
    for b in labels.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for i, c in zip(t[id_column].to_pylist(), t["canonical_id"].to_pylist()):
            if i != c:
                drop.add(i)
    drop_ref = ray.put(pa.array(sorted(drop), pa.int64()))

    class DropMembers:
        """Drop set fetched ONCE per actor; per-batch filter is a single
        vectorized pc.is_in (no per-batch deserialization, no Python rows)."""

        def __init__(self) -> None:
            import ray as _ray

            self._drop = _ray.get(drop_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.invert(pc.is_in(batch[id_column], value_set=self._drop))
            return batch.filter(mask)

    from docling_translate_ray.util import auto_pool_size

    curated = surv.map_batches(
        DropMembers, batch_format="pyarrow", concurrency=auto_pool_size()
    )
    stats["n_curated"] = curated.count()
    return curated, stats


def curate_stats_table(ds, **kwargs) -> pa.Table:
    _, stats = curate_docs(ds, **kwargs)
    return pa.table({k: pa.array([v], pa.int64()) for k, v in stats.items()})
