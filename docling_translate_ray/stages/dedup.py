"""Exact sentence deduplication + scored-result join-back (A1/J1/J2 analogs).

The reference dedups with ``list(set(all_sentences))`` inside one process
(core.py:454, core.py:231) and joins results back through a dict
(``translation_map``, core.py:486).  At scale that is:

* **dedup**: add a stable 64-bit content hash per sentence (vectorized),
  thin duplicates *within each batch first* (combiner — cuts the shuffle),
  then hash-partition with ``groupby(sent_hash)`` and keep the first row per
  group.  Key = content hash, so hot sentences ("Home", "©2026…") each land
  in exactly one group; group payloads are single-digit rows after the
  per-batch thinning, so no salting is needed for exact dedup.
* **join-back**: either broadcast the scored unique table (``ray.put`` once,
  dict probe per batch — J1/J2, right when uniques fit in memory like the
  reference's per-file map) or a hash-partitioned ``Dataset.join`` on the
  sentence hash for the large case.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from docling_translate_ray.stages.extract import _hash64_str


def add_sentence_hash(batch: pa.Table, column: str = "sentence") -> pa.Table:
    return batch.append_column("sent_hash", _hash64_str(batch[column]))


def thin_batch_duplicates(batch: pa.Table, column: str = "sentence") -> pa.Table:
    """Per-batch combiner: keep the first occurrence of each sentence.

    Runs before the dedup shuffle so repeated boilerplate sentences do not
    all cross the exchange (pre-aggregation pattern, SURVEY.md §4).
    """
    if batch.num_rows == 0:
        return batch
    import numpy as np

    h = batch["sent_hash"].to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(h, return_index=True)
    return batch.take(pa.array(np.sort(first_idx)))


def unique_sentences(sent_ds, column: str = "sentence"):
    """Dataset of distinct sentences (columns: sent_hash, <column>).

    groupby(sent_hash) is the only shuffle; rows entering it are already
    batch-deduped.
    """
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    thinned = (
        sent_ds.map_batches(
            lambda b: thin_batch_duplicates(add_sentence_hash(b, column), column),
            batch_format="pyarrow",
        )
        .select_columns(["sent_hash", column])
    )

    def distinct_block(part: pa.Table) -> pa.Table:
        import polars as pl

        # distinct by the sentence STRING (hash only routes the partition,
        # so a 64-bit hash collision can never drop a real sentence)
        return pl.from_arrow(part).unique(subset=[column], keep="any").to_arrow()

    return hash_partition_apply(thinned, ["sent_hash"], distinct_block)


def broadcast_score_map(unique_scored_ds, column: str = "sentence",
                        max_rows: int = 5_000_000) -> "ray.ObjectRef":
    """Materialize the unique scored table to a dict and ``ray.put`` it once.

    The translation_map analog (core.py:486).  Only valid when uniques fit
    in driver memory — the same assumption the reference makes per file;
    raises past ``max_rows`` (≈1 GB of short sentences) instead of silently
    OOM-ing the driver: use ``strategy='join'`` (:func:`join_scores`) there.
    """
    import ray

    mapping: dict[str, str] = {}
    for b in unique_scored_ds.select_columns([column, "scored"]).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        mapping.update(zip(b[column].to_pylist(), b["scored"].to_pylist()))
        if len(mapping) > max_rows:
            raise ValueError(
                f"unique-{column} count exceeds max_rows={max_rows}: the "
                "broadcast map no longer fits a driver; use the "
                "fully-distributed scoring path (strategy='join')"
            )
    return ray.put(mapping)


class ProbeScoreMap:
    """Actor-pool probe: docs batch + broadcast map → ``translated_text``.

    The map object-ref is fetched ONCE per actor in ``__init__`` (zero-copy
    shared-memory read on each node), never re-shipped per batch.
    """

    def __init__(self, map_ref, miss_policy: str = "empty") -> None:
        import ray

        self._map = ray.get(map_ref)
        self._miss = miss_policy

    def __call__(self, batch: pa.Table) -> pa.Table:
        from docling_translate_ray import extract_core as ec

        spans_lists = batch["spans"].to_pylist()
        out = [
            ec.assemble_scored_text(spans or [], self._map, self._miss)
            for spans in spans_lists
        ]
        return batch.append_column("translated_text", pa.array(out, pa.string()))


def join_scores(sent_ds, unique_scored_ds, num_partitions: int | None = None):
    """Large-side path: hash-partitioned join sentences ⋈ scored uniques.

    Both sides carry ``sent_hash``; Ray's ``Dataset.join`` hash-partitions on
    it (all-to-all exchange — use only when the unique set is too big to
    broadcast).  ``num_partitions`` defaults to a cluster-safe size — the
    join operator pins one aggregator actor (one CPU) per partition, so
    oversizing it deadlocks the streaming executor (util.join_partitions).
    """
    if num_partitions is None:
        from docling_translate_ray.util import join_partitions

        num_partitions = join_partitions()
    left = sent_ds.map_batches(add_sentence_hash, batch_format="pyarrow")
    right = unique_scored_ds.select_columns(["sent_hash", "scored"])
    return left.join(
        right,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("sent_hash",),
    )
