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
    import polars as pl

    # dedup by the sentence STRING (a 64-bit hash collision must never drop
    # a real sentence — the hash only routes partitions)
    first = (
        pl.from_arrow(batch.select([column]))
        .with_row_index("_i")
        .unique(subset=[column], keep="first")
    )
    idx = np.sort(first["_i"].to_numpy())
    return batch.take(pa.array(idx))


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

        from docling_translate_ray.state.checkpoint import normalize_arrow_types

        # distinct by the sentence STRING (hash only routes the partition,
        # so a 64-bit hash collision can never drop a real sentence);
        # normalize polars' large_string back so downstream joins on the
        # sentence column match the plain-typed left side
        return normalize_arrow_types(
            pl.from_arrow(part).unique(subset=[column], keep="any").to_arrow()
        )

    return hash_partition_apply(thinned, ["sent_hash"], distinct_block)


def broadcast_score_map(unique_scored_ds, column: str = "sentence",
                        max_rows: int = 5_000_000,
                        on_overflow: str = "raise"):
    """Materialize the unique scored table to an Arrow table, ``ray.put`` once.

    The translation_map analog (core.py:486).  Only valid when uniques fit
    in driver memory — the same assumption the reference makes per file.
    Past ``max_rows`` (≈1 GB of short sentences): ``on_overflow='raise'``
    fails loudly instead of silently OOM-ing the driver;
    ``on_overflow='none'`` returns ``None`` so the caller can fall back to
    the fully-distributed path (``score_docs(strategy='auto')`` does).
    """
    import ray

    assert on_overflow in ("raise", "none")
    batches = []
    n = 0
    for b in unique_scored_ds.select_columns([column, "scored"]).iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        batches.append(t)
        n += t.num_rows
        if n > max_rows:
            if on_overflow == "none":
                return None
            raise ValueError(
                f"unique-{column} count exceeds max_rows={max_rows}: the "
                "broadcast map no longer fits a driver; use the "
                "fully-distributed scoring path (strategy='join')"
            )
    tbl = (
        pa.concat_tables(batches, promote_options="default")
        if batches
        else pa.table({column: pa.array([], pa.string()),
                       "scored": pa.array([], pa.string())})
    )
    # broadcast as an ARROW TABLE, not a python dict: ray.get of a dict
    # deserializes millions of PyObjects once per actor (tens of seconds at
    # ~4M entries); an Arrow table is a zero-copy shared-memory read and the
    # probe becomes a vectorized polars hash join per batch
    return ray.put(tbl.select([column, "scored"]))


class ProbeScoreMap:
    """Actor-pool probe: docs batch + broadcast map → ``translated_text``.

    The Arrow map table is fetched ONCE per actor in ``__init__`` (zero-copy
    shared-memory read on each node — never a per-actor dict
    deserialization, never re-shipped per batch).  Per batch, the doc spans
    explode to sentences, hash-join against the map (vectorized polars),
    and reassemble with the exact ``assemble_scored_text`` semantics:
    sentence-kind spans split + probe per sentence joined by " ", other
    kinds probe whole, segs joined by "\\n", misses per policy
    (html_generator.py:565-567 vs text_html_generator.py:481).
    """

    def __init__(self, map_ref, miss_policy: str = "empty") -> None:
        import polars as pl

        import ray

        assert miss_policy in ("empty", "identity")
        tbl = ray.get(map_ref)  # pa.Table(sentence, scored)
        self._map_df = pl.from_arrow(tbl).rename(
            {tbl.column_names[0]: "sentence"}
        ).unique(subset=["sentence"], keep="any")
        self._miss = miss_policy

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        from docling_translate_ray import extract_core as ec

        spans_lists = batch["spans"].to_pylist()
        ridx: list[int] = []
        segs: list[int] = []
        sidx: list[int] = []
        sents: list[str] = []
        for i, spans in enumerate(spans_lists):
            for s in sorted(spans or [], key=lambda x: x["seg_id"]):
                if not s["translatable"] or not s["text"].strip():
                    continue
                if s["kind"] in ec._SENTENCE_KINDS:
                    pieces = ec.split_sentences(s["text"])
                else:
                    pieces = [s["text"]]
                for j, sent in enumerate(pieces):
                    ridx.append(i)
                    segs.append(s["seg_id"])
                    sidx.append(j)
                    sents.append(sent)
        out = [""] * batch.num_rows
        if sents:
            df = pl.DataFrame(
                {"_r": ridx, "_g": segs, "_i": sidx, "sentence": sents}
            ).join(self._map_df, on="sentence", how="left")
            miss = pl.col("sentence") if self._miss == "identity" else pl.lit("")
            df = df.with_columns(pl.col("scored").fill_null(miss))
            per_seg = df.sort(["_r", "_g", "_i"]).group_by(
                ["_r", "_g"], maintain_order=True
            ).agg(pl.col("scored").str.join(" "))
            per_row = per_seg.group_by("_r", maintain_order=True).agg(
                pl.col("scored").str.join("\n")
            )
            for r, text in zip(per_row["_r"].to_list(), per_row["scored"].to_list()):
                out[r] = text
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
    # join on (hash, sentence): the hash drives partitioning, the STRING
    # guarantees a 64-bit collision can never attach the wrong score or
    # duplicate a sentence row
    right = unique_scored_ds.select_columns(["sent_hash", "sentence", "scored"])
    return left.join(
        right,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("sent_hash", "sentence"),
    )
