"""Bitext factory — the composite translation-data pipeline: from a
multilingual crawled corpus to aligned sentence pairs, built from this
engine's operators:

    pages (id, url, text) → URL-pattern document pairing
                            (``urltools.url_pair_mine`` — CCAligned)
                          → sentence lists for the docs that pair
                            (semi id-filter, never the whole corpus)
                          → Gale-Church sentence alignment with text
                            emission (``bitext.gale_church_align``)
                          → aligned pair rows (src_text, tgt_text,
                            bead, src_id/tgt_id/tgt_lang lineage)

Same streaming-composition rules as ``pipelines/curate.py`` /
``mixture.py``: every stage writes durable parquet and the next
re-reads it; doc selection is a broadcast-or-exchange semi filter
(``id_filter_join``); sentence-list attach is two
broadcast-or-exchange joins (``broadcast_join`` with the
``partition_join`` fallback past the caps); stage counts come from
parquet metadata; ``resume=True`` skips completed stages via their
``.done`` markers (``state.stages.StageRunner``, curate's contract).

The mining stage is DuckDB-oracle-backed through the ``url_pair_mine``
driver entry; the DP alignment has no SQL oracle (rows-only driver
entry ``bitext_pipeline``; bead semantics pinned in
tests/test_bitext_align.py).

Reference parity note: the reference repo translates one document at a
time with a model; mining + alignment of existing multilingual crawls
is the beyond-reference path to the same training data at corpus
scale.
"""

from __future__ import annotations

import shutil
import tempfile

import pyarrow as pa


def _sentencize_batch(id_column: str, text_column: str, sent_words: int):
    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(batch.select([id_column, text_column]))
            .rename({id_column: "_id", text_column: "_t"})
            .with_columns(pl.col("_t").fill_null(""))
            .select(
                "_id",
                pl.col("_t").str.extract_all(r"\S+").alias("_w"),
            )
        )
        ids = df["_id"].to_list()
        words = df["_w"].to_list()
        sents = [
            [" ".join(ws[i:i + sent_words])
             for i in range(0, len(ws), sent_words)]
            for ws in words
        ]
        return pa.table({
            id_column: pa.array(ids, pa.int64()),
            "sents": pa.array(sents, pa.list_(pa.string())),
        })

    return fn


def run_bitext_job(ds, work_dir: str | None = None,
                   id_column: str = "doc_id", url_column: str = "url",
                   text_column: str = "text", src_lang: str = "en",
                   sent_words: int = 5, num_partitions: int = 32,
                   resume: bool = False):
    """Return ``(beads_ds, stats)``: aligned-bead rows
    ``(pair_id, bead_id, src_lo, src_n, tgt_lo, tgt_n, bead, src_text,
    tgt_text, tgt_id, tgt_lang)`` plus per-stage counts.  ``pair_id``
    is the src doc id; ``(pair_id, tgt_id)`` identifies the pair.
    ``ds`` must carry ``(id, url, text)``.
    """
    import ray.data

    from docling_translate_ray.functions.bitext import gale_church_align
    from docling_translate_ray.functions.urltools import url_pair_mine
    from docling_translate_ray.stages.shuffle import (
        broadcast_join,
        distinct,
        id_filter_join,
    )
    from docling_translate_ray.state.stages import StageRunner

    if work_dir is None:
        if resume:
            raise ValueError("resume=True needs an explicit work_dir")
        import atexit

        work_dir = tempfile.mkdtemp(prefix="dtr_bitext_")
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)
    runner = StageRunner(work_dir, resume=resume, params={
        "pipeline": "bitext", "src_lang": src_lang,
        "sent_words": sent_words, "num_partitions": num_partitions,
    })

    # stage 1: URL-pattern document pairing (narrow rows only)
    pairs_dir = runner.stage("pairs", lambda d: url_pair_mine(
        ds.select_columns([id_column, url_column]),
        url_column=url_column, id_column=id_column,
        src_lang=src_lang, num_partitions=num_partitions,
    ).write_parquet(d))
    # an all-empty write leaves no files behind — short-circuit before
    # read_parquet ever sees the missing directory
    import os

    n_pairs = 0
    if os.path.isdir(pairs_dir) and any(os.scandir(pairs_dir)):
        pairs = ray.data.read_parquet(pairs_dir)
        n_pairs = pairs.count()
    if n_pairs == 0:
        empty = pa.schema([
            ("pair_id", pa.int64()), ("bead_id", pa.int64()),
            ("src_lo", pa.int64()), ("src_n", pa.int64()),
            ("tgt_lo", pa.int64()), ("tgt_n", pa.int64()),
            ("bead", pa.string()), ("src_text", pa.string()),
            ("tgt_text", pa.string()),
            ("tgt_id", pa.int64()), ("tgt_lang", pa.string()),
        ]).empty_table()
        return ray.data.from_arrow(empty), {
            "n_pairs": 0, "n_docs_paired": 0, "n_beads": 0}

    # stage 2: sentence lists for ONLY the docs that pair — the id set
    # is the union of both pair sides, the corpus is semi-filtered
    # (broadcast-or-exchange), and the text never crosses a shuffle
    # un-sentencized
    def build_sents(d: str) -> None:
        ids = distinct(
            pairs.select_columns(["src_id"])
            .rename_columns({"src_id": id_column})
            .union(pairs.select_columns(["tgt_id"])
                   .rename_columns({"tgt_id": id_column})),
            [id_column], num_partitions=min(num_partitions, 16))
        id_filter_join(
            ds.select_columns([id_column, text_column]), ids,
            id_column=id_column, num_partitions=num_partitions,
        ).map_batches(
            _sentencize_batch(id_column, text_column, sent_words),
            batch_format="pyarrow",
        ).write_parquet(d)

    sents_dir = runner.stage("sents", build_sents)
    sents = ray.data.read_parquet(sents_dir)
    n_docs_paired = sents.count()

    # stage 3: attach both sides' sentence lists and run the DP
    def build_beads(d: str) -> None:
        src_side = sents.rename_columns(
            {id_column: "src_id", "sents": "src_sents"})
        tgt_side = sents.rename_columns(
            {id_column: "tgt_id", "sents": "tgt_sents"})
        joined = broadcast_join(
            broadcast_join(
                pairs.select_columns(["src_id", "tgt_id", "tgt_lang"]),
                src_side, on=["src_id"], how="inner",
                num_partitions=num_partitions),
            tgt_side, on=["tgt_id"], how="inner",
            num_partitions=num_partitions)
        # pair_id = the src doc id (unique per site_key on the src
        # side); (pair_id, tgt_id) identifies the pair, tgt_lang
        # completes the lineage — all ride join-free as passthrough
        gale_church_align(
            joined, id_column="src_id", src_column="src_sents",
            tgt_column="tgt_sents", emit_text=True,
            passthrough=["tgt_id", "tgt_lang"],
        ).write_parquet(d)

    beads_dir = runner.stage("beads", build_beads)
    beads = ray.data.read_parquet(beads_dir)
    stats = {
        "n_pairs": n_pairs,
        "n_docs_paired": n_docs_paired,
        "n_beads": beads.count(),
    }
    return beads, stats
