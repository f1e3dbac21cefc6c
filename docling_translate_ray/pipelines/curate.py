"""Corpus curation — the composite training-data pipeline (C4/RefinedWeb
shape) built from this engine's operators:

    documents → quality score (vectorized) → quality filter
              → exact dedup (md5 hash partition, min-id winner)
              → MinHash-LSH near-dedup (drop non-canonical members)
              → curated corpus + per-stage counts

STREAMING composition — no stage ever materializes the corpus in Ray object
memory or collects rows to the driver:

* each stage writes **durable parquet** and the next stage re-reads it
  (the same checkpoint pattern ``run_extract_job`` uses) — a multi-consumer
  stage (dedup winners + survivor join both read quality output) costs a
  cheap parquet re-read, not an object-store pin of the corpus;
* survivor selection and near-dup drop go through
  ``stages.shuffle.id_filter_join`` — broadcast ``is_in`` filter while
  the id set fits a row budget (the corpus rows never cross an
  exchange), distributed semi/anti ``partition_join`` past it — and the
  id set is a Dataset end to end, never a driver loop;
* per-stage counts come from parquet METADATA (``read_parquet().count()``
  is a metadata-only fast path), not extra data scans;
* with ``resume=True`` each completed stage (``.done`` marker, written
  only after its parquet write returns) is SKIPPED — a killed run
  re-pays only the stage it died in (``state.stages.StageRunner``).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa

from docling_translate_ray.functions import dedup as fdedup
from docling_translate_ray.functions import text_stats as fts


def curate_docs(ds, id_column: str = "doc_id", column: str = "text",
                minhash_threshold: float = 0.7, work_dir: str | None = None,
                retention: str = "min_id", resume: bool = False,
                normalize: bool = False, trim_lines: bool = False,
                blocklist: list[str] | None = None,
                blocklist_mode: str = "word",
                compress_filter: bool = False):
    """Return (curated_ds, stats) — curated rows keep (id, text) plus the
    quality columns; ``stats`` has per-stage survivor counts.

    ``retention`` picks which member of each NEAR-dup cluster survives:
    ``"min_id"`` (the default — the canonical labeling, and the variant
    the end-to-end SQL oracle checks) or ``"keep_best"`` (the Dolma /
    FineWeb policy via :func:`..functions.dedup.dedup_keep_best` — most
    whitespace tokens, ties to the smaller id).

    ``curated_ds`` is backed by durable parquet under ``work_dir`` (a temp
    dir by default — pass one to keep / resume-inspect the intermediates).
    The caller owns cleanup of a passed ``work_dir``; the default temp dir
    lives until process exit so the returned Dataset stays readable.

    ``resume=True`` (requires an explicit ``work_dir``) skips stages whose
    ``.done`` marker exists — a killed run re-pays only the stage it died
    in, and nothing upstream (``state.stages.StageRunner``; mismatched
    parameters are refused, never silently recomputed).

    ``normalize=True`` inserts the unicode-normalization pass
    (``functions.normalize``) as stage 0, BEFORE any hashing — visually
    identical pages (decomposed accents, stray control bytes, doubled
    spaces) then hash equal in every downstream exact/near-dup stage
    instead of escaping all of them.

    ``trim_lines=True`` inserts within-doc repeated-line trimming
    (``functions.dedup.trim_repeated_lines``) after normalization and
    before any hashing — in-document boilerplate repeats then stop
    polluting the quality signals and the exact/near-dup keys.  The
    trim stage narrows rows to ``(id_column, column)`` (the curate
    contract's working set; quality re-derives its columns).

    ``blocklist`` (a list of strings) inserts the C4-style badwords
    gate (``functions.text_stats.badwords_flag_batch``) before the
    quality stage — ``blocklist_mode`` picks token-equality
    (``"word"``) or Aho-Corasick substring (``"substring"``)
    semantics; flagged docs are dropped and ``stats`` gains
    ``n_blocklist_ok``.

    ``compress_filter=True`` inserts the zlib compressibility gate
    (``functions.text_stats.compression_ratio_batch``) before the
    quality stage — the RefinedWeb/FineWeb-family repetitiveness
    detector for boilerplate/machine-generated docs whose repeats are
    too long-range for the n-gram signals; dropped docs are the ones
    the near-dup stages would otherwise waste signatures on.  ``stats``
    gains ``n_compress_ok``.
    """
    if retention not in ("min_id", "keep_best"):
        raise ValueError(
            f"retention must be 'min_id' or 'keep_best' (got {retention!r})")
    import ray.data

    from docling_translate_ray.stages.shuffle import id_filter_join
    from docling_translate_ray.state.stages import StageRunner

    if work_dir is None:
        if resume:
            raise ValueError("resume=True needs an explicit work_dir")
        import atexit

        work_dir = tempfile.mkdtemp(prefix="dtr_curate_")
        # the returned Dataset reads from this dir, so it must survive the
        # call — but not the process (corpus-sized intermediates would
        # accumulate across invocations otherwise)
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)
    runner = StageRunner(work_dir, resume=resume, params={
        "pipeline": "curate", "id_column": id_column, "column": column,
        "minhash_threshold": minhash_threshold, "retention": retention,
        "normalize": normalize, "trim_lines": trim_lines,
        "blocklist": sorted(blocklist or []),
        "blocklist_mode": blocklist_mode,
        "compress_filter": compress_filter,
    })
    pre_stats: dict[str, int] = {}

    if normalize:
        # stage 0 — unicode normalization BEFORE any hashing (pure
        # per-batch pass, no exchange); downstream stages read the
        # normalized parquet so every md5/minhash keys normalized text
        from docling_translate_ray.functions.normalize import normalize_expr

        def normalized_rows(batch: pa.Table) -> pa.Table:
            import polars as pl

            out = (pl.from_arrow(batch)
                   .with_columns(normalize_expr(column).alias(column))
                   .to_arrow())
            return out.cast(batch.schema)

        n_dir = runner.stage("normalized", lambda d: ds.map_batches(
            normalized_rows, batch_format="pyarrow").write_parquet(d))
        ds = ray.data.read_parquet(n_dir)

    if trim_lines:
        # stage 0b — within-doc repeated-line trim BEFORE any hashing
        # (batch-local, no exchange); repeated in-document boilerplate
        # then can't dominate quality ratios or dup signatures
        from docling_translate_ray.functions.dedup import trim_repeated_lines

        def trimmed_rows(batch: pa.Table) -> pa.Table:
            return (batch.select([id_column, "text_trimmed"])
                    .rename_columns([id_column, column]))

        t_dir = runner.stage("trimmed", lambda d: trim_repeated_lines(
            ds, column=column, id_column=id_column,
        ).map_batches(trimmed_rows, batch_format="pyarrow").write_parquet(d))
        ds = ray.data.read_parquet(t_dir)

    if blocklist:
        # stage 0c — C4-style badwords gate BEFORE quality scoring
        # (pure per-batch vectorized map; the list rides the closure)
        from docling_translate_ray.functions.text_stats import (
            badwords_flag_batch,
        )

        def blocklist_kept(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            flagged = badwords_flag_batch(
                batch, blocklist, column=column, mode=blocklist_mode)
            return (flagged
                    .filter(pc.invert(flagged["badword_hit"]))
                    .drop_columns(["badword_hit"]))

        b_dir = runner.stage("blocklist", lambda d: ds.map_batches(
            blocklist_kept, batch_format="pyarrow").write_parquet(d))
        ds = ray.data.read_parquet(b_dir)
        pre_stats["n_blocklist_ok"] = ds.count()

    if compress_filter:
        # stage 0d — zlib compressibility gate BEFORE quality scoring
        # (pure per-batch pass; zlib is C code that releases the GIL).
        # Docs that compress below the threshold are boilerplate-heavy /
        # machine-generated in ways the within-doc n-gram signals miss
        from docling_translate_ray.functions.text_stats import (
            compression_ratio_batch,
        )

        def compress_kept(batch: pa.Table) -> pa.Table:
            scored = compression_ratio_batch(batch, column=column)
            return (scored.filter(scored["compress_ok"])
                    .drop_columns(["n_bytes", "compress_ratio_bp",
                                   "compress_ok"]))

        z_dir = runner.stage("compress", lambda d: ds.map_batches(
            compress_kept, batch_format="pyarrow").write_parquet(d))
        ds = ray.data.read_parquet(z_dir)
        pre_stats["n_compress_ok"] = ds.count()

    def quality_flagged(batch: pa.Table) -> pa.Table:
        out = fts.quality_batch(batch, column)
        # int partition key named WITHOUT a leading underscore (dataset
        # discovery ignores `_`-prefixed path segments) — hive also spells
        # booleans inconsistently across writers.  Rejected rows are
        # WRITTEN too (the audit trail every C4-style pipeline keeps), so
        # n_input needs no dedicated count pass over the raw corpus
        return out.append_column(
            "qok", out["quality_ok"].combine_chunks().cast(pa.int32())
        )

    q_dir = runner.stage("quality", lambda d: ds.map_batches(
        quality_flagged, batch_format="pyarrow"
    ).write_parquet(d, partition_cols=["qok"]))
    stats: dict[str, int] = {
        **pre_stats,
        # both counts are parquet-metadata reads of what the ONE quality
        # pass wrote: whole dir = input, qok=1 partition = survivors
        "n_input": ray.data.read_parquet(q_dir).count(),
    }
    ok_dir = os.path.join(q_dir, "qok=1")
    if os.path.isdir(ok_dir):
        quality = ray.data.read_parquet(ok_dir)
        stats["n_quality_ok"] = quality.count()
    else:  # every row failed the gate
        quality = ray.data.read_parquet(q_dir).filter(expr="quality_ok")
        stats["n_quality_ok"] = 0

    # exact dedup winners (content_md5 → min id), then a SEMI filter
    # recovers the survivor rows — broadcast-or-exchange
    # (``id_filter_join``): under the row budget the winner ids travel
    # once via ray.put and the full-text corpus rows never cross an
    # exchange; past it, the distributed partition_join fallback
    def build_exact(d: str) -> None:
        winners = fdedup.exact_dedup(
            quality, column=column, id_column=id_column)
        id_filter_join(
            quality, winners, id_column=id_column, how="semi"
        ).write_parquet(d)

    e_dir = runner.stage("exact", build_exact)
    surv = ray.data.read_parquet(e_dir)
    stats["n_exact_unique"] = surv.count()

    def build_curated(d: str) -> None:
        if retention == "keep_best":
            # near-dup retention by quality: the survivor set from
            # dedup_keep_best (longest member per cluster + all
            # singletons), recovered as full rows with a SEMI filter
            keep_ids = fdedup.dedup_keep_best(
                surv, column=column, id_column=id_column,
                threshold=minhash_threshold,
            )
            id_filter_join(
                surv, keep_ids, id_column=id_column, how="semi"
            ).write_parquet(d)
            return
        # near-dup drop set: members of clusters that are NOT the
        # canonical doc — subtracted with an ANTI filter (labels are a
        # Dataset end to end; the drop set never touches the driver)
        labels = fdedup.minhash_lsh_dedup(
            surv, column=column, id_column=id_column,
            threshold=minhash_threshold,
        )

        def non_canonical(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.invert(pc.equal(batch[id_column], batch["canonical_id"]))
            return batch.filter(keep).select([id_column])

        drop_ids = labels.map_batches(non_canonical, batch_format="pyarrow")
        id_filter_join(
            surv, drop_ids, id_column=id_column, how="anti"
        ).write_parquet(d)

    c_dir = runner.stage("curated", build_curated)
    curated = ray.data.read_parquet(c_dir)
    stats["n_curated"] = curated.count()
    return curated, stats


def curate_stats_table(ds, **kwargs) -> pa.Table:
    _, stats = curate_docs(ds, **kwargs)
    return pa.table({k: pa.array([v], pa.int64()) for k, v in stats.items()})


def curate_pages(pages_ds, url_column: str = "url",
                 html_column: str = "html", work_dir: str | None = None,
                 resume: bool = False, min_words: int = 5,
                 **curate_kwargs):
    """The north-star first mile END TO END: raw Common-Crawl-style
    pages (``url:string, html:binary``) → jusText-style main-content
    extraction (``functions.boilerplate``) → the full curate_docs
    chain (quality → exact dedup → near-dedup) → curated corpus rows
    WITH their source url re-attached.

    Stage layout (all durable, all resumable through the same
    ``StageRunner`` contract; ``curate_docs`` nests under
    ``work_dir/curate``):

    * ``maincontent`` — one shuffle-free pass: strip boilerplate,
      assign ``doc_id`` = 64-bit hash of the url (a collision merges
      two urls into one doc id — the standard 64-bit birthday risk,
      same convention as ``functions.graph.host_components``), keep
      ``(doc_id, url, text)``;
    * ``curate/*`` — the curate_docs stages over ``(doc_id, text)``;
    * ``final`` — curated rows joined back to their url
      (broadcast-or-exchange on doc_id; the url map is re-read from
      the maincontent parquet, never held in memory).

    Returns ``(curated_ds, stats)``; stats adds ``n_pages`` on top of
    curate_docs' per-stage counts.
    """
    import ray.data

    from docling_translate_ray.functions.boilerplate import strip_boilerplate
    from docling_translate_ray.stages.shuffle import broadcast_join
    from docling_translate_ray.state.stages import StageRunner

    if work_dir is None:
        if resume:
            raise ValueError("resume=True needs an explicit work_dir")
        import atexit

        work_dir = tempfile.mkdtemp(prefix="dtr_webcurate_")
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)
    runner = StageRunner(work_dir, resume=resume, params={
        "pipeline": "curate_pages", "url_column": url_column,
        "min_words": min_words,
    })

    def build_maincontent(d: str) -> None:
        import polars as pl

        stripped = strip_boilerplate(
            pages_ds.select_columns([url_column, html_column]),
            id_column=url_column, html_column=html_column,
            min_words=min_words)

        def with_ids(batch: pa.Table) -> pa.Table:
            df = (pl.from_arrow(batch.select([url_column, "clean_text"]))
                  .with_columns(
                      pl.col(url_column).hash(seed=0)
                      .reinterpret(signed=True).alias("doc_id"))
                  .rename({"clean_text": "text"}))
            return df.select(["doc_id", url_column, "text"]).to_arrow().cast(
                pa.schema([("doc_id", pa.int64()),
                           (url_column, pa.string()),
                           ("text", pa.string())]))

        stripped.map_batches(
            with_ids, batch_format="pyarrow").write_parquet(d)

    mc_dir = runner.stage("maincontent", build_maincontent)
    mc = ray.data.read_parquet(mc_dir)

    curated, stats = curate_docs(
        mc.select_columns(["doc_id", "text"]),
        work_dir=os.path.join(work_dir, "curate"), resume=resume,
        **curate_kwargs)
    stats = {"n_pages": mc.count(), **stats}

    def build_final(d: str) -> None:
        urls = mc.select_columns(["doc_id", url_column])
        broadcast_join(curated, urls, on=["doc_id"],
                       how="inner").write_parquet(d)

    f_dir = runner.stage("final", build_final)
    return ray.data.read_parquet(f_dir), stats
