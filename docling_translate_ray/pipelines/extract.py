"""The flagship streaming extraction pipeline (SURVEY.md §3.4).

Phase layout mirrors the reference's 3-phase lifecycle (core.py:417-525) but
each phase is a streaming Ray Data DAG with durable, partitioned output
between phases:

Phase 1 — extract (``layout="shard"``, the 100-TB default for the CLI)::

    read_parquet(todo_files, columns=[url, html, lang], include_paths=True)
      # resume already pruned completed files from the read list
      → map_batches(extract_batch)                   # decode→detect→segment→assemble
      → map_batches(ShardWriter)                     # writes shard=<file>/part-*.parquet,
                                                     #   OUTPUT = KB-sized lineage partials
      → driver-side partial aggregation → out/lineage  # NO data exchange anywhere

Phase 1 — extract (``layout="bucket"``, url-colocated output)::

    read_parquet(pages) → add_url_bucket (hash64(url) % B)
      → filter completed buckets (broadcast anti-join, BEFORE the parse)
      → map_batches(extract_batch)
      → groupby(bucket).map_groups(write_group)      # ONE consolidating shuffle:
                                                     #   bucket=<b>/part-<run>.parquet
                                                     #   + lineage row, same task

Phase 2 (optional) — score/translate::

    read_parquet(out/docs)                           # durable input, no recompute
      → explode sentences → exact dedup (hash-partition)
      → scorer actor pool (engine registry)
      → join-back (broadcast map | hash join) → translated_text
      → ShardWriter / write_bucketed → out/scored

Everything streams: no ``take_all``/``materialize`` on the main path; the
only driver-side materialization is the *unique scored sentence* map in
broadcast mode (the reference's translation_map analog, core.py:486) and
lineage (one row per partition).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa

from docling_translate_ray.stages import dedup as dd
from docling_translate_ray.stages.extract import (
    add_url_bucket,
    explode_sentences_batch,
    explode_spans_batch,
    extract_batch,
    extract_docs_text_batch,
)
from docling_translate_ray.stages.scorer import ScoreSentences
from docling_translate_ray.state import checkpoint as ckpt

PAGES_COLUMNS = ["url", "html", "lang"]  # prune warc_ts/text at the read


def read_pages(path: str):
    import ray.data

    return ray.data.read_parquet(path, columns=PAGES_COLUMNS)


def extract_docs(pages_ds, n_buckets: int = 64, speed_mode: str = "accurate"):
    """pages → docs Dataset (with bucket column). Lazy; nothing executes."""
    return pages_ds.map_batches(
        add_url_bucket, batch_format="pyarrow", fn_kwargs={"n_buckets": n_buckets}
    ).map_batches(extract_batch_keep_bucket, batch_format="pyarrow",
                  fn_kwargs={"speed_mode": speed_mode})


def extract_batch_keep_bucket(batch: pa.Table, speed_mode: str = "accurate") -> pa.Table:
    """extract_batch, carrying the pre-computed bucket column through."""
    bucket = batch["bucket"]
    out = extract_batch(batch, speed_mode)
    return out.append_column("bucket", bucket)


def spans_of(docs_ds):
    return docs_ds.map_batches(explode_spans_batch, batch_format="pyarrow")


def sentences_of(docs_ds):
    return docs_ds.map_batches(explode_sentences_batch, batch_format="pyarrow")


def score_docs(
    docs_ds,
    engine: str = "identity",
    miss_policy: str = "empty",
    scorer_concurrency: int | tuple | None = None,
    score_batch_size: int = 2048,
    strategy: str = "auto",
    max_broadcast_rows: int = 5_000_000,
):
    """Dedup-score-join: the Phase-2 translation analog (core.py:460-497).

    ``docs_ds`` must carry ``url``/``spans`` (and any passthrough columns).

    ``strategy='broadcast'``: unique sentences → actor-pool scorer → Arrow
    table → ``ray.put`` once → probe inside an actor pool.  Right when
    uniques fit in memory (the reference's own per-file-map assumption);
    raises past ``max_broadcast_rows``.
    NOTE: this consumes ``docs_ds`` twice — hand it a *read-back* dataset
    (parquet-backed), not a long transform chain, or extraction reruns.

    ``strategy='join'``: fully distributed — scored uniques hash-join back
    to the sentences table, per-url regroup, then join onto docs.

    ``strategy='auto'`` (default): broadcast while the unique set fits
    ``max_broadcast_rows``, else fall through to the join path — the
    100-TB-safe default (the uniques count is corpus-dependent and a fixed
    choice is wrong at one end or the other).  The scorer re-runs over the
    uniques on fallback; the overflow path is the rare one and the scorer
    cost is dominated by the corpus-side work.
    """
    assert strategy in ("broadcast", "join", "auto")
    if scorer_concurrency is None:
        from docling_translate_ray.util import auto_pool_size

        scorer_concurrency = auto_pool_size()
    sent = sentences_of(docs_ds)
    uniq = dd.unique_sentences(sent)
    scored = uniq.map_batches(
        ScoreSentences,
        fn_constructor_kwargs={"engine": engine},
        batch_format="pyarrow",
        batch_size=score_batch_size,
        concurrency=scorer_concurrency,
    )
    if strategy in ("broadcast", "auto"):
        map_ref = dd.broadcast_score_map(
            scored,
            max_rows=max_broadcast_rows,
            on_overflow="raise" if strategy == "broadcast" else "none",
        )
        if map_ref is not None:
            return docs_ds.map_batches(
                dd.ProbeScoreMap,
                fn_constructor_kwargs={"map_ref": map_ref, "miss_policy": miss_policy},
                batch_format="pyarrow",
                concurrency=scorer_concurrency,
            )
    # join strategy: sentences ⋈ scored → per-url assemble, vectorized per
    # hash partition (NOT one Python call per url — stages/shuffle.py)
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    joined = dd.join_scores(sent, scored)

    def assemble_block(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part).sort(["url", "seg_id", "sent_idx"])
        miss = pl.col("sentence") if miss_policy == "identity" else pl.lit("")
        df = df.with_columns(pl.col("scored").fill_null(miss))
        # per-seg " " join, segs joined by "\n" — html_generator.py:570-571
        per_seg = df.group_by(["url", "seg_id"], maintain_order=True).agg(
            pl.col("scored").str.join(" ")
        )
        per_url_df = per_seg.group_by("url", maintain_order=True).agg(
            pl.col("scored").str.join("\n").alias("translated_text")
        )
        # polars emits large_string; cast so the downstream join's key
        # column type matches the docs side exactly
        return per_url_df.to_arrow().cast(
            pa.schema([("url", pa.string()), ("translated_text", pa.string())])
        )

    per_url = hash_partition_apply(joined, ["url"], assemble_block, num_partitions=32)
    # partition_join, not Dataset.join: the hash-join operator measured 6×
    # slower on wide doc payloads (see stages/shuffle.partition_join)
    from docling_translate_ray.stages.shuffle import partition_join

    out = partition_join(
        docs_ds.drop_columns(["spans"]), per_url, on=["url"], how="left"
    )

    def fill_missing(batch: pa.Table) -> pa.Table:
        # docs with no translatable sentences have no per_url row; emit ""
        # exactly like the broadcast probe does, so both strategies produce
        # identical durable output
        import pyarrow.compute as pc

        col = pc.fill_null(batch["translated_text"], "")
        idx = batch.column_names.index("translated_text")
        return batch.set_column(idx, "translated_text", col)

    return out.map_batches(fill_missing, batch_format="pyarrow")


def _drop_spans_if_present(batch):
    """Uniform scored-sink schema for every strategy: the join path drops
    ``spans`` inside score_docs, the broadcast path keeps them — the
    durable scored output never wants the heavy span payload either way."""
    return batch.drop_columns(["spans"]) if "spans" in batch.column_names else batch


def run_extract_job(
    input_path: str,
    out_dir: str,
    n_buckets: int = 64,
    resume: bool = True,
    engine: str | None = None,
    miss_policy: str = "empty",
    source_kind: str = "pages",
    strategy: str = "auto",
    layout: str = "bucket",
    span_text: bool = True,
    speed_mode: str = "accurate",
    stats_sink: dict | None = None,
) -> dict:
    """End-to-end job: extract → docs+lineage; optionally score → scored.

    Two durable layouts, both idempotent and resumable (rerun skips
    partitions whose lineage row and output dir both exist, BEFORE paying
    the parse):

    * ``layout="shard"`` — the 100-TB path: output partition = input file,
      provenance via ``read_parquet(include_paths=True)``.  ZERO data
      shuffle (the only exchange is KB-sized lineage partials); resume
      prunes completed files from the read list so skipped shards are
      never even opened.  Use when downstream consumes docs by scan.
    * ``layout="bucket"`` — url-hash bucketed output: one consolidating
      ``groupby(bucket)`` exchange buys url-colocated, one-file-per-bucket
      output (for downstream per-url joins).  Costs an all-to-all of the
      doc payload — measured ~6-7 s for 48k docs/350 MB at 32 CPUs, so
      prefer ``shard`` unless colocations is needed.
    """
    import ray.data

    if engine and not span_text:
        raise ValueError(
            "engine scoring requires span text: Phase 2 re-tokenizes spans "
            "from their text field, which span_text=False removes — score "
            "first, or keep span_text=True"
        )

    from docling_translate_ray import extract_core as _ec

    if speed_mode not in _ec.SPEED_MODES:
        raise ValueError(
            f"speed_mode must be one of {_ec.SPEED_MODES}, got {speed_mode!r}")

    run_id = uuid.uuid4().hex[:12]

    if source_kind == "files" and layout == "shard":
        raise ValueError(
            "source_kind='files' requires layout='bucket' — shard layout's "
            "resume bookkeeping is keyed on parquet input files; raw-file "
            "folders get url-hash bucketed output instead")

    if layout == "shard":
        ckpt.check_job_meta(out_dir, "shard", None, speed_mode)
        ckpt.write_job_meta(out_dir, "shard", None, speed_mode)
        return _run_shard_job(input_path, out_dir, run_id, resume, engine,
                              miss_policy, strategy, source_kind, span_text,
                              speed_mode, stats_sink)

    ckpt.check_job_meta(out_dir, "bucket", n_buckets, speed_mode)
    ckpt.write_job_meta(out_dir, "bucket", n_buckets, speed_mode)

    done: set[int] = set()
    if resume:
        done = ckpt.completed_buckets(out_dir)

    if source_kind == "pages":
        src = read_pages(input_path)
    elif source_kind == "files":
        # raw-document folder (the reference's own input surface):
        # mapped to the identical pages schema, so the whole DAG below
        # is shared with the crawled-pages path
        from docling_translate_ray.sources.files import read_document_folder

        src = read_document_folder(input_path)
    else:  # docs_text fixtures (text/code path, core.py:164-321)
        src = ray.data.read_parquet(input_path)
    src = src.map_batches(
        add_url_bucket, batch_format="pyarrow", fn_kwargs={"n_buckets": n_buckets}
    )
    src = ckpt.filter_completed(src, done)
    if source_kind in ("pages", "files"):
        docs = src.map_batches(extract_batch_keep_bucket, batch_format="pyarrow",
                               fn_kwargs={"speed_mode": speed_mode})
    else:
        docs = src.map_batches(_docs_text_keep_bucket, batch_format="pyarrow")

    if not span_text:
        from docling_translate_ray.stages.extract import drop_span_text

        docs = docs.map_batches(drop_span_text, batch_format="pyarrow")

    # single pass: bucket-consolidating shuffle → one file per bucket +
    # lineage row per bucket from the same group task (no read-back)
    lineage_new = ckpt.collect_lineage(
        ckpt.write_bucketed(docs, ckpt.docs_dir(out_dir), run_id)
    )
    if lineage_new.num_rows:
        ckpt.write_lineage(out_dir, lineage_new, run_id)

    # job-level counts reflect ALL durable lineage (this run + prior runs)
    lineage = ckpt.load_lineage(out_dir)
    result = {
        "run_id": run_id,
        "skipped_buckets": len(done),
        "buckets": lineage.num_rows,
        "doc_count": sum(lineage["doc_count"].to_pylist()),
        "ok_count": sum(lineage["ok_count"].to_pylist()),
    }

    if engine:
        back = ray.data.read_parquet(ckpt.docs_dir(out_dir))
        scored = score_docs(back, engine=engine, miss_policy=miss_policy, strategy=strategy)
        sink = scored.map_batches(_drop_spans_if_present, batch_format="pyarrow")
        for _ in ckpt.write_bucketed(
            sink, os.path.join(out_dir, "scored"), run_id
        ).iter_batches():
            pass  # drain: the writer's lineage rows are a byproduct here
        result["scored"] = True
    return result


def _docs_text_keep_bucket(batch: pa.Table) -> pa.Table:
    bucket = batch["bucket"]
    return extract_docs_text_batch(batch).append_column("bucket", bucket)


def _extract_keep_path(batch: pa.Table, speed_mode: str = "accurate") -> pa.Table:
    path = batch["path"]
    return extract_batch(batch, speed_mode).append_column("path", path)


def _docs_text_keep_path(batch: pa.Table) -> pa.Table:
    path = batch["path"]
    return extract_docs_text_batch(batch).append_column("path", path)


def _list_input_files(input_path: str) -> list[str]:
    if os.path.isfile(input_path):
        return [input_path]
    return sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )


def _run_shard_job(input_path: str, out_dir: str, run_id: str, resume: bool,
                   engine: str | None, miss_policy: str, strategy: str,
                   source_kind: str, span_text: bool = True,
                   speed_mode: str = "accurate",
                   stats_sink: dict | None = None) -> dict:
    """Shard-layout body of :func:`run_extract_job` (no data shuffle).
    ``stats_sink`` (bench-only): receives the executed pipeline's
    ``Dataset.stats()`` string under ``"stats"`` — the per-task timing
    evidence bench.py --scaling uses to attribute scaling losses."""
    import shutil

    import ray.data

    files = _list_input_files(input_path)
    done: set[str] = ckpt.completed_shards(out_dir) if resume else set()
    todo = [f for f in files if ckpt.shard_key(f) not in done]

    ddir = ckpt.docs_dir(out_dir)
    if todo:
        # pre-clean stale output of unfinished shards (failed earlier runs)
        for f in todo:
            shutil.rmtree(
                os.path.join(ddir, f"shard={ckpt.shard_key(f)}"), ignore_errors=True
            )
        src = ray.data.read_parquet(
            todo,
            columns=PAGES_COLUMNS if source_kind == "pages" else None,
            include_paths=True,
        )
        if source_kind == "pages":
            docs = src.map_batches(_extract_keep_path, batch_format="pyarrow",
                                   fn_kwargs={"speed_mode": speed_mode})
        else:
            docs = src.map_batches(_docs_text_keep_path, batch_format="pyarrow")
        if not span_text:
            from docling_translate_ray.stages.extract import drop_span_text

            docs = docs.map_batches(drop_span_text, batch_format="pyarrow")
        partials = docs.map_batches(
            ckpt.ShardWriter(ddir, run_id), batch_format="pyarrow"
        )
        # partial rows ≈ num_blocks (KB-sized): aggregate driver-side — the
        # job then contains NO exchange at all (trivial even at 100k shards)
        lineage_new = ckpt.finalize_shard_lineage_local(
            ckpt.collect_lineage(partials, schema=ckpt.SHARD_LINEAGE_SCHEMA)
        )
        if lineage_new.num_rows:
            ckpt.write_shard_lineage(out_dir, lineage_new, run_id)
        if stats_sink is not None:
            stats_sink["stats"] = partials.stats()

    lineage = ckpt.load_shard_lineage(out_dir)
    result = {
        "run_id": run_id,
        "layout": "shard",
        "skipped_shards": len(done),
        "shards": lineage.num_rows,
        "doc_count": sum(lineage["doc_count"].to_pylist()),
        "ok_count": sum(lineage["ok_count"].to_pylist()),
    }

    if engine:
        scored_dir = os.path.join(out_dir, "scored")
        # scoring always covers ALL docs; clear previous runs' parts or a
        # rerun would append duplicate scored rows per shard
        shutil.rmtree(scored_dir, ignore_errors=True)
        back = ray.data.read_parquet(ddir)
        scored = score_docs(back, engine=engine, miss_policy=miss_policy,
                            strategy=strategy)
        sink = scored.map_batches(_drop_spans_if_present, batch_format="pyarrow")
        writer = ckpt.ShardWriter(
            scored_dir, run_id,
            key_column="shard", key_is_path=False,
        )
        for _ in sink.map_batches(writer, batch_format="pyarrow").iter_batches():
            pass  # drain the lineage partials; scored lineage not persisted
        result["scored"] = True
    return result
