"""Corpus factory — the production artifact the north star implies,
as ONE resumable composite:

    WARC segments → decode (charset ladder inside the parse lanes)
                  → main-content extraction (jusText-style strip)
                  → webcurate chain (quality → exact dedup → near-dedup)
                  → training mixture (DSIR vs a target language →
                    token-budget selection → α=0.5 lang rebalancing)
                  → deterministic training shards
                  → ``.jsonl.gz`` export (+ read-back verification)

Every stage is durable parquet under one ``work_dir`` with the
``StageRunner`` skip-if-complete contract (the nested curate/mixture
composites resume through their OWN runners under ``work_dir/curate``
and ``work_dir/mixture``), so a run that dies in the export re-pays
nothing upstream.  No stage materializes the corpus in object-store
memory; the composition rules are curate's (durable hop between
stages, broadcast-or-exchange joins, counts from parquet metadata).

The returned stats row is the END-TO-END contract: per-stage survivor
counts plus value-pinning aggregates (mixture token/score sums, the
rank-weighted shard order checksum) that a single composed DuckDB
oracle replays from the raw documents — the strongest cross-module
consistency proof the driver gate can express (each constituent is
also oracled standalone).

Reference anchors: core.py run loop (extract→translate per doc) and
app.py's batch path compose the same way; this factory is that loop
re-expressed as a corpus-scale Ray Data DAG per SURVEY.md §7/§8.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa

_STATS_COLS = [
    "n_pages", "n_input", "n_quality_ok", "n_exact_unique", "n_curated",
    "mix_n_input", "mix_n_quality", "mix_n_selected", "n_mixture",
    "mix_tokens", "mix_dsir_sum", "n_shards", "shards_chars",
    "shards_order_check", "n_exported",
]


def corpus_factory(warc_dir: str, work_dir: str | None = None,
                   id_regex: str | None = None, target_lang: str = "en",
                   budget_pct: int = 50, quota_scale: int = 8,
                   hex_digits: int = 1, min_words: int = 5,
                   minhash_threshold: float = 0.7,
                   hash_mode: str = "xx64", resume: bool = False,
                   num_partitions: int = 32):
    """Run the factory; return ``(stats_row: pa.Table, dirs: dict)``.

    ``id_regex``: when set, ``doc_id`` = the int of the regex's first
    group over the url (SQL-replayable ids — the driver-oracle mode);
    default is the 64-bit url hash (production, the curate_pages
    convention).  ``target_lang`` defines the DSIR target domain from
    the WARC records' ``WARC-Identified-Content-Language`` annotation.
    ``hash_mode`` reaches the mixture's rebalance rank (md5 = oracle
    lockstep).  ``resume=True`` needs an explicit ``work_dir``.
    """
    import ray.data

    from docling_translate_ray.functions.boilerplate import strip_boilerplate
    from docling_translate_ray.functions.shards import train_shards
    from docling_translate_ray.pipelines.curate import curate_docs
    from docling_translate_ray.pipelines.mixture import build_mixture
    from docling_translate_ray.sources.jsonl import read_jsonl, write_jsonl
    from docling_translate_ray.sources.warc import read_warc
    from docling_translate_ray.stages.shuffle import (
        broadcast_join,
        id_filter_join,
    )
    from docling_translate_ray.state.stages import StageRunner

    if work_dir is None:
        if resume:
            raise ValueError("resume=True needs an explicit work_dir")
        import atexit

        work_dir = tempfile.mkdtemp(prefix="dtr_factory_")
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)
    runner = StageRunner(work_dir, resume=resume, params={
        "pipeline": "corpus_factory", "id_regex": id_regex,
        "target_lang": target_lang, "budget_pct": budget_pct,
        "quota_scale": quota_scale, "hex_digits": hex_digits,
        "min_words": min_words, "minhash_threshold": minhash_threshold,
        "hash_mode": hash_mode,
    })

    # stage 1 — WARC parse to durable input_hint pages (url, html, lang);
    # the gzip-member parse and the decode ladder live in the source/
    # strip lanes, one segment file per task (the CC parallelism unit)
    pages_dir = runner.stage("pages", lambda d: read_warc(warc_dir)
                             .select_columns(["url", "html", "lang"])
                             .write_parquet(d))

    # stage 2 — main-content extraction.  lang rides INSIDE the strip's
    # id key (url\x1flang) so no re-alignment join is ever needed; the
    # post-map splits it back and derives doc_id.
    SEP = "\x1f"

    def build_maincontent(d: str) -> None:
        import polars as pl

        def key_pages(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(["url", "lang", "html"]))
            return (df.with_columns(
                (pl.col("url") + SEP + pl.col("lang").fill_null(""))
                .alias("_key"))
                .select(["_key", "html"]).to_arrow())

        stripped = strip_boilerplate(
            ray.data.read_parquet(pages_dir).map_batches(
                key_pages, batch_format="pyarrow"),
            id_column="_key", html_column="html", min_words=min_words)

        def with_ids(batch: pa.Table) -> pa.Table:
            df = (pl.from_arrow(batch.select(["_key", "clean_text"]))
                  .with_columns(
                      pl.col("_key").str.split(SEP).alias("_parts"))
                  .with_columns(
                      pl.col("_parts").list.get(0).alias("url"),
                      pl.col("_parts").list.get(1, null_on_oob=True)
                      .fill_null("").alias("lang"))
                  .rename({"clean_text": "text"}))
            if id_regex is not None:
                ids = (df["url"].str.extract(id_regex, 1)
                       .cast(pl.Int64, strict=False).fill_null(-1))
            else:
                ids = (df["url"].hash(seed=0).reinterpret(signed=True))
            return (df.with_columns(ids.alias("doc_id"))
                    .select(["doc_id", "url", "lang", "text"])
                    .to_arrow()
                    .cast(pa.schema([
                        ("doc_id", pa.int64()), ("url", pa.string()),
                        ("lang", pa.string()), ("text", pa.string())])))

        stripped.map_batches(with_ids, batch_format="pyarrow") \
            .write_parquet(d)

    mc_dir = runner.stage("maincontent", build_maincontent)
    mc = ray.data.read_parquet(mc_dir)
    stats: dict[str, int] = {"n_pages": mc.count()}

    # stage 3 — the curate chain (its own nested StageRunner)
    curated, cstats = curate_docs(
        mc.select_columns(["doc_id", "text"]),
        work_dir=os.path.join(work_dir, "curate"), resume=resume,
        minhash_threshold=minhash_threshold)
    stats.update(cstats)

    # stage 4 — mixture input: curated text + lang (narrow broadcast-or-
    # exchange attach from the maincontent map) + the target marker
    def build_mixture_in(d: str) -> None:
        import pyarrow.compute as pc

        joined = broadcast_join(
            curated.select_columns(["doc_id", "text"]),
            mc.select_columns(["doc_id", "lang"]),
            on=["doc_id"], how="inner", num_partitions=num_partitions)
        joined.map_batches(
            lambda b: b.append_column(
                "is_target", pc.equal(b["lang"], target_lang)),
            batch_format="pyarrow").write_parquet(d)

    mixin_dir = runner.stage("mixture_in", build_mixture_in)

    # stage 5 — the mixture composite (nested StageRunner)
    final, mstats = build_mixture(
        ray.data.read_parquet(mixin_dir),
        work_dir=os.path.join(work_dir, "mixture"), resume=resume,
        budget_pct=budget_pct, quota_scale=quota_scale,
        num_partitions=num_partitions, hash_mode=hash_mode)
    stats.update({
        "mix_n_input": mstats["n_input"],
        "mix_n_quality": mstats["n_quality"],
        "mix_n_selected": mstats["n_selected"],
    })

    mix_dir = runner.stage("mixrows", lambda d: final.write_parquet(d))
    mixrows = ray.data.read_parquet(mix_dir)
    stats["n_mixture"] = mixrows.count()

    def _sums(cols: list[str]) -> list[int]:
        # distributed partial sums — one tiny row per block reaches the
        # driver, never the mixture rows themselves
        import pyarrow.compute as pc

        def partial(b: pa.Table) -> pa.Table:
            return pa.table({c: pa.array([pc.sum(b[c]).as_py() or 0],
                                         pa.int64()) for c in cols})

        totals = [0] * len(cols)
        for b in mixrows.select_columns(cols).map_batches(
                partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for i, c in enumerate(cols):
                totals[i] += pc.sum(b[c]).as_py() or 0
        return [int(t) for t in totals]

    stats["mix_tokens"], stats["mix_dsir_sum"] = _sums(
        ["n_tokens", "dsir_score"])

    # stage 6 — the selected documents' full rows (text re-attached by a
    # semi filter; the corpus side never crosses an exchange under the
    # id budget)
    def build_selected(d: str) -> None:
        id_filter_join(
            curated.select_columns(["doc_id", "text"]),
            mixrows.select_columns(["doc_id"]),
            id_column="doc_id", how="semi",
            num_partitions=num_partitions).write_parquet(d)

    sel_dir = runner.stage("selected_docs", build_selected)
    sel_docs = ray.data.read_parquet(sel_dir)

    # stage 7 — deterministic training shards (+ durable shard files)
    shardstats_dir = runner.stage(
        "shardstats",
        lambda d: train_shards(
            sel_docs, hex_digits=hex_digits,
            out_dir=os.path.join(work_dir, "shard_files"),
            num_partitions=num_partitions).write_parquet(d))
    shard_tbl = ray.data.read_parquet(shardstats_dir)
    import pyarrow.compute as pc

    sh = pa.concat_tables([b for b in shard_tbl.iter_batches(
        batch_format="pyarrow")], promote_options="default") \
        if stats["n_mixture"] else pa.table(
            {"shard": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int64()),
             "total_chars": pa.array([], pa.int64()),
             "order_check": pa.array([], pa.int64())})
    stats["n_shards"] = sh.num_rows
    stats["shards_chars"] = int(pc.sum(sh["total_chars"]).as_py() or 0)
    stats["shards_order_check"] = int(pc.sum(sh["order_check"]).as_py() or 0)

    # stage 8 — .jsonl.gz export of the final training rows + read-back
    # verification (the exported files must parse to exactly the
    # mixture's row count)
    export_dir = os.path.join(work_dir, "export")

    def build_export(d: str) -> None:
        rows = broadcast_join(
            sel_docs,
            mixrows, on=["doc_id"], how="inner",
            num_partitions=num_partitions)
        rows = broadcast_join(
            rows, mc.select_columns(["doc_id", "url"]),
            on=["doc_id"], how="inner", num_partitions=num_partitions)
        write_jsonl(rows.select_columns(
            ["doc_id", "url", "lang", "text", "n_tokens", "dsir_score"]),
            export_dir, gzip_compress=True)
        # the stage dir itself records the manifest row
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"export_dir": [export_dir]}),
                       os.path.join(d, "manifest.parquet"))

    runner.stage("export", build_export)
    n_exported = (read_jsonl(export_dir).count()
                  if os.path.isdir(export_dir) and any(
                      f.endswith(".jsonl.gz")
                      for f in os.listdir(export_dir)) else 0)
    if n_exported != stats["n_mixture"]:
        raise RuntimeError(
            f"export round-trip mismatch: {n_exported} exported rows "
            f"!= {stats['n_mixture']} mixture rows")
    stats["n_exported"] = n_exported

    out = pa.table({k: pa.array([stats[k]], pa.int64())
                    for k in _STATS_COLS})
    return out, {"work_dir": work_dir, "pages": pages_dir,
                 "maincontent": mc_dir, "mixture_rows": mix_dir,
                 "shard_files": os.path.join(work_dir, "shard_files"),
                 "export": export_dir}


def synth_warc_corpus(sf_dir: str, out_dir: str,
                      gzip_per_record: bool = True) -> int:
    """Deterministic WARC plant for the factory's driver query / tests:
    each ``documents`` row becomes one WARC response record whose html
    is the webcurate synthetic page (nav + 12-word <p> chunks with
    every 5th link-wrapped + teaser + footer — the planted-truth layout
    the boilerplate oracle replays), url ``https://d<doc_id>.example/a``
    and the document's ``lang`` in the real CC
    ``WARC-Identified-Content-Language`` header.  Returns record count.
    """
    import datetime as _dt
    import uuid

    import ray.data

    from docling_translate_ray.pipelines.queries import webcurate_synth_html
    from docling_translate_ray.sources.warc import build_warc_bytes

    os.makedirs(out_dir, exist_ok=True)
    ts = _dt.datetime(2017, 3, 6, 4, 3, 53)

    def write_segment(batch: pa.Table) -> pa.Table:
        recs = [
            (f"https://d{i}.example/a", ts,
             webcurate_synth_html(i, t or ""), l or "")
            for i, t, l in zip(batch["doc_id"].to_pylist(),
                               batch["text"].to_pylist(),
                               batch["lang"].to_pylist())
        ]
        blob = build_warc_bytes(recs, gzip_per_record=gzip_per_record)
        with open(os.path.join(out_dir, f"seg-{uuid.uuid4().hex}.warc.gz"),
                  "wb") as f:
            f.write(blob)
        return pa.table({"n": pa.array([len(recs)], pa.int64())})

    import pyarrow.compute as pc

    counts = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"]).map_batches(
        write_segment, batch_format="pyarrow")
    total = 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b["n"]).as_py() or 0)
    return total
