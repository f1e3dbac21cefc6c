"""CLI entry — the reference's ``python main.py <input>`` (main.py:40-52)
re-expressed as a Ray job driver::

    python -m docling_translate_ray INPUT_DIR OUT_DIR \
        [--layout shard|bucket] [--engine identity|upper|lexicon]
        [--miss-policy empty|identity] [--strategy auto|broadcast|join]
        [--speed-mode fast|balanced|accurate] [--fast]
        [--n-buckets 64] [--no-resume] [--source-kind pages|docs_text|files]
        [--num-cpus N] [--pipeline extract|curate|mixture|webcurate|wet|wat|jsonl]
        [--retention ...]

This is the ONE library entry point that may own a Ray session (guarded —
under ``ray job submit`` the session already exists and is reused).
Prints the job result as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="docling_translate_ray")
    p.add_argument("input", help="directory (or file) of pages parquet")
    p.add_argument("out", help="output directory (docs/, scored/, lineage/)")
    p.add_argument("--layout", choices=["shard", "bucket"], default="shard")
    p.add_argument("--engine", default=None,
                   help="scoring engine (identity|upper|lexicon); omit to skip Phase 2")
    p.add_argument("--miss-policy", choices=["empty", "identity"], default="empty")
    p.add_argument("--strategy", choices=["auto", "broadcast", "join"],
                   default="auto",
                   help="Phase-2 join-back: auto = broadcast while uniques "
                        "fit a budget, else distributed join")
    p.add_argument("--speed-mode", choices=["fast", "balanced", "accurate"],
                   default="accurate", dest="speed_mode",
                   help="S4 fidelity/speed profile: fast skips table-cell/"
                        "caption recovery and formula classification "
                        "(main.py --fast analog)")
    p.add_argument("--fast", action="store_const", const="fast",
                   dest="speed_mode", help="alias for --speed-mode fast")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--source-kind", choices=["pages", "docs_text", "files"],
                   default="pages",
                   help="pages = input_hint parquet; files = a folder of "
                        "raw .html/.pdf/.txt/code files (the reference's "
                        "input surface; needs --layout bucket)")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--no-span-text", action="store_true",
                   help="slim output: drop the text field from span structs "
                        "(offsets + extracted_text remain)")
    p.add_argument("--pipeline",
                   choices=["extract", "curate", "mixture", "webcurate",
                            "factory", "wet", "wat", "jsonl"],
                   default="extract",
                   help="extract = the flagship job over pages parquet; "
                        "webcurate = raw pages → boilerplate strip → the "
                        "curate chain (urls re-attached); "
                        "curate / mixture = the composite pipelines over a "
                        "docs parquet dir (doc_id, text[, lang, is_target]); "
                        "wet = the Common-Crawl conversion job — INPUT is a "
                        "dir of .warc[.gz] segments, OUT_DIR gets .wet.gz "
                        "segments (extraction in between, streaming); "
                        "wat = the Common-Crawl metadata job — same INPUT, "
                        "OUT_DIR gets .wat.gz segments (headmeta + resolved "
                        "links as JSON metadata records); "
                        "jsonl = the same WARC→extract job emitting gzipped "
                        "JSONL corpus shards (url, lang, text, n_chars); "
                        "factory = the FULL corpus factory — INPUT is a dir "
                        "of .warc[.gz] segments, OUT_DIR the composite "
                        "work_dir: extract → curate → mixture → shards → "
                        ".jsonl.gz export, stage-resumable; "
                        "OUT_DIR is the composite work_dir — stage resume is "
                        "on unless --no-resume")
    p.add_argument("--retention", choices=["min_id", "keep_best"],
                   default="min_id",
                   help="curate only: near-dup cluster survivor policy")
    p.add_argument("--normalize", action="store_true",
                   help="curate only: insert the unicode-normalization "
                        "pass as stage 0 (pre-hash cleanup)")
    p.add_argument("--trim-lines", action="store_true",
                   help="curate only: insert within-doc repeated-line "
                        "trimming before hashing (stage 0b)")
    p.add_argument("--blocklist", default=None,
                   help="curate only: comma-separated badwords — docs "
                        "containing any (token match) are dropped before "
                        "the quality gate (C4-style, stage 0c)")
    p.add_argument("--compress-filter", action="store_true",
                   help="curate only: drop docs whose zlib compression "
                        "ratio marks them boilerplate/machine-generated "
                        "(RefinedWeb-style, stage 0d)")
    args = p.parse_args(argv)

    import ray

    # own the session only if nobody else does (under `ray job submit`
    # or a pytest session the caller's session is reused and NOT shut
    # down on exit)
    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs,
         runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                      "worker_process_setup_hook": "docling_translate_ray.util.warm_imports"})

    def _shutdown():
        if owns_session:
            ray.shutdown()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.pipeline == "wet":
        import os

        from docling_translate_ray.sources.warc import read_wet, warc_to_wet

        warc_to_wet(args.input, args.out)
        n_segments = len([f for f in os.listdir(args.out)
                          if f.endswith((".wet", ".wet.gz"))])
        print(json.dumps({"out": args.out, "segments": n_segments,
                          "records": read_wet(args.out).count()}))
        _shutdown()
        return 0

    if args.pipeline == "wat":
        import os

        from docling_translate_ray.sources.warc import read_wat, warc_to_wat

        warc_to_wat(args.input, args.out)
        n_segments = len([f for f in os.listdir(args.out)
                          if f.endswith((".wat", ".wat.gz"))])
        print(json.dumps({"out": args.out, "segments": n_segments,
                          "records": read_wat(args.out).count()}))
        _shutdown()
        return 0

    if args.pipeline == "jsonl":
        import os

        from docling_translate_ray.sources.jsonl import (
            JSONL_CORPUS_SCHEMA, read_jsonl, warc_to_jsonl)

        warc_to_jsonl(args.input, args.out)
        n_shards = len([f for f in os.listdir(args.out)
                        if f.endswith((".jsonl", ".jsonl.gz"))])
        print(json.dumps({
            "out": args.out, "shards": n_shards,
            "records": read_jsonl(args.out,
                                  schema=JSONL_CORPUS_SCHEMA).count()}))
        _shutdown()
        return 0

    if args.pipeline == "factory":
        from docling_translate_ray.pipelines.factory import corpus_factory

        out, dirs = corpus_factory(
            args.input, work_dir=args.out, resume=not args.no_resume)
        stats = {k: out[k][0].as_py() for k in out.column_names}
        stats.update({k: v for k, v in dirs.items() if k != "work_dir"})
        print(json.dumps(stats))
        _shutdown()
        return 0

    if args.pipeline in ("curate", "mixture", "webcurate"):
        import ray.data

        ds = ray.data.read_parquet(args.input)
        # strip each entry: 'foo, bar' must mean {'foo','bar'} — a ' bar'
        # token can never match in word mode (ADVICE r03)
        blocklist = ([w.strip() for w in args.blocklist.split(",")
                      if w.strip()]
                     if args.blocklist else None) or None
        if args.pipeline == "webcurate":
            from docling_translate_ray.pipelines.curate import curate_pages

            _, stats = curate_pages(
                ds.select_columns(["url", "html"]), work_dir=args.out,
                resume=not args.no_resume, retention=args.retention,
                normalize=args.normalize, trim_lines=args.trim_lines,
                blocklist=blocklist,
                compress_filter=args.compress_filter)
            stats["final_dir"] = args.out + "/final"
        elif args.pipeline == "curate":
            from docling_translate_ray.pipelines.curate import curate_docs

            curated, stats = curate_docs(
                ds.select_columns(["doc_id", "text"]),
                work_dir=args.out, retention=args.retention,
                resume=not args.no_resume, normalize=args.normalize,
                trim_lines=args.trim_lines, blocklist=blocklist,
                compress_filter=args.compress_filter)
            stats["curated_dir"] = args.out + "/curated"
        else:
            from docling_translate_ray.pipelines.mixture import build_mixture

            final, stats = build_mixture(
                ds, work_dir=args.out, resume=not args.no_resume)
            # the last leg (rebalance + attach) is lazy — make it durable
            final_dir = args.out + "/final"
            import shutil

            shutil.rmtree(final_dir, ignore_errors=True)
            final.write_parquet(final_dir)
            stats["final_dir"] = final_dir
        print(json.dumps(stats))
        _shutdown()
        return 0

    from docling_translate_ray.pipelines.extract import run_extract_job

    res = run_extract_job(
        args.input,
        args.out,
        n_buckets=args.n_buckets,
        resume=not args.no_resume,
        engine=args.engine,
        miss_policy=args.miss_policy,
        source_kind=args.source_kind,
        strategy=args.strategy,
        layout=args.layout,
        span_text=not args.no_span_text,
        speed_mode=args.speed_mode,
    )
    print(json.dumps(res))
    _shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
