"""Corpus-scale stress of the FULL corpus factory
(pipelines/factory.corpus_factory): n raw pages are first packed into
real per-record-gzip WARC segments (the CC layout, with
WARC-Identified-Content-Language headers), then the one-composite run:

    WARC → main-content extraction → curate (quality / exact dedup /
    near-dedup) → mixture (DSIR vs 'en' → token budget → rebalance)
    → training shards → .jsonl.gz export + read-back verify

recording wall, pages/s, per-stage counts, the marker-resume wall and
PEAK object-store usage.  Dups are planted exactly as in
stress_webcurate (~8% exact copies, ~5% near copies) so both dedup
stages do real work; langs are assigned url-deterministically (60%
'en' — the DSIR target — over 5 languages).

Usage: python tools/stress_factory.py [n_pages] [num_cpus]
Owns its Ray session.  One JSON line to stdout.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from stress_curate import PlasmaPeak  # noqa: E402
from stress_incremental import ensure_unique_corpus  # noqa: E402

_LANGS = ["en", "en", "en", "en", "en", "en", "fr", "es", "de", "zh"]


def ensure_warc_corpus(n_pages: int) -> str:
    """Pack the planted stress pages into cached WARC segment files."""
    import pyarrow as pa
    import ray.data

    from docling_translate_ray.sources.warc import build_warc_bytes

    corpus = ensure_unique_corpus(n_pages)
    out_dir = f"/tmp/dtr_stress_warc_{n_pages}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    ts = _dt.datetime(2017, 3, 6, 4, 3, 53)

    def write_segment(batch: pa.Table) -> pa.Table:
        import uuid

        import polars as pl

        base_p = ("<p>" + " ".join(f"w{k} common body token"
                                   for k in range(40)) + "</p>")
        exact = [("<html><body><p>canonical doc %d </p>" % v) + base_p
                 + "</body></html>" for v in range(4)]
        df = pl.from_arrow(batch.select(["url", "html"])).with_columns(
            (pl.col("url").hash(seed=3) % 100).alias("_h"))
        recs = []
        for url, hv, hh in zip(df["url"], df["_h"], df["html"]):
            if hv < 8:
                body = exact[hv % 4].encode()
            elif hv < 13:
                body = (f"<html><body>{base_p}"
                        f"<p>near variant {hv} tail word</p>"
                        "</body></html>").encode()
            else:
                body = hh
            recs.append((url, ts, body, _LANGS[hv % 10]))
        blob = build_warc_bytes(recs, gzip_per_record=True)
        with open(os.path.join(out_dir, f"seg-{uuid.uuid4().hex}.warc.gz"),
                  "wb") as f:
            f.write(blob)
        return pa.table({"n": pa.array([len(recs)], pa.int64())})

    ray.data.read_parquet(corpus, columns=["url", "html"]).map_batches(
        write_segment, batch_format="pyarrow", batch_size=4000).materialize()
    open(marker, "w").write("ok")
    return out_dir


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                          "worker_process_setup_hook":
                          "docling_translate_ray.util.warm_imports"})
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from docling_translate_ray.pipelines.factory import corpus_factory

    t_warc = time.perf_counter()
    warc_dir = ensure_warc_corpus(n_pages)
    warc_wall = time.perf_counter() - t_warc

    work_dir = f"/tmp/stress_factory_{n_pages}"
    shutil.rmtree(work_dir, ignore_errors=True)

    mon = PlasmaPeak()
    mon.start()
    t0 = time.perf_counter()
    out, _dirs = corpus_factory(warc_dir, work_dir=work_dir)
    wall = time.perf_counter() - t0
    mon.stop()
    mon.join(timeout=5)

    stats = {k: out[k][0].as_py() for k in out.column_names}
    assert stats["n_pages"] == n_pages, stats
    assert stats["n_exact_unique"] < stats["n_quality_ok"], stats
    assert stats["n_curated"] < stats["n_exact_unique"], stats
    assert stats["n_exported"] == stats["n_mixture"] > 0, stats

    t1 = time.perf_counter()
    out2, _ = corpus_factory(warc_dir, work_dir=work_dir, resume=True)
    resume_wall = time.perf_counter() - t1
    assert out2.to_pydict() == out.to_pydict()

    print(json.dumps({
        "metric": "stress_factory", "n_pages": n_pages, "num_cpus": cpus,
        "warc_build_sec": round(warc_wall, 1),
        "wall_sec": round(wall, 1),
        "pages_per_sec": int(n_pages / wall),
        "stats": stats,
        "resume_wall_sec": round(resume_wall, 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
