"""Corpus-scale stress of the JSONL interchange lane
(sources/jsonl.py): extract 960k pages, export the extracted docs as
gzipped NDJSON shards, read them back, and count — recording write and
read walls, on-disk bytes, and the same export through the Parquet
sink for context (JSONL pays gzip + text encode; Parquet is the
engine's native format — the gap IS the cost of interchange).

Usage: python tools/stress_jsonl.py [n_pages] [num_cpus]
Owns its Ray session. Results go to stdout as one JSON line.
"""

from __future__ import annotations

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


def _dir_bytes(path: str) -> int:
    return sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                          "worker_process_setup_hook":
                              "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa
    import ray.data

    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.sources.jsonl import read_jsonl, write_jsonl

    pages = ensure_unique_corpus(n_pages)
    work = f"/tmp/dtr_stress_jsonl_{n_pages}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    mon = PlasmaPeak()
    mon.start()

    t0 = time.perf_counter()
    res = run_extract_job(pages, os.path.join(work, "extract"),
                          layout="shard", resume=False)
    t_extract = time.perf_counter() - t0

    def corpus_view(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            batch.select(["url", "lang", "extracted_text", "n_chars"]))
        return df.rename({"extracted_text": "text"}).to_arrow()

    def docs():
        return ray.data.read_parquet(
            os.path.join(work, "extract", "docs"),
            columns=["url", "lang", "extracted_text", "n_chars"],
        ).map_batches(corpus_view, batch_format="pyarrow")

    # JSONL export (gzip shards, one per batch)
    out_jsonl = os.path.join(work, "jsonl")
    t1 = time.perf_counter()
    write_jsonl(docs(), out_jsonl)
    t_write_jsonl = time.perf_counter() - t1

    schema = pa.schema([("url", pa.string()), ("lang", pa.string()),
                        ("text", pa.string()), ("n_chars", pa.int64())])
    t2 = time.perf_counter()
    n_back = read_jsonl(out_jsonl, schema=schema).count()
    t_read_jsonl = time.perf_counter() - t2
    assert n_back == res["doc_count"], (n_back, res["doc_count"])

    # Parquet export of the SAME view, for context
    out_pq = os.path.join(work, "pq")
    t3 = time.perf_counter()
    docs().write_parquet(out_pq)
    t_write_pq = time.perf_counter() - t3
    t4 = time.perf_counter()
    n_pq = ray.data.read_parquet(out_pq).count()
    t_read_pq = time.perf_counter() - t4
    assert n_pq == res["doc_count"]

    mon.stop()
    mon.join()

    jsonl_bytes = _dir_bytes(out_jsonl)
    pq_bytes = _dir_bytes(out_pq)
    print(json.dumps({
        "n_pages": n_pages, "num_cpus": cpus,
        "extract_sec": round(t_extract, 1),
        "jsonl_write_sec": round(t_write_jsonl, 1),
        "jsonl_read_count_sec": round(t_read_jsonl, 1),
        "jsonl_shards": len(os.listdir(out_jsonl)),
        "jsonl_mib": round(jsonl_bytes / 2**20, 1),
        "jsonl_write_mib_per_sec": round(
            jsonl_bytes / 2**20 / t_write_jsonl, 1),
        "parquet_write_sec": round(t_write_pq, 1),
        "parquet_read_count_sec": round(t_read_pq, 1),
        "parquet_mib": round(pq_bytes / 2**20, 1),
        "doc_count": res["doc_count"],
        "docs_per_sec_jsonl_roundtrip": round(
            res["doc_count"] / (t_write_jsonl + t_read_jsonl), 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))


if __name__ == "__main__":
    main()
