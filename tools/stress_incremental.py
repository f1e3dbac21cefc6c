"""Corpus-scale incremental-extraction stress: 960k pages, a second crawl
snapshot with ~5% changed / ~2% removed / ~2% added pages, then

* A: full extract of snapshot 1 (the base state, shard layout),
* B: `run_incremental_extract_job` snapshot 1 → 2 (diff + delta-only parse),
* C: full re-extract of snapshot 2 (the cost incremental avoids),

and an equivalence check: the manifest-resolved incremental state must
hold exactly the same url set as the full re-extraction.  Records wall
times, delta fractions and peak object-store usage as one JSON line.

Usage: python tools/stress_incremental.py [n_pages] [num_cpus]
Owns its Ray session.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

from stress_curate import PlasmaPeak, ensure_corpus  # noqa: E402


def _uniquify_shard(args) -> None:
    """stress_curate's cached corpus restarts page indices per shard, so
    the same url appears once per shard (different content) — fine for
    extraction, but snapshot_diff's contract is one row per url per
    snapshot.  Rewrite each shard's urls with a shard-unique host label."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src, dst, shard_idx = args
    t = pq.read_table(src)
    urls = pa.array(
        [u.replace("https://", f"https://s{shard_idx}-") for u in
         t["url"].to_pylist()], pa.string())
    cols = {name: t[name] for name in t.schema.names}
    cols["url"] = urls
    pq.write_table(pa.table(cols, schema=t.schema), dst)


def ensure_unique_corpus(n_pages: int) -> str:
    import multiprocessing as mp

    base = ensure_corpus(n_pages)
    cache = f"/tmp/dtr_stress_pagesU_{n_pages}"
    marker = os.path.join(cache, "_DONE")
    if os.path.exists(marker):
        return cache
    os.makedirs(cache, exist_ok=True)
    files = sorted(f for f in os.listdir(base) if f.endswith(".parquet"))
    jobs = [(os.path.join(base, f), os.path.join(cache, f), i)
            for i, f in enumerate(files)]
    with mp.Pool(16) as pool:
        pool.map(_uniquify_shard, jobs)
    open(marker, "w").write("ok")
    return cache


def _mutate_shard(args) -> tuple[int, int, int]:
    """Snapshot-2 version of one shard file: url-hash-deterministic
    ~2% removed, ~5% changed (content splice), ~2% added (new urls)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    src, dst = args
    t = pq.read_table(src)
    rows = t.to_pylist()
    out, n_removed, n_changed, n_added = [], 0, 0, 0
    for r in rows:
        h = int(hashlib.md5(r["url"].encode()).hexdigest()[:8], 16) % 100
        if h < 2:
            n_removed += 1
            continue
        if h < 7 and r["html"]:
            r = dict(r)
            r["html"] = r["html"].replace(
                b"</body>", b"<p>snapshot two revision</p></body>")
            n_changed += 1
        out.append(r)
        if h >= 98:
            r2 = dict(r)
            r2["url"] = r["url"] + "/snapshot2-new"
            out.append(r2)
            n_added += 1
    pq.write_table(pa.Table.from_pylist(out, schema=t.schema), dst)
    return n_removed, n_changed, n_added


def ensure_snapshot2(pages_dir: str, n_pages: int) -> str:
    import multiprocessing as mp

    cache = f"/tmp/dtr_stress_pages2_{n_pages}"
    marker = os.path.join(cache, "_DONE")
    if os.path.exists(marker):
        return cache
    os.makedirs(cache, exist_ok=True)
    files = sorted(f for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    jobs = [(os.path.join(pages_dir, f), os.path.join(cache, f)) for f in files]
    with mp.Pool(16) as pool:
        pool.map(_mutate_shard, jobs)
    open(marker, "w").write("ok")
    return cache


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                      "worker_process_setup_hook": "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.pipelines.incremental import (
        read_corpus_docs,
        run_incremental_extract_job,
    )

    snap1 = ensure_unique_corpus(n_pages)
    snap2 = ensure_snapshot2(snap1, n_pages)
    work = f"/tmp/dtr_stress_incr_{n_pages}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    mon = PlasmaPeak()
    mon.start()

    t0 = time.perf_counter()
    base = run_extract_job(snap1, os.path.join(work, "base"), layout="shard",
                           resume=False)
    t_base = time.perf_counter() - t0

    t1 = time.perf_counter()
    incr = run_incremental_extract_job(
        snap1, snap2, os.path.join(work, "base"), os.path.join(work, "incr"),
        layout="shard", resume=False,
    )
    t_incr = time.perf_counter() - t1

    t2 = time.perf_counter()
    full2 = run_extract_job(snap2, os.path.join(work, "full2"), layout="shard",
                            resume=False)
    t_full2 = time.perf_counter() - t2

    # steady-state hop: snapshot 2 → 3 diffs against the CACHED
    # fingerprints written by the previous incremental run — snapshot 2's
    # pages are never reopened
    snap3 = f"/tmp/dtr_stress_pages3_{n_pages}"
    if not os.path.exists(os.path.join(snap3, "_DONE")):
        import multiprocessing as mp

        os.makedirs(snap3, exist_ok=True)
        files = sorted(f for f in os.listdir(snap2) if f.endswith(".parquet"))
        with mp.Pool(16) as pool:
            pool.map(_mutate_shard,
                     [(os.path.join(snap2, f), os.path.join(snap3, f))
                      for f in files])
        open(os.path.join(snap3, "_DONE"), "w").write("ok")
    t3 = time.perf_counter()
    incr2 = run_incremental_extract_job(
        snap2, snap3, os.path.join(work, "incr"), os.path.join(work, "incr2"),
        layout="shard", resume=False,
    )
    t_incr2 = time.perf_counter() - t3

    # equivalence: same corpus-state cardinality as the full re-extraction
    n_state = read_corpus_docs(os.path.join(work, "incr")).count()
    n_full = read_corpus_docs(os.path.join(work, "full2")).count()

    mon.stop()

    print(json.dumps({
        "n_pages": n_pages, "num_cpus": cpus,
        "base_extract_sec": round(t_base, 1),
        "incremental_sec": round(t_incr, 1),
        "incremental_cached_fp_sec": round(t_incr2, 1),
        "cached_hop_delta_docs": incr2["doc_count"],
        "full_reextract_sec": round(t_full2, 1),
        "speedup_vs_full": round(t_full2 / t_incr, 2),
        "cached_speedup_vs_full": round(t_full2 / t_incr2, 2),
        "delta_docs_parsed": incr["doc_count"],
        "n_added": incr["n_added"], "n_changed": incr["n_changed"],
        "n_removed": incr["n_removed"],
        "delta_fraction": round(incr["doc_count"] / max(base["doc_count"], 1), 4),
        "state_rows": n_state, "full_rows": n_full,
        "state_matches_full": n_state == n_full,
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
