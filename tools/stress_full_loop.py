"""The OPERATIONAL LOOP end-to-end at corpus scale — every family
composed in the order a production crawl runs them, proving the url/id
contracts line up across modules (not just that each stress passes
alone):

    setup   : full extract of snapshot 1 → standing corpus state;
              persistent MinHash-LSH index over the extracted docs
    steady  : snapshot 2 arrives →
      A  crawl_cycle plan        (robots gate + change rates + frontier)
      B  incremental extract     (delta-only parse, manifest chain)
      C  index maintenance       (probe the delta against the standing
                                  index → verified near-dup pairs;
                                  insert the ADDED docs; compact)

Reports per-phase wall time, loop totals, and peak object-store usage.
Changed pages MUST surface as verified probe pairs (their old versions
are in the index) — a zero pair count fails loudly.

Usage: python tools/stress_full_loop.py [n_pages] [num_cpus]
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
from stress_incremental import ensure_snapshot2, ensure_unique_corpus  # noqa: E402


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

    import polars as pl
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions import dedup as fdedup
    from docling_translate_ray.functions.urltools import extract_hosts
    from docling_translate_ray.pipelines.crawl_cycle import crawl_cycle
    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.pipelines.incremental import (
        run_incremental_extract_job,
    )
    from docling_translate_ray.stages.shuffle import distinct
    from docling_translate_ray.util import collect_to_table

    snap1 = ensure_unique_corpus(n_pages)
    snap2 = ensure_snapshot2(snap1, n_pages)
    work = f"/tmp/dtr_full_loop_{n_pages}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    mon = PlasmaPeak()
    mon.start()

    def docs_view(seed: int):
        """(doc_id = url-hash, text) view of an extract output."""

        def fn(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(["url", "extracted_text"]))
            return (
                df.with_columns(
                    pl.col("url").hash(seed).reinterpret(signed=True)
                    .alias("doc_id"))
                .rename({"extracted_text": "text"})
                .select(["doc_id", "url", "text"])
                .to_arrow()
            )

        return fn

    # ---- setup: standing state + standing index (one-time costs)
    t0 = time.perf_counter()
    base_out = os.path.join(work, "base")
    run_extract_job(snap1, base_out, layout="shard", resume=False)
    t_base = time.perf_counter() - t0

    t0 = time.perf_counter()
    idx = os.path.join(work, "mhidx")
    fdedup.build_minhash_index(
        ray.data.read_parquet(os.path.join(base_out, "docs"),
                              columns=["url", "extracted_text"])
        .map_batches(docs_view(7), batch_format="pyarrow"),
        idx)
    # a STANDING index is compacted: the build's per-task insert
    # generations are thousands of tiny part files, and every steady-state
    # probe would pay that read fan-out (measured 176 s vs 21 s at 960k)
    fdedup.minhash_index_compact(idx)
    t_index = time.perf_counter() - t0

    # ---- steady state: snapshot 2 lands
    # A — the crawl plan (same shape as tools/stress_crawl.py)
    t0 = time.perf_counter()

    def hosts_of(batch: pa.Table) -> pa.Table:
        h = extract_hosts(pl.from_arrow(batch["url"]))
        return pa.table({"host": h.to_arrow().cast(pa.string())})

    hosts_tbl = collect_to_table(
        distinct(ray.data.read_parquet(snap2, columns=["url"]).map_batches(
            hosts_of, batch_format="pyarrow"), ["host"], num_partitions=16),
        empty_schema=pa.schema([("host", pa.string())]))
    robots = ray.data.from_arrow(pa.table({
        "host": hosts_tbl["host"],
        "robots_txt": pa.array(
            ["User-agent: other\nDisallow: /\n"] * hosts_tbl.num_rows,
            pa.string()),
    }))
    plan = crawl_cycle(
        ray.data.read_parquet(snap1, columns=["url", "html"]),
        ray.data.read_parquet(snap2, columns=["url", "html"]),
        robots, k_per_cycle=8, content_column="html", algo="xx64")
    n_plan = sum(b.num_rows for b in plan.iter_batches(
        batch_format="pyarrow", batch_size=8192))
    t_plan = time.perf_counter() - t0

    # B — delta-only extraction
    t0 = time.perf_counter()
    incr_out = os.path.join(work, "incr")
    res = run_incremental_extract_job(snap1, snap2, base_out, incr_out,
                                      layout="shard")
    t_incr = time.perf_counter() - t0

    # C — index maintenance: probe a BOUNDED deterministic sample of the
    # changed docs (url-hash gate, PROBE_SAMPLE_PCT %) against the
    # standing index — the semantic point is "changed pages hit their
    # superseded versions", and the synthetic template grammar makes the
    # corpus so self-similar that an unbounded 0.7-threshold probe of the
    # whole delta is a quadratic pair explosion (probe docs × per-doc
    # near-dup fan BOTH scale with n).  A real crawler bounds its
    # per-cycle probe rate the same way.  Then insert the ADDED docs and
    # compact.  Probe ids hash with a different seed — the probe
    # contract wants ids disjoint from the index's.
    PROBE_SAMPLE_PCT = 1
    t0 = time.perf_counter()
    delta_docs = ray.data.read_parquet(
        os.path.join(incr_out, "delta", "docs"),
        columns=["url", "extracted_text"])

    def changed_sample(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (
            df.filter(~pl.col("url").str.contains("/snapshot2-new",
                                                  literal=True))
            .filter(pl.col("url").hash(11) % 100 < PROBE_SAMPLE_PCT)
            .to_arrow()
        )

    pairs = fdedup.minhash_index_probe(
        delta_docs.map_batches(changed_sample, batch_format="pyarrow")
        .map_batches(docs_view(9), batch_format="pyarrow"),
        idx, threshold=0.8)
    n_pairs = sum(b.num_rows for b in pairs.iter_batches(
        batch_format="pyarrow", batch_size=8192))
    t_probe = time.perf_counter() - t0

    t0 = time.perf_counter()

    def added_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.match_substring(batch["url"], "/snapshot2-new"))

    fdedup.minhash_index_insert(
        delta_docs.map_batches(added_only, batch_format="pyarrow")
        .map_batches(docs_view(7), batch_format="pyarrow"), idx)
    compact_stats = fdedup.minhash_index_compact(idx)
    t_maint = time.perf_counter() - t0

    mon.stop()
    mon.join()

    steady = t_plan + t_incr + t_probe + t_maint
    out = {
        "n_pages": n_pages, "num_cpus": cpus,
        "setup_extract_sec": round(t_base, 1),
        "setup_index_sec": round(t_index, 1),
        "plan_sec": round(t_plan, 1),
        "incremental_sec": round(t_incr, 1),
        "probe_sec": round(t_probe, 1),
        "maintain_sec": round(t_maint, 1),
        "steady_state_sec": round(steady, 1),
        "plan_rows": n_plan,
        "delta_docs": res["doc_count"],
        "n_added": res["n_added"], "n_changed": res["n_changed"],
        "probe_sample_pct": PROBE_SAMPLE_PCT,
        "verified_probe_pairs": n_pairs,
        "compact": compact_stats,
        "steady_pages_per_sec": round(n_pages / steady, 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }
    assert n_pairs > 0, "changed docs must hit their superseded versions"
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
