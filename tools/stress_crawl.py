"""Corpus-scale stress of the CRAWL composite: two 960k-page snapshots
(~2% removed / ~5% changed / ~2% added, the stress_incremental delta
spec) through ``pipelines/crawl_cycle`` — robots gate over synthesized
per-host rules, xx64 change fingerprints, politeness k=8 — recording
per-phase wall time and PEAK object-store usage, the crawl-family
counterpart of tools/stress_curate.py / stress_mixture.py.

Confirms the narrow-exchange claims at scale: page HTML never crosses
an exchange (fingerprints collapse in-batch), the robots rule table is
the only broadcast, and the only driver state is the rule table and the
final plan's row count (the plan itself is consumed as a stream).

Usage: python tools/stress_crawl.py [n_pages] [num_cpus]
Owns its Ray session. Results go to stdout as one JSON line.
"""

from __future__ import annotations

import json
import os
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

    from docling_translate_ray.functions.urltools import extract_hosts
    from docling_translate_ray.pipelines.crawl_cycle import crawl_cycle
    from docling_translate_ray.stages.shuffle import distinct
    from docling_translate_ray.util import collect_to_table

    snap1 = ensure_unique_corpus(n_pages)
    snap2 = ensure_snapshot2(snap1, n_pages)

    mon = PlasmaPeak()
    mon.start()

    # Phase A: distinct host set → deterministic robots rules (a third of
    # hosts disallow the /p5/ path prefix; the rest allow everything for
    # us).  The distinct is host-keyed and bounded by the host count.
    t0 = time.perf_counter()

    def hosts_of(batch: pa.Table) -> pa.Table:
        h = extract_hosts(pl.from_arrow(batch["url"]))
        return pa.table({"host": h.to_arrow().cast(pa.string())})

    hosts_tbl = collect_to_table(
        distinct(
            ray.data.read_parquet(snap2, columns=["url"]).map_batches(
                hosts_of, batch_format="pyarrow"),
            ["host"], num_partitions=16),
        empty_schema=pa.schema([("host", pa.string())]),
    )

    import hashlib

    def rule(host: str) -> str:
        if int(hashlib.md5(host.encode()).hexdigest()[:8], 16) % 3 == 0:
            return "User-agent: *\nDisallow: /p5/\n"
        return "User-agent: other\nDisallow: /\n"

    robots = ray.data.from_arrow(pa.table({
        "host": hosts_tbl["host"],
        "robots_txt": pa.array([rule(h) for h in hosts_tbl["host"].to_pylist()],
                               pa.string()),
    }))
    t_rules = time.perf_counter() - t0

    # Phase B: the cycle plan over raw html payloads (bytes fingerprint)
    t1 = time.perf_counter()
    plan = crawl_cycle(
        ray.data.read_parquet(snap1, columns=["url", "html"]),
        ray.data.read_parquet(snap2, columns=["url", "html"]),
        robots, k_per_cycle=8, content_column="html", algo="xx64",
    )
    n_plan, n_hot, max_cycle = 0, 0, 0
    for b in plan.iter_batches(batch_format="pyarrow", batch_size=8192):
        n_plan += b.num_rows
        if b.num_rows:
            import pyarrow.compute as pc

            n_hot += pc.sum(pc.cast(pc.greater(b["priority"], 0),
                                    pa.int64())).as_py() or 0
            max_cycle = max(max_cycle, pc.max(b["cycle"]).as_py() or 0)
    t_plan = time.perf_counter() - t1

    mon.stop()
    mon.join()

    print(json.dumps({
        "n_pages": n_pages, "num_cpus": cpus,
        "n_hosts": hosts_tbl.num_rows,
        "rules_sec": round(t_rules, 1),
        "plan_sec": round(t_plan, 1),
        "total_sec": round(t_rules + t_plan, 1),
        "plan_rows": n_plan, "changed_priority_rows": n_hot,
        "max_cycle": max_cycle,
        "pages_per_sec": round(n_pages / (t_rules + t_plan), 1),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
