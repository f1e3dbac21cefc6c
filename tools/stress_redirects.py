"""Redirect-resolution stress: the two physical paths of
``functions/crawl.resolve_redirects`` at web scale.

Edge corpus: N urls in blocks of 8 (the q_resolve_redirects shape —
chains of 1..7 hops, every 5th block a true 8-cycle) PLUS a hot
megachain: one chain of ``max_hops`` urls re-entered by 1% of all
srcs pointing into its head (the bit.ly / URL-shortener shape — many
srcs funnel into one landing chain), so the exchange path's ``cur``
key is genuinely skewed mid-rounds.

Measured:

* ``broadcast`` — the whole (src → dst) map ``ray.put`` once, chains
  walked per batch (the ≤ broadcast_budget path);
* ``exchange``  — pointer doubling, ceil(log2(max_hops))+1 narrow
  co-partitioned exchanges (the 100 TB path).

Outputs are checksum-compared in-run (row count, terminal count,
cycle count, hop sum) — the full row parity is pytest-pinned in
tests/test_redirects.py.

Usage: python tools/stress_redirects.py [n_urls] [num_cpus]
Owns its Ray session.  Results go to stdout as one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_edges(n: int):
    """Arrow edge table: block-of-8 chains/cycles + the hot megachain."""
    import numpy as np
    import pyarrow as pa

    ids = np.arange(n, dtype=np.int64)
    rel = ids % 8
    blk = ids // 8
    closer = (rel == 7) & (blk % 5 == 0)
    keep = (rel != 7) | closer
    src_ids = ids[keep]
    dst_ids = np.where(rel[keep] != 7, src_ids + 1, src_ids - 7)
    src = np.char.add("u", src_ids.astype(str))
    dst = np.char.add("u", dst_ids.astype(str))
    # hot megachain m0→m1→…→m15→LAND; 1% of srcs funnel into m0
    hop = np.arange(15, dtype=np.int64)
    msrc = np.char.add("m", hop.astype(str))
    mdst = np.append(np.char.add("m", (hop[:-1] + 1).astype(str)), "LAND")
    funnel_ids = ids[:: 100]
    fsrc = np.char.add("f", funnel_ids.astype(str))
    fdst = np.full(len(funnel_ids), "m0")
    return pa.table({
        "src_url": pa.array(np.concatenate([src, msrc, fsrc])),
        "dst_url": pa.array(np.concatenate([dst, mdst, fdst])),
    })


def checksum(ds) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    # filter-produced empty blocks carry an empty schema — drop them
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    t = pa.concat_tables(tabs)
    return {
        "rows": t.num_rows,
        "cycles": pc.sum(pc.cast(t["is_cycle"], pa.int64())).as_py(),
        "hop_sum": pc.sum(pc.fill_null(t["hops"], 0)).as_py(),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                          "worker_process_setup_hook":
                              "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from docling_translate_ray.functions.crawl import resolve_redirects

    edges_tbl = gen_edges(n)
    out = {"n_urls": n, "n_edges": edges_tbl.num_rows, "num_cpus": cpus}
    sums = {}
    for strategy, parts in (("broadcast", 0), ("exchange", 64)):
        edges = ray.data.from_arrow(edges_tbl).repartition(64)
        t0 = time.perf_counter()
        res = resolve_redirects(
            edges, max_hops=16, strategy=strategy,
            num_partitions=parts or 64)
        sums[strategy] = checksum(res)
        wall = time.perf_counter() - t0
        out[strategy] = {
            "wall_s": round(wall, 2),
            "urls_per_s": int(sums[strategy]["rows"] / wall),
            **sums[strategy],
        }
    out["paths_agree"] = sums["broadcast"] == sums["exchange"]
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
