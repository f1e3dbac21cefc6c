"""Hot-host skew stress (VERDICT r03 item 7): a 960k-page corpus where
1% of hosts hold 50% of the pages — including ONE megadomain holding 25%
by itself (the blogspot/CDN shape real crawls hit) — driven through the
host-sensitive plans with the per-partition wall profiler on
(``DTR_PARTITION_WALL_DIR``, stages/shuffle.py), before and after the
skew remedies:

* extract (bucket layout)    — control: partitions key on url HASH, so
  host skew must not show; evidence is per-bucket row-count balance.
* host_template_lines        — (host, line)-keyed: the megadomain's
  template lines co-locate all their occurrences → straggler; remedy =
  ``strategy="salted"`` (salt-by-doc partial counts + broadcast-back).
* frontier_schedule          — host-keyed rank: all megadomain rows on
  one partition → straggler; remedy = ``hot_host_threshold`` range split.
* crawl_cycle                — the composite (url exchange + frontier),
  plain vs range-split threshold passthrough.

Per-exchange wall histograms (max / median / straggler ratio) come from
the profiler's one-line-per-partition JSONL files; outputs of plain vs
remedied paths are checksum-compared in-run (count + cycle sums — the
full row parity is pytest-pinned in tests/test_skew_paths.py).

Usage: python tools/stress_skew.py [n_pages] [num_cpus]
Owns its Ray session.  Results go to stdout as one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from stress_curate import PlasmaPeak, ensure_corpus  # noqa: E402

N_HOSTS = 20_000          # universe: 200 hot (1%) + 19_800 cold
N_HOT = 199               # hot1..hot199 share 25% of pages
MEGA = "mega0.example"    # one megadomain holds 25% alone


def _mix(g):
    """splitmix64 finalizer over a numpy uint64 array — deterministic,
    order-free host assignment."""
    import numpy as np

    z = (g + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _skew_shard(args) -> None:
    """Rewrite one base-corpus shard with the skewed host assignment:
    u<250 → megadomain, u<500 → one of 199 hot hosts, else cold tail;
    text gains 3 per-host template lines (nav, login, copyright)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src, dst, start = args
    t = pq.read_table(src)
    n = t.num_rows
    g = np.arange(start, start + n, dtype=np.uint64)
    u = _mix(g) % np.uint64(1000)
    pick = _mix(g ^ np.uint64(0xABCD)) % np.uint64(1_000_000)
    n_cold = N_HOSTS - N_HOT - 1
    hot_names = np.char.add(np.char.add(
        "hot", (1 + pick % N_HOT).astype(np.int64).astype(str)), ".example")
    cold_names = np.char.add(np.char.add(
        "cold", (pick % n_cold).astype(np.int64).astype(str)), ".example")
    hosts = np.where(u < 250, MEGA, np.where(u < 500, hot_names, cold_names))
    urls = [f"https://{h}/p{gi % 17}/{gi}"
            for h, gi in zip(hosts.tolist(), g.tolist())]
    texts = [
        f"NAV {h} home about contact\nLOGIN {h} account signin\n"
        f"{txt}\nCopyright {h} all rights reserved"
        for h, txt in zip(hosts.tolist(), t["text"].to_pylist())
    ]
    cols = {name: t[name] for name in t.schema.names}
    cols["url"] = pa.array(urls, pa.string())
    cols["text"] = pa.array(texts, pa.string())
    pq.write_table(pa.table(cols, schema=t.schema), dst)


def ensure_skew_corpus(n_pages: int) -> str:
    import multiprocessing as mp

    base = ensure_corpus(n_pages)
    cache = f"/tmp/dtr_stress_skew_{n_pages}"
    marker = os.path.join(cache, "_DONE")
    if os.path.exists(marker):
        return cache
    os.makedirs(cache, exist_ok=True)
    files = sorted(f for f in os.listdir(base) if f.endswith(".parquet"))
    jobs = [(os.path.join(base, f), os.path.join(cache, f),
             int(f.split("_")[1].split(".")[0])) for f in files]
    with mp.Pool(16) as pool:
        pool.map(_skew_shard, jobs)
    open(marker, "w").write("ok")
    return cache


def _histograms(wall_dir: str) -> dict:
    """Aggregate the profiler's per-partition JSONL into per-exchange
    stats; straggler = max wall / median wall."""
    recs: dict[str, list[dict]] = {}
    for f in os.listdir(wall_dir):
        if not f.startswith("walls-"):
            continue
        with open(os.path.join(wall_dir, f), encoding="utf-8") as fh:
            for line in fh:
                r = json.loads(line)
                recs.setdefault(r["label"], []).append(r)
    out = {}
    for label, rs in recs.items():
        walls = sorted(r["wall_s"] for r in rs)
        rows = sorted(r["rows_in"] for r in rs)
        med = statistics.median(walls) or 1e-9
        out[label] = {
            "parts": len(rs),
            "rows_med": int(statistics.median(rows)),
            "rows_max": rows[-1],
            "wall_med_s": round(med, 4),
            "wall_max_s": round(walls[-1], 4),
            "wall_sum_s": round(sum(walls), 2),
            "straggler": round(walls[-1] / med, 2),
        }
    return out


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    wall_dir = f"/tmp/dtr_skew_walls_{os.getpid()}"
    os.makedirs(wall_dir, exist_ok=True)

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR",
             runtime_env={"env_vars": {
                 "PYTHONPATH": "/root/repo",
                 "DTR_PARTITION_WALL_DIR": wall_dir},
                 "worker_process_setup_hook":
                     "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().read_op_min_num_blocks = 2 * cpus
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import polars as pl
    import pyarrow as pa

    import ray.data

    from docling_translate_ray.functions.crawl import (frontier_schedule,
                                                       host_template_lines)
    from docling_translate_ray.pipelines.extract import run_extract_job

    corpus = ensure_skew_corpus(n_pages)
    results: dict = {"n_pages": n_pages, "num_cpus": cpus}

    def profiled(name: str, fn):
        for f in os.listdir(wall_dir):
            os.remove(os.path.join(wall_dir, f))
        t0 = time.perf_counter()
        val = fn()
        results[name] = {"wall_s": round(time.perf_counter() - t0, 2),
                         "checksum": val, "exchanges": _histograms(wall_dir)}

    # --- corpus shape (hot share proof) ---
    def host_share():
        from docling_translate_ray.functions.urltools import extract_hosts

        def hb(batch: pa.Table) -> pa.Table:
            h = extract_hosts(pl.from_arrow(batch["url"]))
            return (pl.DataFrame({"host": h})
                    .group_by("host").len(name="n")
                    .with_columns(pl.col("n").cast(pl.Int64)).to_arrow())

        parts = (ray.data.read_parquet(corpus, columns=["url"])
                 .map_batches(hb, batch_format="pyarrow"))
        agg = pl.from_arrow(pa.concat_tables(
            list(parts.iter_batches(batch_format="pyarrow")),
            promote_options="default")).group_by("host").agg(pl.col("n").sum())
        total = agg["n"].sum()
        mega = agg.filter(pl.col("host") == MEGA)["n"].sum()
        hot = agg.filter(pl.col("host").str.starts_with("hot"))["n"].sum()
        return {"hosts": agg.height, "mega_share": round(mega / total, 3),
                "hot200_share": round((mega + hot) / total, 3)}

    results["corpus"] = host_share()

    # --- control: extract partitions on url hash, host skew must not show
    work = f"/tmp/dtr_skew_work_{n_pages}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    mon = PlasmaPeak()
    mon.start()
    t0 = time.perf_counter()
    res = run_extract_job(corpus, os.path.join(work, "extract"),
                          n_buckets=2 * cpus, resume=False)
    t_extract = time.perf_counter() - t0
    import pyarrow.parquet as pq_mod

    bucket_rows = []
    docs_root = os.path.join(work, "extract", "docs")
    for d in sorted(os.listdir(docs_root)):
        n = sum(pq_mod.ParquetFile(os.path.join(docs_root, d, f))
                .metadata.num_rows
                for f in os.listdir(os.path.join(docs_root, d)))
        bucket_rows.append(n)
    results["extract"] = {
        "wall_s": round(t_extract, 2), "ok": res["ok_count"],
        "bucket_rows_med": int(statistics.median(bucket_rows)),
        "bucket_rows_max": max(bucket_rows),
        "bucket_balance": round(
            max(bucket_rows) / statistics.median(bucket_rows), 3),
    }

    # --- doc view for host_template ---
    def docs_view(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["url", "text"]))
        return (df.with_columns(pl.col("url").hash(7)
                                .reinterpret(signed=True).alias("doc_id"))
                .select(["doc_id", "url", "text"]).to_arrow())

    def docs():
        return ray.data.read_parquet(corpus, columns=["url", "text"]) \
            .map_batches(docs_view, batch_format="pyarrow")

    def ht_checksum(ds):
        n, lines = 0, 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
            lines += pl.from_arrow(b.select(["n_lines_kept"]))[
                "n_lines_kept"].sum() or 0
        return {"docs": n, "lines_kept": int(lines)}

    profiled("host_template_plain",
             lambda: ht_checksum(host_template_lines(
                 docs(), num_partitions=2 * cpus, strategy="partition")))
    profiled("host_template_salted",
             lambda: ht_checksum(host_template_lines(
                 docs(), num_partitions=2 * cpus, strategy="salted")))
    # round-5 auto arm: default strategy="auto" must pick the right
    # plan from the exploded row count (salted at 960k, partition at
    # 24k) and stay row-identical either way
    profiled("host_template_auto",
             lambda: ht_checksum(host_template_lines(
                 docs(), num_partitions=2 * cpus)))
    assert (results["host_template_plain"]["checksum"]
            == results["host_template_salted"]["checksum"]
            == results["host_template_auto"]["checksum"]), (
        results["host_template_plain"]["checksum"],
        results["host_template_salted"]["checksum"],
        results["host_template_auto"]["checksum"])

    # --- frontier over the skewed url set, priority from url hash ---
    def frontier_view(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["url"]))
        return (df.with_columns((pl.col("url").hash(3) % 100)
                                .cast(pl.Int64).alias("priority"))
                .to_arrow())

    def frontier_in():
        return ray.data.read_parquet(corpus, columns=["url"]) \
            .map_batches(frontier_view, batch_format="pyarrow")

    def fr_checksum(ds):
        n, csum, cmax = 0, 0, 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += b.num_rows
            s = pl.from_arrow(b.select(["cycle"]))["cycle"]
            csum += s.sum() or 0
            cmax = max(cmax, s.max() or 0)
        return {"urls": n, "cycle_sum": int(csum), "cycle_max": int(cmax)}

    profiled("frontier_plain",
             lambda: fr_checksum(frontier_schedule(
                 frontier_in(), k_per_cycle=8, num_partitions=2 * cpus,
                 hot_host_threshold=None)))
    profiled("frontier_split",
             lambda: fr_checksum(frontier_schedule(
                 frontier_in(), k_per_cycle=8, num_partitions=2 * cpus,
                 hot_host_threshold=100_000, split_target=25_000)))
    # round-5 auto arm: hot_host_threshold="auto" derives the
    # threshold from the frontier count (range-split on at 960k,
    # plain single-exchange plan at 24k), rows identical either way
    profiled("frontier_auto",
             lambda: fr_checksum(frontier_schedule(
                 frontier_in(), k_per_cycle=8, num_partitions=2 * cpus,
                 split_target=25_000)))
    assert (results["frontier_plain"]["checksum"]
            == results["frontier_split"]["checksum"]
            == results["frontier_auto"]["checksum"]), (
        results["frontier_plain"]["checksum"],
        results["frontier_split"]["checksum"],
        results["frontier_auto"]["checksum"])

    # --- crawl_cycle composite (snapshot2 = text splice on changed rows) ---
    from stress_incremental import _mutate_shard  # noqa: E402  (reuse spec)
    import multiprocessing as mp

    snap2 = f"/tmp/dtr_stress_skew2_{n_pages}"
    if not os.path.exists(os.path.join(snap2, "_DONE")):
        os.makedirs(snap2, exist_ok=True)
        files = sorted(f for f in os.listdir(corpus)
                       if f.endswith(".parquet"))
        with mp.Pool(16) as pool:
            pool.map(_mutate_shard,
                     [(os.path.join(corpus, f), os.path.join(snap2, f))
                      for f in files])
        open(os.path.join(snap2, "_DONE"), "w").write("ok")

    from docling_translate_ray.pipelines.crawl_cycle import crawl_cycle

    robots = ray.data.from_arrow(pa.table({
        "host": pa.array([MEGA], pa.string()),
        "robots_txt": pa.array(["User-agent: *\nDisallow: /p13/\n"],
                               pa.string()),
    }))

    def cc(threshold):
        return lambda: fr_checksum(crawl_cycle(
            ray.data.read_parquet(corpus, columns=["url", "html"]),
            ray.data.read_parquet(snap2, columns=["url", "html"]),
            robots, k_per_cycle=8, content_column="html", algo="xx64",
            num_partitions=2 * cpus, hot_host_threshold=threshold,
            split_target=25_000))

    profiled("crawl_cycle_plain", cc(None))
    profiled("crawl_cycle_split", cc(100_000))
    assert (results["crawl_cycle_plain"]["checksum"]
            == results["crawl_cycle_split"]["checksum"]), (
        results["crawl_cycle_plain"]["checksum"],
        results["crawl_cycle_split"]["checksum"])

    mon.stop()
    mon.join()
    results["peak_plasma_mib"] = round(mon.peak_mib, 1)
    print(json.dumps(results))
    ray.shutdown()
    shutil.rmtree(wall_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
