"""Corpus-scale stress of the CDX URL index (functions/cdx.py):
synthesize N crawl-variant URLs over a realistic host population,
build the range-partitioned SURT index, run prefix lookups (recording
the partition-prune factor: dirs read / dirs total), append a 5%
crawl increment, re-lookup, compact, and re-lookup again.

URLs are ~100-byte rows, so the default N is 5M (a URL index holds
an order of magnitude more rows than a page corpus at equal bytes).

Usage: python tools/stress_cdx.py [n_urls] [num_cpus]
Owns its Ray session. Results go to stdout as one JSON line.
"""

from __future__ import annotations

import bisect
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from stress_curate import PlasmaPeak  # noqa: E402

# Zipf-ish host population: id % 97 picks a TLD bucket, id % 9973 a
# host ordinal — ~10k distinct hosts, the low ordinals hit by every
# modular class (mild natural skew without a dedicated hot key).
_TLDS = ["com", "org", "net", "io", "dev", "co.uk", "de", "jp"]


def _url_batch_fn():
    import polars as pl

    def make(batch):
        df = pl.DataFrame(
            {"doc_id": pl.from_arrow(batch["id"]).cast(pl.Int64)})
        tld = pl.col("doc_id") % 97 % len(_TLDS)
        tld_s = tld.replace_strict(
            {i: t for i, t in enumerate(_TLDS)}, return_dtype=pl.String)
        url = (
            pl.lit("HTTPS://")
            + pl.when(pl.col("doc_id") % 11 == 0).then(pl.lit("user@"))
            .otherwise(pl.lit(""))
            + pl.when(pl.col("doc_id") % 2 == 0).then(pl.lit("WWW."))
            .otherwise(pl.lit(""))
            + pl.lit("Site-") + (pl.col("doc_id") % 9973).cast(pl.String)
            + pl.lit(".Example.") + tld_s
            + pl.when(pl.col("doc_id") % 5 == 0).then(pl.lit(":443"))
            .otherwise(pl.lit(""))
            + pl.lit("/Sec") + (pl.col("doc_id") % 7).cast(pl.String)
            + pl.lit("/Page/") + pl.col("doc_id").cast(pl.String)
            + pl.when(pl.col("doc_id") % 3 == 0)
            .then(pl.lit("?q=") + pl.col("doc_id").cast(pl.String))
            .otherwise(pl.lit(""))
            + pl.when(pl.col("doc_id") % 4 == 0).then(pl.lit("#frag"))
            .otherwise(pl.lit(""))
        )
        import pyarrow as pa

        return (df.select(pl.col("doc_id").cast(pl.Int64),
                          url.alias("url"))
                .to_arrow()
                .cast(pa.schema([("doc_id", pa.int64()),
                                 ("url", pa.string())])))

    return make


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _lookup_timed(idx: str, prefix: str) -> tuple[float, int]:
    from docling_translate_ray.functions.cdx import url_index_lookup

    t = time.perf_counter()
    n = url_index_lookup(idx, prefix).count()
    return time.perf_counter() - t, n


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
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

    import ray.data

    from docling_translate_ray.functions.cdx import (_prefix_upper,
                                                     _read_meta,
                                                     build_url_index,
                                                     url_index_compact,
                                                     url_index_insert)

    idx = f"/tmp/dtr_stress_cdx_{n_urls}"
    shutil.rmtree(idx, ignore_errors=True)
    n_parts = 64

    mon = PlasmaPeak()
    mon.start()

    mk = _url_batch_fn()

    def urls(n: int, start: int = 0):
        import pyarrow as pa
        import pyarrow.compute as pc

        def shift(b: pa.Table) -> pa.Table:
            ids = pc.add(pc.cast(b["id"], pa.int64()), start)
            return mk(pa.table({"id": ids}))

        return ray.data.range(n).map_batches(shift, batch_format="pyarrow")

    t0 = time.perf_counter()
    build_url_index(urls(n_urls), idx, num_partitions=n_parts)
    t_build = time.perf_counter() - t0

    boundaries, _, _ = _read_meta(idx)
    prefix = "com,example,site-777)"
    lo = bisect.bisect_right(boundaries, prefix)
    hi = bisect.bisect_right(boundaries, _prefix_upper(prefix))
    dirs_read = hi - lo + 1
    dirs_total = len(boundaries) + 1

    t_lookup, n_hit = _lookup_timed(idx, prefix)
    t_lookup_host, n_host = _lookup_timed(idx, "com,example,site-12)")
    # wide range scan: every com host — multi-partition read path
    t_scan, n_scan = _lookup_timed(idx, "com,example,")
    scan_lo = bisect.bisect_right(boundaries, "com,example,")
    scan_hi = bisect.bisect_right(boundaries, _prefix_upper("com,example,"))
    scan_dirs = scan_hi - scan_lo + 1

    n_inc = n_urls // 20
    t1 = time.perf_counter()
    url_index_insert(urls(n_inc, start=n_urls), idx)
    t_insert = time.perf_counter() - t1

    t_lookup_gen2, n_hit2 = _lookup_timed(idx, prefix)
    assert n_hit2 >= n_hit, (n_hit2, n_hit)

    t2 = time.perf_counter()
    stats = url_index_compact(idx)
    t_compact = time.perf_counter() - t2

    t_lookup_compacted, n_hit3 = _lookup_timed(idx, prefix)
    assert n_hit3 == n_hit2, (n_hit3, n_hit2)

    mon.stop()
    mon.join()

    print(json.dumps({
        "n_urls": n_urls, "num_cpus": cpus, "num_partitions": n_parts,
        "build_sec": round(t_build, 1),
        "build_urls_per_sec": round(n_urls / t_build),
        "index_mib": round(_dir_bytes(idx) / 2**20, 1),
        "lookup_sec": round(t_lookup, 2),
        "lookup_rows": n_hit,
        "lookup_host12_sec": round(t_lookup_host, 2),
        "lookup_host12_rows": n_host,
        "partitions_read": dirs_read,
        "partitions_total": dirs_total,
        "prune_factor": round(dirs_total / dirs_read, 1),
        "range_scan_sec": round(t_scan, 2),
        "range_scan_rows": n_scan,
        "range_scan_partitions": scan_dirs,
        "insert_rows": n_inc,
        "insert_sec": round(t_insert, 1),
        "lookup_gen2_sec": round(t_lookup_gen2, 2),
        "lookup_gen2_rows": n_hit2,
        "compact_sec": round(t_compact, 1),
        "files_before": stats["files_before"],
        "files_after": stats["files_after"],
        "lookup_compacted_sec": round(t_lookup_compacted, 2),
        "peak_object_store_mib": round(mon.peak_mib, 1),
    }))


if __name__ == "__main__":
    main()
