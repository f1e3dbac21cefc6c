"""Crawl-cycle planner — the composite CRAWL pipeline (the operational
loop a Common-Crawl-style fetcher runs between snapshots), built from
this engine's crawl operators:

    new snapshot → robots gate        (functions/crawl.robots_filter)
                 → change detection   (functions/crawl.recrawl_priority
                                       over the old+new version history)
                 → adaptive frontier  (functions/crawl.frontier_schedule:
                                       priority = change rate, politeness
                                       k per host per cycle)
                 → next-cycle fetch plan (url, host, priority, cycle)

Pages that changed between the last two crawls get refetched in earlier
cycles; robots-excluded urls never enter the plan; unchanged and
newly-seen pages fill the later cycles.  Like ``pipelines/mixture`` /
``pipelines/curate``, the whole composite is ONE DuckDB oracle — the
driver hash-checks the end-to-end plan, not just its stages.

Scale shape: every inter-stage edge carries narrow rows only — (url,
host) out of the robots gate, (url, ts, 16-byte hash) into the change
counter, (url, priority) into the scheduler; page text never crosses an
exchange.  The robots rule table broadcasts (hosts ≪ pages); the change
join is a distributed semi/inner ``partition_join`` on the url.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def crawl_cycle(old_ds, new_ds, robots_ds, k_per_cycle: int = 4,
                url_column: str = "url", content_column: str = "text",
                num_partitions: int = 32, agent: str = "*",
                algo: str = "md5", hot_host_threshold: int | None | str = "auto",
                split_target: int = 100_000):
    """Next-cycle fetch plan ``(url, host, priority, cycle)`` from the
    two most recent snapshots (``(url, text)`` each) and the per-host
    ``(host, robots_txt)`` table.  ``priority`` is the url's
    consecutive-change rate (0 for unchanged or newly-seen pages).
    ``algo`` is the change-fingerprint: ``"md5"`` for oracle lockstep,
    ``"xx64"`` (vectorized) at corpus scale — equality is all change
    counting needs.  ``hot_host_threshold`` / ``split_target`` pass
    through to :func:`..functions.crawl.frontier_schedule`'s range-split
    skew path (megadomain frontiers; default "auto" derives the
    threshold from the frontier's own row count)."""
    from docling_translate_ray.functions.crawl import (
        _change_rates,
        frontier_schedule,
        history_fp_rows,
        robots_filter,
    )
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    # kept rows tagged kind=1; version-fingerprint rows tagged kind=0 —
    # ONE url-keyed exchange computes change rates AND the kept-join in
    # the same partition pass (the exchange-collapse pattern: partition
    # by the join/count key alone and every downstream relational step
    # is partition-local).  Total exchanges: url here + host inside
    # frontier_schedule = 2.
    kept = robots_filter(new_ds, robots_ds, url_column=url_column,
                         agent=agent)  # (url, host) — narrow

    def kept_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "url": batch["url"],
            "_ts": pa.array([0] * n, pa.int64()),
            "_fp": batch["host"].combine_chunks().cast(pa.string()),
            "kind": pa.array(np.full(n, 1, dtype=np.int8), pa.int8()),
        })

    def hist_rows(ts: int):
        fp_rows = history_fp_rows(url_column, "_tsc", content_column, algo)

        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            out = fp_rows(batch.append_column(
                "_tsc", pa.array([ts] * n, pa.int64())))
            return out.append_column(
                "kind", pa.array(np.zeros(n, dtype=np.int8), pa.int8()))

        return fn

    tagged = (
        old_ds.map_batches(hist_rows(1), batch_format="pyarrow")
        .union(new_ds.map_batches(hist_rows(2), batch_format="pyarrow"))
        .union(kept.map_batches(kept_rows, batch_format="pyarrow"))
    )

    out_mid = pa.schema([("url", pa.string()), ("host", pa.string()),
                         ("priority", pa.int64())])

    def rate_and_join(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part)
        k = (df.filter(pl.col("kind") == 1)
             .select("url", pl.col("_fp").alias("host")))
        if k.height == 0:
            return out_mid.empty_table()
        rates = _change_rates(
            df.filter(pl.col("kind") == 0).select("url", "_ts", "_fp"))
        return (
            k.join(rates.select("url", "change_rate_pct"), on="url",
                   how="left")
            .select("url", "host",
                    pl.col("change_rate_pct").fill_null(0)
                    .alias("priority"))
            .to_arrow().cast(out_mid)
        )

    cand = hash_partition_apply(tagged, ["url"], rate_and_join,
                                num_partitions=num_partitions)
    return frontier_schedule(cand, k_per_cycle=k_per_cycle,
                             url_column=url_column,
                             priority_column="priority",
                             num_partitions=num_partitions,
                             hot_host_threshold=hot_host_threshold,
                             split_target=split_target)
