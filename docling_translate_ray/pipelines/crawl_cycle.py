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

import pyarrow as pa


def crawl_cycle(old_ds, new_ds, robots_ds, k_per_cycle: int = 4,
                url_column: str = "url", content_column: str = "text",
                num_partitions: int = 32, agent: str = "*",
                algo: str = "md5"):
    """Next-cycle fetch plan ``(url, host, priority, cycle)`` from the
    two most recent snapshots (``(url, text)`` each) and the per-host
    ``(host, robots_txt)`` table.  ``priority`` is the url's
    consecutive-change rate (0 for unchanged or newly-seen pages).
    ``algo`` is the change-fingerprint: ``"md5"`` for oracle lockstep,
    ``"xx64"`` (vectorized) at corpus scale — equality is all change
    counting needs."""
    from docling_translate_ray.functions.crawl import (
        frontier_schedule,
        recrawl_priority,
        robots_filter,
    )
    from docling_translate_ray.stages.shuffle import partition_join

    kept = robots_filter(new_ds, robots_ds, url_column=url_column,
                         agent=agent)  # (url, host) — narrow

    def tagged(ts: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                url_column: batch[url_column],
                "warc_ts": pa.array([ts] * batch.num_rows, pa.int64()),
                content_column: batch[content_column],
            })

        return fn

    history = old_ds.map_batches(tagged(1), batch_format="pyarrow").union(
        new_ds.map_batches(tagged(2), batch_format="pyarrow"))
    rates = recrawl_priority(
        history, url_column=url_column, ts_column="warc_ts",
        content_column=content_column, num_partitions=num_partitions,
        algo=algo,
    ).map_batches(
        lambda b: pa.table({url_column: b["url"],
                            "priority": b["change_rate_pct"]}),
        batch_format="pyarrow",
    )

    # keep only robots-allowed urls of the NEW snapshot (urls seen only
    # in the old snapshot drop out of the inner join — they are gone)
    cand = partition_join(rates, kept, on=[url_column], how="inner",
                          num_partitions=num_partitions).map_batches(
        lambda b: pa.table({url_column: b[url_column],
                            "priority": b["priority"]}),
        batch_format="pyarrow",
    )
    return frontier_schedule(cand, k_per_cycle=k_per_cycle,
                             url_column=url_column,
                             priority_column="priority",
                             num_partitions=num_partitions)
