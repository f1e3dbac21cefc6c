"""Event-time tumbling windows with watermark/late-data accounting — the
"streaming window" custom operator (SURVEY.md §2.6 O5; no reference
analog).  Bounded-data formulation that keeps streaming semantics exact
and deterministic:

* **arrival order** is an explicit column (e.g. ingest sequence id) — the
  stream replayed as data;
* the **watermark** after n arrivals is ``max(event_time[:n]) - lateness``;
* an event is **late** iff its event time is below the watermark at its
  own arrival; late events are excluded from their window and counted
  separately (the drop-and-count policy).

Distribution: rows are hash-co-partitioned by the window key (ONE
shuffle); each partition replays its keys' streams in one vectorized
polars pass (sort by arrival → cumulative max → shift).  Partitioning
assumption: watermarks are per-key (the common keyed-stream model); a
global watermark would need a single ordered pass.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from docling_translate_ray.stages.shuffle import hash_partition_apply


def windowed_counts_with_watermark(
    ds,
    key: str,
    ts_col: str,
    arrival_col: str,
    window: str = "1h",
    lateness: _dt.timedelta = _dt.timedelta(minutes=10),
    num_partitions: int = 32,
):
    """Per (key, window) on-time event counts + one late-bucket row per key.

    Output columns: ``(key, window_start:timestamp|null, n_events)`` —
    the ``window_start IS NULL`` row carries the key's late-event count
    (omitted when zero).
    """

    def block(part: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(part).sort([key, arrival_col])
        lat = pl.duration(seconds=int(lateness.total_seconds()))
        df = df.with_columns(
            (pl.col(ts_col).cum_max().shift(1).over(key) - lat).alias("_wm")
        ).with_columns(
            (pl.col(ts_col) < pl.col("_wm")).fill_null(False).alias("_late")
        )
        on_time = (
            df.filter(~pl.col("_late"))
            .with_columns(pl.col(ts_col).dt.truncate(window).alias("window_start"))
            .group_by([key, "window_start"])
            .agg(pl.len().cast(pl.Int64).alias("n_events"))
        )
        late = (
            df.filter(pl.col("_late"))
            .group_by(key)
            .agg(pl.len().cast(pl.Int64).alias("n_events"))
            .with_columns(pl.lit(None, dtype=on_time["window_start"].dtype)
                          .alias("window_start"))
            .select([key, "window_start", "n_events"])
        )
        return pl.concat([on_time, late]).to_arrow()

    return hash_partition_apply(ds, [key], block, num_partitions=num_partitions)


def hopping_window_counts(
    ds,
    key: str,
    ts_col: str,
    size_minutes: int = 60,
    hop_minutes: int = 15,
    num_partitions: int = 32,
):
    """Hopping (sliding) window counts per key — the overlapping-window
    companion to the tumbling/watermark operators (SURVEY.md §2.6 O5).
    An event at time t belongs to every window whose hop-aligned start s
    satisfies ``s <= t < s + size`` (``size/hop`` windows per event).

    Scale shape: the explode is a constant fan-out of ``size/hop`` small
    ``(key, window_start)`` rows per event, built fully vectorized in
    polars (one truncate + k constant duration-shifts, no per-row work);
    ``grouped_sum``'s per-batch combiner then collapses the fan-out to one
    partial row per (batch, key, window) BEFORE the shuffle, so the
    exchange volume is bounded by distinct windows per batch — not by
    events × fan-out.

    Output: ``(key, window_start:timestamp, n_events)``.
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import grouped_sum

    if size_minutes % hop_minutes:
        raise ValueError("size_minutes must be a multiple of hop_minutes")
    n_windows = size_minutes // hop_minutes

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            pl.col(ts_col).dt.truncate(f"{hop_minutes}m").alias("_b")
        )
        parts = [
            df.select(
                pl.col(key),
                (pl.col("_b") - pl.duration(minutes=k * hop_minutes))
                .alias("window_start"),
            )
            for k in range(n_windows)
        ]
        return pl.concat(parts).with_columns(
            pl.lit(1, dtype=pl.Int64).alias("_n")
        ).to_arrow()

    return grouped_sum(
        ds.select_columns([key, ts_col]).map_batches(
            explode, batch_format="pyarrow"
        ),
        [key, "window_start"],
        [pl.col("_n").sum().alias("_n")],
        {"n_events": "_n"},
        num_partitions=num_partitions,
    )
