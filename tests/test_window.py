"""Watermark-window operator tests: planted out-of-order arrivals."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

import ray.data

from docling_translate_ray.stages.window import windowed_counts_with_watermark


def _t(h, m):
    return dt.datetime(2026, 1, 1, h, m)


def _run(rows, lateness_min=10):
    tbl = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "arrival": pa.array(list(range(len(rows))), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    out = windowed_counts_with_watermark(
        ray.data.from_arrow(tbl).repartition(3),
        key="k", ts_col="ts", arrival_col="arrival",
        window="1h", lateness=dt.timedelta(minutes=lateness_min),
        num_partitions=4,
    )
    res = {}
    for r in out.take_all():
        res[(r["k"], r["window_start"])] = r["n_events"]
    return res


def test_watermark_counts_late_events():
    rows = [
        ("a", _t(10, 0)),   # watermark None → on time, window 10:00
        ("a", _t(11, 0)),   # on time, window 11:00
        ("a", _t(10, 5)),   # wm = 11:00-10m = 10:50 → 10:05 < 10:50 → LATE
        ("a", _t(10, 55)),  # 10:55 ≥ 10:50 → on time (within lateness), window 10:00
        ("a", _t(11, 30)),  # on time, window 11:00
    ]
    res = _run(rows)
    assert res[("a", _t(10, 0))] == 2   # 10:00 + 10:55
    assert res[("a", _t(11, 0))] == 2   # 11:00 + 11:30
    assert res[("a", None)] == 1        # the late 10:05


def test_watermark_is_per_key():
    rows = [
        ("a", _t(12, 0)),
        ("b", _t(9, 0)),    # b's own watermark unaffected by a's 12:00
        ("b", _t(9, 30)),
        ("a", _t(11, 0)),   # late vs a's wm 11:50
    ]
    res = _run(rows)
    assert res[("b", _t(9, 0))] == 2
    assert res[("a", _t(12, 0))] == 1
    assert res[("a", None)] == 1
    assert ("b", None) not in res


def test_ordered_stream_has_no_lates():
    rows = [("x", _t(9, i)) for i in range(30)]
    res = _run(rows)
    assert ("x", None) not in res
    assert res[("x", _t(9, 0))] == 30
