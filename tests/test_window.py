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


def test_hopping_windows_fanout_and_counts():
    from docling_translate_ray.stages.window import hopping_window_counts

    # one event at 10:17 with size=60m hop=15m belongs to windows starting
    # 09:30, 09:45, 10:00, 10:15 (each covers [s, s+60m))
    tbl = pa.table({
        "k": pa.array(["a", "a", "b"], pa.string()),
        "ts": pa.array([_t(10, 17), _t(10, 40), _t(10, 17)], pa.timestamp("us")),
    })
    out = hopping_window_counts(
        ray.data.from_arrow(tbl).repartition(2),
        key="k", ts_col="ts", size_minutes=60, hop_minutes=15,
        num_partitions=4,
    )
    res = {(r["k"], r["window_start"]): r["n_events"] for r in out.take_all()}
    assert res[("a", _t(9, 30))] == 1             # only 10:17 (ends 10:30)
    assert res[("a", _t(9, 45))] == 2             # [09:45,10:45) covers both
    assert res[("a", _t(10, 0))] == 2
    assert res[("a", _t(10, 15))] == 2
    assert res[("a", _t(10, 30))] == 1            # only the 10:40 event
    assert res[("b", _t(10, 15))] == 1
    assert ("b", _t(10, 30)) not in res
    # every event lands in exactly size/hop windows
    assert sum(v for (k, _), v in res.items() if k == "a") == 2 * 4
    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple"):
        hopping_window_counts(ray.data.from_arrow(tbl), key="k", ts_col="ts",
                              size_minutes=50, hop_minutes=15)
