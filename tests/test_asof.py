"""As-of join unit tests: backward semantics, equal-timestamp inclusion,
no-match nulls, key co-partitioning."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

import ray.data

from docling_translate_ray.functions.asof import asof_join


def _ts(m):
    return dt.datetime(2026, 1, 1, 0, m)


def test_asof_backward_semantics():
    left = pa.table(
        {
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "t": pa.array([_ts(10), _ts(5), _ts(7), _ts(1)], pa.timestamp("us")),
            "id": pa.array([100, 101, 102, 103], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "t": pa.array([_ts(4), _ts(5), _ts(9), _ts(8)], pa.timestamp("us")),
        }
    )
    out = asof_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
        by="k", on="t", left_cols=["k", "t", "id"],
        right_value_col="t", out_name="matched",
        num_partitions=4,
    )
    rows = {r["id"]: r["matched"] for r in out.take_all()}
    assert rows[100] == _ts(9)   # latest ≤ 0:10
    assert rows[101] == _ts(5)   # equal timestamp included (backward)
    assert rows[102] is None     # right row at 0:08 is AFTER left 0:07
    assert rows[103] is None     # key 3 has no right rows at all
    assert len(rows) == 4        # one output row per left row


def test_range_join_count_boundaries():
    from docling_translate_ray.functions.asof import range_join_count

    # window is [t-10m, t): the view AT the purchase minute is excluded,
    # the one exactly 10 minutes earlier is included
    left = pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "t": pa.array([_ts(20), _ts(40), _ts(20), _ts(5)], pa.timestamp("us")),
        "id": pa.array([100, 101, 102, 103], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "t": pa.array(
            [_ts(10), _ts(15), _ts(20), _ts(39), _ts(19), _ts(31)],
            pa.timestamp("us"),
        ),
    })
    out = range_join_count(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
        by="k", left_on="t", right_on="t",
        lower=dt.timedelta(minutes=-10), upper=dt.timedelta(0),
        left_cols=["k", "t", "id"], out_name="n", num_partitions=4,
    )
    rows = {r["id"]: r["n"] for r in out.take_all()}
    assert rows == {
        100: 2,  # 10:00 (inclusive lower bound) + 15:00; 20:00 excluded
        101: 1,  # only 39:00; k=2's rows invisible to k=1
        102: 1,  # k=2's 19:00 in [10:00, 20:00); 31:00 outside
        103: 0,  # no right rows for k=3 at all → kept with 0
    }
