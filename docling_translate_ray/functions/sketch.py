"""Mergeable sketches — approximate aggregates whose partial states
combine associatively/commutatively/idempotently, so block layout,
partitioning and merge order can never change the answer (the property
that makes a sketch safe in a distributed reduce).

:func:`approx_distinct` — HyperLogLog distinct count: each batch hashes
its values (polars xxhash, process-stable) and folds them into a
``2^precision``-register array (max leading-zero rank per register); one
tiny register row per batch reaches the driver, which elementwise-maxes
``n_batches`` arrays and applies the standard HLL estimator with the
small-range linear-counting correction.  Relative error ≈ 1.04/√m
(~1.6 % at precision 12).  The shuffle/driver payload is ``2^p`` bytes
per batch — independent of cardinality and corpus size.

The estimate cannot be SQL-oracled exactly (DuckDB's
``approx_count_distinct`` is a different sketch), so accuracy is pinned
in pytest against exact distinct counts at several cardinalities.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# precision bounds: suffix = 64 - p bits must fit float64's exact-integer
# range (<= 52 bits) for the vectorized frexp bit-length trick
_MIN_P, _MAX_P = 12, 18


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_register_batch(values, precision: int) -> np.ndarray:
    """Fold a polars Series into a fresh 2^p uint8 register array."""
    import polars as pl

    m = 1 << precision
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = pl.DataFrame({"v": values}).hash_rows(seed=7).to_numpy()
    idx = (h >> np.uint64(64 - precision)).astype(np.int64)
    suffix = (h & np.uint64((1 << (64 - precision)) - 1)).astype(np.float64)
    bit_length = np.where(suffix > 0, np.frexp(suffix)[1], 0)
    rank = ((64 - precision) - bit_length + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting (small range)
    return int(round(est))


def approx_distinct(ds, column: str, precision: int = 12) -> pa.Table:
    """HLL estimate of ``count(distinct column)`` over a Dataset.

    Returns a 1-row Table (precision:int64, n_distinct_est:int64).
    """
    import polars as pl

    from docling_translate_ray.util import collect_to_table

    if not (_MIN_P <= precision <= _MAX_P):
        raise ValueError(
            f"precision must be in [{_MIN_P}, {_MAX_P}] (got {precision})"
        )

    def sketch_batch(batch: pa.Table) -> pa.Table:
        regs = hll_register_batch(pl.from_arrow(batch[column]), precision)
        return pa.table({"_regs": pa.array([regs.tobytes()], pa.binary())})

    partials = collect_to_table(
        ds.map_batches(sketch_batch, batch_format="pyarrow"),
        empty_schema=pa.schema([("_regs", pa.binary())]),
    )
    m = 1 << precision
    regs = np.zeros(m, dtype=np.uint8)
    for buf in partials["_regs"].to_pylist():
        regs = np.maximum(regs, np.frombuffer(buf, dtype=np.uint8))
    return pa.table(
        {
            "precision": pa.array([precision], pa.int64()),
            "n_distinct_est": pa.array([hll_estimate(regs)], pa.int64()),
        }
    )
