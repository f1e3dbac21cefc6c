"""Text-stats kernels without a SQL analog: property pins (the
oracle-backed signals are gated via the driver contract instead)."""

from __future__ import annotations

import pyarrow as pa

def test_compression_ratio_orders_text_classes():
    """Property pin for the zlib signal (no SQL oracle exists): repeated
    boilerplate compresses far below natural-ish prose, which compresses
    below incompressible noise; tiny docs and empties never get flagged."""
    import random

    from docling_translate_ray.functions.text_stats import (
        compression_ratio_batch)

    rng = random.Random(4)
    prose = " ".join(f"w{rng.randrange(50_000)}" for _ in range(400))
    noise = "".join(chr(rng.randrange(0x21, 0x7f)) for _ in range(2000))
    boiler = "click here to subscribe now " * 100
    batch = pa.table({"text": pa.array(
        [boiler, prose, noise, "tiny", "", None], pa.string())})
    out = compression_ratio_batch(batch)
    r = out["compress_ratio_bp"].to_pylist()
    ok = out["compress_ok"].to_pylist()
    nb = out["n_bytes"].to_pylist()
    assert r[0] < r[1] < r[2]          # boiler << prose << noise
    assert r[0] < 1000                 # repeated text is <10% of raw
    assert ok[0] is False              # ...and flagged
    assert ok[1] is True and ok[2] is True
    assert ok[3] is True and ok[4] is True and ok[5] is True  # short/empty
    assert nb[4] == 0 and nb[5] == 0 and r[4] == 10_000
    # idempotent re-application (column replace path)
    again = compression_ratio_batch(out)
    assert again["compress_ratio_bp"].to_pylist() == r
