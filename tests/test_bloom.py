"""Bloom blocklist filter: kernel properties + exactness of the two-phase plan."""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray.data

from docling_translate_ray.functions.bloom import (
    blocklist_filter,
    bloom_fold_batch,
    bloom_probe_mask,
    build_bloom,
)

M, K = 1 << 14, 4


def test_bloom_no_false_negatives_and_bounded_fp():
    members = pl.Series([f"host{i}.example" for i in range(500)])
    others = pl.Series([f"other{i}.example" for i in range(5000)])
    words = bloom_fold_batch(members, M, K)
    assert bloom_probe_mask(members, words, M, K).all()  # zero false negatives
    fp = bloom_probe_mask(others, words, M, K).mean()
    # m/n = 32 bits/key, k=4 → theoretical fp ~0.24%; allow generous slack
    assert fp < 0.02


def test_bloom_merge_is_union():
    a = pl.Series(["x", "y"])
    b = pl.Series(["z"])
    merged = bloom_fold_batch(a, M, K) | bloom_fold_batch(b, M, K)
    both = bloom_fold_batch(pl.Series(["x", "y", "z"]), M, K)
    assert np.array_equal(merged, both)


def test_blocklist_filter_exact_despite_false_positives():
    # tiny filter (high fp rate) — the confirm join must still make the
    # output exactly equal to the plain anti-join
    n = 2000
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "key": pa.array([f"k{i % 700}" for i in range(n)], pa.string()),
    })
    block = pa.table({"key": pa.array([f"k{j}" for j in range(0, 700, 7)],
                                      pa.string())})
    out = blocklist_filter(
        ray.data.from_arrow(docs).repartition(4),
        ray.data.from_arrow(block),
        column="key", m_bits=256, k=2, num_partitions=4,
    )
    got = sorted(r["doc_id"] for r in out.take_all())
    blocked = {f"k{j}" for j in range(0, 700, 7)}
    want = sorted(i for i in range(n) if f"k{i % 700}" not in blocked)
    assert got == want
    # sanity: the tiny bitset really does fire false positives, so the
    # confirm path was exercised
    words = build_bloom(ray.data.from_arrow(block), "key", 256, 2)
    nonmembers = pl.Series([f"k{j}" for j in range(700) if f"k{j}" not in blocked])
    assert bloom_probe_mask(nonmembers, words, 256, 2).any()
