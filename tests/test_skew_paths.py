"""Skew-remedy path parity (VERDICT r03 item 7): the salted
host_template_lines plan and the range-split frontier_schedule plan must
be ROW-IDENTICAL to their default single-key plans — skew handling is a
physical-plan choice, never a semantics change."""

from __future__ import annotations

import pyarrow as pa

from docling_translate_ray.functions.crawl import (frontier_schedule,
                                                   host_template_lines)


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


def _sorted_rows(ds):
    return sorted(tuple(r[k] for k in sorted(r)) for r in ds.take_all())


def _skewed_docs(n_mega: int = 60, n_cold_hosts: int = 10) -> pa.Table:
    """One mega host with shared banner/footer lines in every doc, many
    cold hosts where the same lines are rare."""
    doc_ids, urls, texts = [], [], []
    i = 0
    for d in range(n_mega):
        doc_ids.append(i)
        urls.append(f"https://mega.example/p/{d}")
        texts.append(f"NAV mega home\nbody {d} alpha\nbody {d} beta"
                     f"\nCopyright mega footer")
        i += 1
    for h in range(n_cold_hosts):
        for d in range(2):  # below min_docs → nothing is template here
            doc_ids.append(i)
            urls.append(f"https://cold{h}.example/p/{d}")
            texts.append(f"NAV mega home\ncold body {h} {d}"
                         f"\nCopyright mega footer")
            i += 1
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "url": pa.array(urls, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


def test_host_template_salted_parity_broadcast():
    tbl = _skewed_docs()
    plain = _sorted_rows(host_template_lines(_ds(tbl), min_docs=3,
                                             num_partitions=8))
    salted = _sorted_rows(host_template_lines(
        _ds(tbl), min_docs=3, num_partitions=8, strategy="salted",
        salt_buckets=4))
    assert salted == plain
    # mega docs lost both template lines, cold docs kept theirs
    kept = {r[1]: r[3] for r in plain}  # (doc, host, n_kept, text) sorted keys
    assert any(h == "mega.example" for h in kept)


def test_host_template_salted_parity_exchange_fallback():
    tbl = _skewed_docs()
    plain = _sorted_rows(host_template_lines(_ds(tbl), min_docs=3,
                                             num_partitions=8))
    # max_broadcast=0 forces id_filter_join's partition-join fallback
    salted = _sorted_rows(host_template_lines(
        _ds(tbl), min_docs=3, num_partitions=8, strategy="salted",
        salt_buckets=4, max_broadcast=0))
    assert salted == plain


def test_host_template_salted_omits_all_template_docs():
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "url": pa.array(["https://a.example/x", "https://a.example/y"],
                        pa.string()),
        "text": pa.array(["same\nlines", "same\nlines"], pa.string()),
    })
    assert host_template_lines(_ds(tbl), min_docs=2,
                               strategy="salted").take_all() == []


def test_host_template_rejects_unknown_strategy():
    import pytest

    with pytest.raises(ValueError):
        host_template_lines(_ds(_skewed_docs()), strategy="bogus")


def _frontier_tbl(n_mega: int = 500, n_cold: int = 40) -> pa.Table:
    urls, prios = [], []
    for d in range(n_mega):
        urls.append(f"https://mega.example/u{d:05d}")
        prios.append((d * 7919) % 97 - 30)  # includes NEGATIVE priorities
    for h in range(n_cold):
        for d in range(3):
            urls.append(f"https://cold{h}.example/u{d}")
            prios.append((h + d) % 11)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "priority": pa.array(prios, pa.int64())})


def test_frontier_range_split_parity():
    tbl = _frontier_tbl()
    plain = _sorted_rows(frontier_schedule(_ds(tbl), k_per_cycle=4,
                                           num_partitions=8))
    split = _sorted_rows(frontier_schedule(
        _ds(tbl), k_per_cycle=4, num_partitions=8,
        hot_host_threshold=100, split_target=50))
    assert split == plain
    # the mega host really does span >1 cycle (the rank math is exercised)
    mega_cycles = {r[0] for r in plain if r[1] == "mega.example"}
    assert len(mega_cycles) > 50


def test_frontier_range_split_parity_with_k_column():
    tbl = _frontier_tbl(n_mega=300, n_cold=10)
    k = pa.array([2 if "mega" in u else None
                  for u in tbl["url"].to_pylist()], pa.int64())
    tbl = tbl.append_column("k_override", k)
    plain = _sorted_rows(frontier_schedule(
        _ds(tbl), k_per_cycle=4, k_column="k_override", num_partitions=8))
    split = _sorted_rows(frontier_schedule(
        _ds(tbl), k_per_cycle=4, k_column="k_override", num_partitions=8,
        hot_host_threshold=50, split_target=40))
    assert split == plain


def test_frontier_range_split_no_hot_hosts_matches_default():
    # threshold higher than any host count → empty bounds branch
    tbl = _frontier_tbl(n_mega=20, n_cold=5)
    plain = _sorted_rows(frontier_schedule(_ds(tbl), k_per_cycle=3,
                                           num_partitions=8))
    split = _sorted_rows(frontier_schedule(
        _ds(tbl), k_per_cycle=3, num_partitions=8,
        hot_host_threshold=10_000))
    assert split == plain


def test_frontier_range_split_tie_break_by_url():
    # equal priorities everywhere: rank order is url-ascending; range
    # boundaries then cut on the url part of the fused sort key
    tbl = pa.table({
        "url": pa.array([f"https://h.example/u{d:04d}" for d in range(200)],
                        pa.string()),
        "priority": pa.array([5] * 200, pa.int64()),
    })
    plain = _sorted_rows(frontier_schedule(_ds(tbl), k_per_cycle=7,
                                           num_partitions=4))
    split = _sorted_rows(frontier_schedule(
        _ds(tbl), k_per_cycle=7, num_partitions=4,
        hot_host_threshold=50, split_target=30))
    assert split == plain


def test_auto_strategy_pickers():
    from docling_translate_ray.functions.crawl import (
        _pick_hot_threshold,
        _pick_template_strategy,
    )

    # template crossover: 24k docs (~72k lines) stays partition; 960k
    # docs (~2.9M lines) goes salted (the stress_skew crossover)
    assert _pick_template_strategy(72_000, 300_000) == "partition"
    assert _pick_template_strategy(2_880_000, 300_000) == "salted"
    # frontier: small frontier skips the sampling pass; large one splits
    # hosts above a partition's fair share, floored at split_target
    assert _pick_hot_threshold(24_000, 32, 100_000) is None
    assert _pick_hot_threshold(3_200_000, 32, 100_000) == 100_000
    assert _pick_hot_threshold(64_000_000, 32, 100_000) == 2_000_000


def test_host_template_auto_parity(ray_session):
    tbl = _skewed_docs()
    explicit = _sorted_rows(host_template_lines(_ds(tbl), min_docs=3,
                                                strategy="partition"))
    # auto with a tiny threshold forces the salted plan; rows identical
    auto_salted = _sorted_rows(host_template_lines(
        _ds(tbl), min_docs=3, strategy="auto", salt_threshold=1))
    auto_part = _sorted_rows(host_template_lines(
        _ds(tbl), min_docs=3, strategy="auto", salt_threshold=10**9))
    assert auto_salted == explicit
    assert auto_part == explicit


def test_frontier_auto_parity(ray_session):
    tbl = _frontier_tbl(n_mega=60, n_cold=8)
    pinned = _sorted_rows(frontier_schedule(_ds(tbl), k_per_cycle=3,
                                            hot_host_threshold=None))
    # auto with a tiny split_target forces the range-split machinery
    auto_split = _sorted_rows(frontier_schedule(
        _ds(tbl), k_per_cycle=3, hot_host_threshold="auto",
        split_target=5))
    auto_plain = _sorted_rows(frontier_schedule(
        _ds(tbl), k_per_cycle=3, hot_host_threshold="auto"))
    assert auto_split == pinned
    assert auto_plain == pinned
