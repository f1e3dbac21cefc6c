"""Incremental extraction (pipelines/incremental.py): the manifest-resolved
corpus state must always equal a full re-extraction of the newest snapshot,
only delta pages may be parsed, and manifest chains must resolve
recursively."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_translate_ray.corpus import gen_pages
from docling_translate_ray.pipelines.extract import run_extract_job
from docling_translate_ray.pipelines.incremental import (
    read_corpus_docs,
    run_incremental_extract_job,
)


def _mutate(pages: pa.Table, remove_mod=7, change_mod=5, add_mod=11) -> pa.Table:
    """Deterministic next snapshot: drop i%remove_mod, splice new content
    into i%change_mod pages, add brand-new urls for i%add_mod."""
    rows = pages.to_pylist()
    out = []
    for i, r in enumerate(rows):
        if i % remove_mod == 0:
            continue
        r = dict(r)
        if i % change_mod == 0 and r["html"]:
            r["html"] = r["html"].replace(
                b"</body>", b"<p>fresh paragraph for snapshot two</p></body>")
        out.append(r)
    for i, r in enumerate(rows):
        if i % add_mod == 0:
            r2 = dict(r)
            r2["url"] = r["url"] + "/v2-new"
            out.append(r2)
    return pa.Table.from_pylist(out, schema=pages.schema)


def _docs_map(ds):
    return {
        r["url"]: (r["status"], r["extracted_text"], r["n_chars"])
        for r in ds.take_all()
    }


@pytest.fixture(scope="module")
def snapshots(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("incr"))
    s1 = gen_pages(120, seed=7)
    s2 = _mutate(s1)
    s3 = _mutate(s2, remove_mod=13, change_mod=3, add_mod=17)
    for name, tbl in (("p1", s1), ("p2", s2), ("p3", s3)):
        os.makedirs(f"{work}/{name}")
        pq.write_table(tbl, f"{work}/{name}/pages.parquet")
    run_extract_job(f"{work}/p1", f"{work}/out1", n_buckets=4)
    return work


def test_incremental_equals_full_reextraction(snapshots):
    work = snapshots
    stats = run_incremental_extract_job(
        f"{work}/p1", f"{work}/p2", f"{work}/out1", f"{work}/out2", n_buckets=4
    )
    # only added+changed pages were parsed
    assert stats["doc_count"] == stats["n_added"] + stats["n_changed"]
    assert stats["n_added"] > 0 and stats["n_changed"] > 0 and stats["n_removed"] > 0
    n_pages = pq.read_table(f"{work}/p2/pages.parquet").num_rows
    assert stats["doc_count"] < n_pages  # strictly cheaper than a full run
    run_extract_job(f"{work}/p2", f"{work}/full2", n_buckets=4)
    assert _docs_map(read_corpus_docs(f"{work}/out2")) == \
        _docs_map(read_corpus_docs(f"{work}/full2"))


def test_manifest_chain_resolves_recursively(snapshots):
    work = snapshots
    if not os.path.isdir(f"{work}/out2"):
        run_incremental_extract_job(
            f"{work}/p1", f"{work}/p2", f"{work}/out1", f"{work}/out2",
            n_buckets=4)
    run_incremental_extract_job(
        f"{work}/p2", f"{work}/p3", f"{work}/out2", f"{work}/out3", n_buckets=4
    )
    run_extract_job(f"{work}/p3", f"{work}/full3", n_buckets=4)
    assert _docs_map(read_corpus_docs(f"{work}/out3")) == \
        _docs_map(read_corpus_docs(f"{work}/full3"))


def test_unchanged_snapshot_extracts_nothing(snapshots, tmp_path):
    work = snapshots
    out = str(tmp_path / "same")
    stats = run_incremental_extract_job(
        f"{work}/p1", f"{work}/p1", f"{work}/out1", out, n_buckets=4
    )
    assert stats["doc_count"] == 0
    assert stats["n_added"] == stats["n_changed"] == stats["n_removed"] == 0
    assert _docs_map(read_corpus_docs(out)) == \
        _docs_map(read_corpus_docs(f"{work}/out1"))


def test_compaction_flattens_chain(snapshots, tmp_path):
    from docling_translate_ray.pipelines.incremental import compact_corpus_state

    work = snapshots
    for prev_pages, new_pages, prev_out, out in (
        ("p1", "p2", "out1", "out2"), ("p2", "p3", "out2", "out3"),
    ):
        if not os.path.isdir(f"{work}/{out}"):
            run_incremental_extract_job(
                f"{work}/{prev_pages}", f"{work}/{new_pages}",
                f"{work}/{prev_out}", f"{work}/{out}", n_buckets=4)
    compact = str(tmp_path / "compact")
    stats = compact_corpus_state(f"{work}/out3", compact, n_buckets=4)
    flat = _docs_map(read_corpus_docs(compact))
    chained = _docs_map(read_corpus_docs(f"{work}/out3"))
    assert flat == chained and stats["doc_count"] == len(chained)
    # compacted state is manifest-free: no recursion, no anti-joins
    assert not os.path.isfile(os.path.join(compact, "manifest.json"))


def test_read_corpus_docs_paths_agree(snapshots):
    """Broadcast kill-rule and per-hop anti-join fallback resolve a
    depth-2 chain identically."""
    work = snapshots
    for prev_pages, new_pages, prev_out, out in (
        ("p1", "p2", "out1", "out2"), ("p2", "p3", "out2", "out3"),
    ):
        if not os.path.isdir(f"{work}/{out}"):
            run_incremental_extract_job(
                f"{work}/{prev_pages}", f"{work}/{new_pages}",
                f"{work}/{prev_out}", f"{work}/{out}", n_buckets=4)
    a = _docs_map(read_corpus_docs(f"{work}/out3"))
    b = _docs_map(read_corpus_docs(f"{work}/out3",
                                   max_broadcast_tombstones=0))
    assert a == b and a
