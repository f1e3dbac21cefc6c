"""Curation pipeline tests: stage counts against local oracles and planted
duplicates flowing through the full chain."""

from __future__ import annotations

import duckdb
import pyarrow as pa

import ray.data

from docling_translate_ray.pipelines.curate import curate_docs

SF = "/root/testdata/sf0.001"


def test_curate_stage_counts_against_duckdb():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    curated, stats = curate_docs(ds)
    want = duckdb.sql(
        f"""
        WITH q AS (
          SELECT doc_id, text,
                 CASE WHEN trim(text)='' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS np,
                 length(text) - length(regexp_replace(text, '\\S', '', 'g')) AS n_nonws
          FROM read_parquet('{SF}/documents.parquet')),
        ok AS (
          SELECT * FROM q
          WHERE n_tokens >= 5 AND np / greatest(n_chars,1) <= 0.2
            AND n_nonws / greatest(n_tokens,1) BETWEEN 2 AND 14)
        SELECT (SELECT count(*) FROM q) AS n_input,
               (SELECT count(*) FROM ok) AS n_quality_ok,
               (SELECT count(DISTINCT md5(text)) FROM ok) AS n_exact_unique
        """
    ).fetchone()
    assert stats["n_input"] == want[0]
    assert stats["n_quality_ok"] == want[1]
    assert stats["n_exact_unique"] == want[2]
    assert stats["n_curated"] <= stats["n_exact_unique"]
    assert curated.count() == stats["n_curated"]


def test_curate_drops_planted_duplicates():
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while seven other animals watch from the tall green grass nearby"
    )
    rows = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": [
                base,                                  # canonical
                base,                                  # exact dup → dropped
                base.replace("seven", "eight"),        # near dup → dropped
                "completely different text about database query engines and arrow",
                "x",                                   # fails quality (n_tokens < 5)
                "another unrelated document with plenty of distinct words inside",
            ],
        }
    )
    curated, stats = curate_docs(ray.data.from_arrow(rows), minhash_threshold=0.5)
    ids = sorted(r["doc_id"] for r in curated.select_columns(["doc_id"]).take_all())
    assert stats["n_input"] == 6
    assert stats["n_quality_ok"] == 5          # "x" dropped
    assert stats["n_exact_unique"] == 4        # exact dup dropped, min id kept
    assert ids == [0, 3, 5]                    # near dup 2 dropped, canonical 0 kept


def test_curate_keep_best_retention():
    """retention='keep_best': the LONGEST member of the near-dup cluster
    survives instead of the min id; everything else is unchanged."""
    import pytest

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while seven other animals watch from the tall green grass nearby"
    )
    rows = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": [
                base,                                  # cluster member
                base,                                  # exact dup → dropped
                base.replace("seven", "eight") + " extra tail words",  # LONGEST
                "completely different text about database query engines and arrow",
                "x",                                   # fails quality
                "another unrelated document with plenty of distinct words inside",
            ],
        }
    )
    curated, stats = curate_docs(ray.data.from_arrow(rows),
                                 minhash_threshold=0.5,
                                 retention="keep_best")
    ids = sorted(r["doc_id"] for r in curated.select_columns(["doc_id"]).take_all())
    assert stats["n_exact_unique"] == 4
    assert ids == [2, 3, 5]        # the longest member wins, not min id 0
    assert stats["n_curated"] == 3

    with pytest.raises(ValueError):
        curate_docs(ray.data.from_arrow(rows), retention="nope")
