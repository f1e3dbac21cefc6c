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


def _poison_ds():
    """A lazy Dataset that raises if any stage actually consumes it."""
    def boom(batch: pa.Table) -> pa.Table:
        raise RuntimeError("resume must not re-consume the input")

    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(boom, batch_format="pyarrow")


def _rows(ds) -> list:
    import polars as pl

    t = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in ds.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    return sorted(pl.from_arrow(t).select(sorted(t.column_names)).rows())


def test_curate_resume_skips_completed_stages(tmp_path):
    import os

    import pytest

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"])
    w = str(tmp_path / "curate_w")
    first, stats1 = curate_docs(ds, work_dir=w)
    want = _rows(first)

    # full resume: every stage skipped — the poisoned input is never read
    again, stats2 = curate_docs(_poison_ds(), work_dir=w, resume=True)
    assert stats2 == stats1 and _rows(again) == want

    # crash in the LAST stage: only it rebuilds (from the exact-stage
    # parquet) — the input is still never read
    os.remove(os.path.join(w, "curated.done"))
    third, stats3 = curate_docs(_poison_ds(), work_dir=w, resume=True)
    assert stats3 == stats1 and _rows(third) == want

    # crash in the FIRST stage: everything rebuilds (downstream markers
    # must not shadow a rebuilt upstream), and the real input is required
    os.remove(os.path.join(w, "quality.done"))
    with pytest.raises(Exception):
        curate_docs(_poison_ds(), work_dir=w, resume=True)
    fourth, stats4 = curate_docs(ds, work_dir=w, resume=True)
    assert stats4 == stats1 and _rows(fourth) == want

    # parameter mismatch is refused, not silently recomputed
    with pytest.raises(ValueError, match="different parameters"):
        curate_docs(ds, work_dir=w, resume=True, retention="keep_best")
    # resume without a work_dir is meaningless
    with pytest.raises(ValueError, match="work_dir"):
        curate_docs(ds, resume=True)


def test_mixture_resume_skips_completed_stages(tmp_path):
    import pyarrow.compute as pc

    from docling_translate_ray.pipelines.mixture import build_mixture

    def add_t(b: pa.Table) -> pa.Table:
        return b.append_column("is_target", pc.equal(b["source"], "src1"))

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).map_batches(add_t, batch_format="pyarrow")
    w = str(tmp_path / "mix_w")
    first, stats1 = build_mixture(ds, work_dir=w)

    def poison(b: pa.Table) -> pa.Table:
        raise RuntimeError("resume must not re-consume the input")

    again, stats2 = build_mixture(
        ds.map_batches(poison, batch_format="pyarrow"),
        work_dir=w, resume=True)
    assert stats2 == stats1 and _rows(again) == _rows(first)


def test_curate_normalize_stage_collapses_unicode_variants():
    """normalize=True (stage 0) makes visually identical docs hash equal:
    a decomposed-accent + control-byte + doubled-space variant of the
    same text must fall to the SAME exact-dedup winner, while with
    normalize=False all variants survive as distinct."""
    base = "the quick brown cafe\u0301 fox jumps over the lazy dog again"
    variants = [
        base,
        base.replace("e\u0301", "\xe9"),  # composed form
        base.replace(" fox", "  fox") + "\x01",   # doubled space + C0 byte
    ]
    rows = pa.table({
        "doc_id": pa.array(range(len(variants)), pa.int64()),
        "text": pa.array(variants, pa.string()),
    })
    ds = ray.data.from_arrow(rows)

    _, stats_raw = curate_docs(ds)
    assert stats_raw["n_exact_unique"] == 3   # untouched: all distinct

    _, stats_norm = curate_docs(ds, normalize=True)
    assert stats_norm["n_exact_unique"] == 1  # all collapse to one winner
    assert stats_norm["n_curated"] == 1


def test_curate_trim_lines_stage_collapses_repeat_padded_docs():
    """trim_lines=True (stage 0b) strips in-document repeats BEFORE
    hashing: two docs that differ only in how often they repeat the
    same boilerplate line must fall to the same exact-dedup winner,
    while without trimming both survive as distinct."""
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    plug = "subscribe to our newsletter now"
    variants = [
        body + "\n" + plug,
        body + "\n" + plug + "\n" + plug + "\n" + plug,
    ]
    rows = pa.table({
        "doc_id": pa.array(range(len(variants)), pa.int64()),
        "text": pa.array(variants, pa.string()),
    })
    ds = ray.data.from_arrow(rows)

    _, stats_raw = curate_docs(ds)
    assert stats_raw["n_exact_unique"] == 2   # untouched: distinct

    _, stats_trim = curate_docs(ds, trim_lines=True)
    assert stats_trim["n_exact_unique"] == 1  # repeats trimmed → equal
    assert stats_trim["n_curated"] == 1


def test_curate_pages_first_mile_end_to_end(tmp_path):
    """Raw input_hint pages → boilerplate strip → curate, urls
    re-attached: matches the manual composition of the pieces, drops
    chrome text, and resumes from markers without re-reading input."""
    import polars as pl

    from docling_translate_ray.corpus import gen_pages
    from docling_translate_ray.functions.boilerplate import strip_boilerplate
    from docling_translate_ray.pipelines.curate import curate_pages

    pages = gen_pages(300, seed=21)
    work = str(tmp_path / "webcurate")
    curated, stats = curate_pages(
        ray.data.from_arrow(pages), work_dir=work)
    rows = curated.take_all()
    assert stats["n_pages"] == 300
    assert stats["n_curated"] == len(rows)
    assert rows, "expected curated pages"
    urls = set(pages["url"].to_pylist())
    for r in rows[:50]:
        assert r["url"] in urls
        assert "site chrome to drop" not in r["text"]

    # manual composition parity (deterministic end to end)
    stripped = strip_boilerplate(
        ray.data.from_arrow(pages.select(["url", "html"])),
        id_column="url", html_column="html")

    def with_ids(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select(["url", "clean_text"]))
              .with_columns(pl.col("url").hash(seed=0)
                            .reinterpret(signed=True).alias("doc_id"))
              .rename({"clean_text": "text"}))
        return df.select(["doc_id", "text"]).to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))

    manual, mstats = curate_docs(
        stripped.map_batches(with_ids, batch_format="pyarrow"))
    assert {k: v for k, v in stats.items() if k != "n_pages"} == mstats
    got = sorted((r["doc_id"], r["text"]) for r in rows)
    exp = sorted((r["doc_id"], r["text"]) for r in manual.take_all())
    assert got == exp

    # marker resume: poisoned input must never be re-read
    poisoned = ray.data.from_arrow(pages).map_batches(
        lambda b: (_ for _ in ()).throw(RuntimeError("input re-read")),
        batch_format="pyarrow")
    curated2, stats2 = curate_pages(poisoned, work_dir=work, resume=True)
    assert stats2 == stats
    assert curated2.count() == stats["n_curated"]


def test_curate_compress_filter_stage_drops_machine_repeats():
    """compress_filter=True (stage 0d) drops docs the zlib signal marks
    boilerplate/machine-generated — long docs dominated by a repeated
    phrase — while natural-ish prose of the same length survives; with
    the gate off both pass through to curation."""
    import random

    rng = random.Random(9)
    prose = " ".join(f"tok{rng.randrange(40_000)}" for _ in range(300))
    machine = "click here to win a free prize now " * 80
    rows = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([prose, machine], pa.string()),
    })
    ds = ray.data.from_arrow(rows)

    _, stats_raw = curate_docs(ds)
    assert "n_compress_ok" not in stats_raw
    assert stats_raw["n_input"] == 2

    _, stats_z = curate_docs(ds, compress_filter=True)
    assert stats_z["n_compress_ok"] == 1      # machine doc gated out
    assert stats_z["n_input"] == 1
    assert stats_z["n_curated"] == 1
