"""Tests for functions/text_stats.badwords_flag_batch — the C4-style
blocklist gate: golden decisions per mode, DuckDB lockstep for the
word mode, and the curate stage integration."""

import duckdb
import pyarrow as pa
import pytest

from docling_translate_ray.functions.text_stats import badwords_flag_batch

WORDS = ["badword", "verboten", "naughty phrase"]


def _batch(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_word_mode_golden():
    out = badwords_flag_batch(_batch([
        "a clean document with plain words",
        "contains BADWORD in caps",
        "badwordy is not a hit in word mode",
        "",
        None,
        "verboten.",  # punctuation sticks to the token — not a hit
    ]), WORDS)
    assert out["badword_hit"].to_pylist() == [
        False, True, False, False, False, False]


def test_substring_mode_golden():
    out = badwords_flag_batch(_batch([
        "a clean document",
        "badwordy IS a hit in substring mode",
        "the naughty phrase spans words",
        "naughty alone is not the listed phrase",
    ]), WORDS, mode="substring")
    assert out["badword_hit"].to_pylist() == [False, True, True, False]


def test_bad_mode_raises():
    with pytest.raises(ValueError, match="mode"):
        badwords_flag_batch(_batch(["x"]), WORDS, mode="regex")


def test_word_mode_duckdb_lockstep():
    """polars \\S+ token equality == DuckDB list_has_any over the
    @NONWS@ tokenizer — including unicode-whitespace edge text."""
    import random

    from __ray_entry__ import _NONWS

    rng = random.Random(13)
    vocab = ["plain", "badword", "Verboten", "x", "", " ", "\t"]
    texts = ["".join(rng.choice(vocab + [" "])
                     for _ in range(rng.randrange(0, 30)))
             for _ in range(200)]
    got = badwords_flag_batch(_batch(texts), WORDS)["badword_hit"].to_pylist()

    con = duckdb.connect()
    con.register("t", pa.table({"text": pa.array(texts, pa.string())}))
    exp = [r[0] for r in con.execute(
        f"""SELECT list_has_any(
                regexp_extract_all(lower(coalesce(text, '')), '{_NONWS}'),
                ['badword', 'verboten', 'naughty phrase'])
            FROM t""").fetchall()]
    assert got == exp


def test_curate_blocklist_stage():
    import ray.data

    from docling_translate_ray.pipelines.curate import curate_docs

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta badword zeta eta theta",
        "another clean doc with enough plain words here",
    ]
    ds = ray.data.from_arrow(_batch(texts))
    _, stats = curate_docs(ds, blocklist=["badword"])
    assert stats["n_blocklist_ok"] == 2
    assert stats["n_input"] == 2
    assert stats["n_curated"] == 2
    # without the gate all three survive
    _, stats2 = curate_docs(ds)
    assert "n_blocklist_ok" not in stats2
    assert stats2["n_curated"] == 3
