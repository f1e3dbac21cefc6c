"""Tests for functions/dedup.trim_repeated_lines — within-document
first-occurrence line trimming (order preserved, no shuffle)."""

import pyarrow as pa

from docling_translate_ray.functions.dedup import trim_repeated_lines


def _run(rows):
    import ray.data

    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    out = trim_repeated_lines(ray.data.from_arrow(t))
    return sorted(out.take_all(), key=lambda r: r["doc_id"])


def test_golden():
    got = _run([
        (1, "aa\nbb\naa\ncc\nbb\naa"),
        (2, "one line only"),
        (3, ""),
        (4, None),
        (5, "x\n\nx\n\ny"),  # empty lines dedupe like any other line
    ])
    assert got[0] == {"doc_id": 1, "text_trimmed": "aa\nbb\ncc",
                      "n_lines": 6, "n_kept": 3}
    assert got[1] == {"doc_id": 2, "text_trimmed": "one line only",
                      "n_lines": 1, "n_kept": 1}
    assert got[2] == {"doc_id": 3, "text_trimmed": "", "n_lines": 0,
                      "n_kept": 0}
    assert got[3] == {"doc_id": 4, "text_trimmed": "", "n_lines": 0,
                      "n_kept": 0}
    assert got[4] == {"doc_id": 5, "text_trimmed": "x\n\ny",
                      "n_lines": 5, "n_kept": 3}


def test_string_id_preserved():
    """The id column keeps its INPUT type — string-url callers (the
    curate --trim-lines page path) must not hit an int64 cast
    (ADVICE r03)."""
    import ray.data

    t = pa.table({
        "url": pa.array(["u://a", "u://b"], pa.string()),
        "text": pa.array(["x\nx\ny", "z"], pa.string()),
    })
    out = trim_repeated_lines(ray.data.from_arrow(t), id_column="url")
    got = sorted(out.take_all(), key=lambda r: r["url"])
    assert got == [
        {"url": "u://a", "text_trimmed": "x\ny", "n_lines": 3, "n_kept": 2},
        {"url": "u://b", "text_trimmed": "z", "n_lines": 1, "n_kept": 1},
    ]


def test_order_preserved_and_idempotent():
    text = "\n".join(["m", "a", "z", "a", "m", "q", "z", "m"])
    [got] = _run([(1, text)])
    assert got["text_trimmed"] == "m\na\nz\nq"
    # idempotent: trimming trimmed text changes nothing
    [again] = _run([(1, got["text_trimmed"])])
    assert again["text_trimmed"] == got["text_trimmed"]
    assert again["n_lines"] == again["n_kept"] == got["n_kept"]


def test_fuzz_against_naive():
    import random

    rng = random.Random(9)
    rows = []
    for d in range(50):
        lines = [rng.choice(["l0", "l1", "l2", "l3", "", "longer line"])
                 for _ in range(rng.randrange(0, 12))]
        rows.append((d, "\n".join(lines)))
    got = _run(rows)
    for (d, text), g in zip(rows, got):
        lines = text.split("\n") if text else []
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert g["n_lines"] == len(lines), (d, text)
        assert g["n_kept"] == len(kept), (d, text)
        assert g["text_trimmed"] == "\n".join(kept), (d, text)


def test_driver_query_matches_oracle(sf_dir):
    import duckdb

    import __ray_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.queries_legacy()}
    got = sorted(
        qs["trim_repeated_lines"](sf_dir).take_all(),
        key=lambda r: r["doc_id"])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    exp = sorted(
        con.execute(entrymod.oracle_sql()["trim_repeated_lines"])
        .arrow().to_pylist(), key=lambda r: r["doc_id"])
    assert got == exp
    assert any(r["n_kept"] < r["n_lines"] for r in got)  # non-vacuous
