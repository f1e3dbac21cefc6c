"""JSONL lane (sources/jsonl.py): NDJSON kernel round-trips across the
type surface (nulls, escapes, unicode, float64 bit-exactness, lists,
structs, timestamps), gzip-member transparency, shard write/read
through Ray Datasets, poison-file skipping, and explicit-schema rescue
of per-file inference divergence."""

from __future__ import annotations

import datetime as dt
import gzip
import os

import numpy as np
import pyarrow as pa

from docling_translate_ray.sources import jsonl

_TS = dt.datetime(2019, 9, 9, 9, 9, 9, 123456)


def _tricky_table() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(['quote " backslash \\ newline \n tab \t',
                          "", None, "본문 — ünïcode ✓  nbsp"],
                         pa.string()),
        # shortest-roundtrip float encoding must restore bits exactly
        "score": pa.array([np.nextafter(0.1, 1), -0.0, 1e-310, 3.5],
                          pa.float64()),
        "tokens": pa.array([[1, 2, 3], [], None, [7]],
                           pa.list_(pa.int64())),
        "meta": pa.array([{"a": 1, "b": "x"}, {"a": None, "b": ""},
                          None, {"a": -5, "b": "y"}],
                         pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "ts": pa.array([_TS, None, _TS, _TS], pa.timestamp("us")),
    })


def test_ndjson_kernel_roundtrip_types():
    t = _tricky_table()
    back = jsonl.loads_ndjson(jsonl.dumps_ndjson(t), schema=t.schema)
    assert back.equals(t)
    # float64 bit-exactness, explicitly (not just logical equality)
    assert (np.asarray(back["score"]).view(np.uint64).tolist()
            == np.asarray(t["score"]).view(np.uint64).tolist())


def test_ndjson_kernel_gzip_member_transparent():
    t = _tricky_table()
    blob = gzip.compress(jsonl.dumps_ndjson(t), mtime=0)
    assert jsonl.loads_ndjson(blob, schema=t.schema).equals(t)


def test_write_read_jsonl_dataset_roundtrip(tmp_path):
    import ray.data

    rows = pa.table({
        "doc_id": list(range(20)),
        "lang": (["en", "de", None, "zh"] * 5),
        "text": [f"body {i}\nline two {i}" if i % 7 else None
                 for i in range(20)],
    })
    out = str(tmp_path / "shards")
    jsonl.write_jsonl(ray.data.from_arrow(rows).repartition(3), out)
    names = os.listdir(out)
    assert names and all(n.endswith(".jsonl.gz") for n in names)
    assert not any(n.endswith(".tmp") for n in names)  # whole files only
    schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                        ("text", pa.string())])
    back = sorted(jsonl.read_jsonl(out, schema=schema).take_all(),
                  key=lambda r: r["doc_id"])
    want = rows.to_pylist()
    assert back == want


def test_write_jsonl_column_projection_and_plain(tmp_path):
    import ray.data

    rows = pa.table({"doc_id": [1, 2], "text": ["a", "b"],
                     "secret": ["x", "y"]})
    out = str(tmp_path / "plain")
    jsonl.write_jsonl(ray.data.from_arrow(rows), out,
                      columns=["doc_id", "text"], gzip_compress=False)
    names = os.listdir(out)
    assert all(n.endswith(".jsonl") for n in names)
    raw = open(os.path.join(out, names[0]), "rb").read()
    assert b"secret" not in raw
    back = jsonl.read_jsonl(out).take_all()
    assert sorted(back, key=lambda r: r["doc_id"]) == [
        {"doc_id": 1, "text": "a"}, {"doc_id": 2, "text": "b"}]


def test_read_jsonl_skips_poison_files(tmp_path):
    import pytest
    import ray.data

    from docling_translate_ray.sources import warc

    out = str(tmp_path / "mixed")
    rows = pa.table({"doc_id": [1, 2], "text": ["a", "b"]})
    jsonl.write_jsonl(ray.data.from_arrow(rows), out)
    # cross-format poison: a WET segment masquerading as a shard (valid
    # gzip, non-JSON content — survives ray's stream decode, dies in
    # the parser) and a truncated gzip under a non-.gz name (dies in
    # this lane's own gunzip) — both must contribute zero rows
    with open(os.path.join(out, "seg.jsonl.gz"), "wb") as f:
        f.write(warc.build_wet_bytes([("u", _TS, "t")], gzip_whole=True))
    with open(os.path.join(out, "bad.jsonl"), "wb") as f:
        f.write(gzip.compress(b'{"doc_id": 9, "text": "z"}\n' * 50,
                              mtime=0)[:-6])
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    got = sorted(jsonl.read_jsonl(out, schema=schema).take_all(),
                 key=lambda r: r["doc_id"])
    assert got == rows.to_pylist()  # poison contributed zero rows
    # strict mode surfaces the failure instead
    with pytest.raises(Exception, match="(?i)json|gzip|parse|invalid"):
        jsonl.read_jsonl(out, schema=schema, strict=True).take_all()


def test_warc_to_jsonl_matches_extraction_kernel(tmp_path):
    from docling_translate_ray.sources import warc
    from docling_translate_ray.sources.jsonl import (JSONL_CORPUS_SCHEMA,
                                                     read_jsonl,
                                                     warc_to_jsonl)
    from docling_translate_ray.stages.extract import extract_batch

    pages = [
        ("https://w.example/p1", _TS,
         b"<html><body><h1>Title</h1><p>Body paragraph with words."
         b"</p></body></html>"),
        ("https://w.example/p2", _TS, b"\x00PK\x03\x04binary-sniff"),
        ("https://w.example/p3", _TS, b"plain text page content"),
    ]
    in_dir, out_dir = str(tmp_path / "warc"), str(tmp_path / "jsonl")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "seg.warc.gz"), "wb") as f:
        f.write(warc.build_warc_bytes(pages, gzip_per_record=True))

    warc_to_jsonl(in_dir, out_dir)
    got = {r["url"]: r for r in
           read_jsonl(out_dir, schema=JSONL_CORPUS_SCHEMA).take_all()}

    want = extract_batch(pa.table({
        "url": pa.array([u for u, _, _ in pages], pa.string()),
        "html": pa.array([b for _, _, b in pages], pa.binary()),
        "lang": pa.array([""] * len(pages), pa.string()),
    }))
    for u, t, n in zip(want["url"].to_pylist(),
                       want["extracted_text"].to_pylist(),
                       want["n_chars"].to_pylist()):
        assert got[u]["text"] == t
        assert got[u]["n_chars"] == n


def test_explicit_schema_rescues_all_null_shard(tmp_path):
    import ray.data

    out = str(tmp_path / "nulls")
    # shard 1: text populated; shard 2: text all-null (would infer null
    # type per-file) — the explicit schema keeps blocks unionable
    jsonl.write_jsonl(ray.data.from_arrow(
        pa.table({"doc_id": [1], "text": ["x"]})), out)
    jsonl.write_jsonl(ray.data.from_arrow(
        pa.table({"doc_id": [2], "text": pa.array([None], pa.string())})),
        out)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    got = sorted(jsonl.read_jsonl(out, schema=schema).take_all(),
                 key=lambda r: r["doc_id"])
    assert got == [{"doc_id": 1, "text": "x"}, {"doc_id": 2, "text": None}]
