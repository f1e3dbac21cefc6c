"""WET lane (sources/warc.py WET half): conversion-record round-trips,
cross-format skipping (WET reader on raw WARC and vice versa),
boundary-looking payload safety, and the warc_to_wet conversion job
matching the extraction kernel page for page."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa

from docling_translate_ray.sources import warc

_TS = dt.datetime(2019, 9, 9, 9, 9, 9)


def _wet_records():
    return [
        ("https://a.example/p1", _TS, "plain text body\nsecond line"),
        # a payload that LOOKS like a record boundary — the byte-exact
        # Content-Length must carry it through untouched
        ("https://b.example/p2", _TS,
         "tricky\r\n\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody"),
        ("https://c.example/unicode", _TS, "본문 텍스트 — ünïcode ✓"),
        ("https://d.example/empty", _TS, ""),
    ]


def test_wet_roundtrip_all_three_encodings():
    recs = _wet_records()
    for kw in ({}, {"gzip_whole": True}, {"gzip_per_record": True}):
        blob = warc.build_wet_bytes(recs, **kw)
        assert list(warc.parse_wet_records(blob)) == recs, kw


def test_wet_and_warc_parsers_skip_each_other():
    wet_blob = warc.build_wet_bytes(_wet_records())
    warc_blob = warc.build_warc_bytes(
        [("https://r.example/x", _TS, b"<html>raw</html>")])
    # WET reader on a raw WARC: nothing (not garbage)
    assert list(warc.parse_wet_records(warc_blob)) == []
    # WARC reader on a WET file: nothing
    assert list(warc.parse_warc_records(wet_blob)) == []
    # mixed stream: each parser picks only its record type
    mixed = warc_blob + wet_blob
    assert [u for u, _, _ in warc.parse_warc_records(mixed)] == [
        "https://r.example/x"]
    assert list(warc.parse_wet_records(mixed)) == _wet_records()


def test_wet_parser_survives_truncation():
    recs = _wet_records()
    blob = warc.build_wet_bytes(recs)
    assert list(warc.parse_wet_records(blob[:-20])) == recs[:3]
    assert list(warc.parse_wet_records(b"")) == []


def test_write_wet_read_wet_roundtrip(tmp_path):
    import ray.data

    rows = pa.table({
        "url": [f"https://rt.example/p{i}" for i in range(10)],
        "warc_ts": pa.array([_TS] * 10, pa.timestamp("us")),
        "text": [f"text body {i}\nline two {i}" for i in range(10)],
    })
    out = str(tmp_path / "wet")
    warc.write_wet(ray.data.from_arrow(rows).repartition(3), out)
    segs = os.listdir(out)
    assert segs and all(f.endswith(".wet.gz") for f in segs)
    back = sorted(warc.read_wet(out).take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in back] == sorted(rows["url"].to_pylist())
    by_url = {r["url"]: r for r in back}
    for i in range(10):
        r = by_url[f"https://rt.example/p{i}"]
        assert r["text"] == f"text body {i}\nline two {i}"
        assert r["warc_ts"] == _TS


def test_warc_to_wet_matches_extraction_kernel(tmp_path):
    from docling_translate_ray.stages.extract import extract_batch

    pages = [
        ("https://w.example/p1", _TS,
         b"<html><body><h1>Title</h1><p>Body paragraph with words."
         b"</p></body></html>"),
        ("https://w.example/p2", _TS, b"\x00PK\x03\x04binary-sniff"),
        ("https://w.example/p3", _TS, b"plain text page content"),
    ]
    in_dir, out_dir = str(tmp_path / "warc"), str(tmp_path / "wet")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "seg.warc.gz"), "wb") as f:
        f.write(warc.build_warc_bytes(pages, gzip_per_record=True))

    warc.warc_to_wet(in_dir, out_dir)
    got = {r["url"]: r["text"] for r in warc.read_wet(out_dir).take_all()}

    want_tbl = extract_batch(pa.table({
        "url": pa.array([u for u, _, _ in pages], pa.string()),
        "html": pa.array([b for _, _, b in pages], pa.binary()),
        "lang": pa.array([""] * len(pages), pa.string()),
    }))
    want = dict(zip(want_tbl["url"].to_pylist(),
                    want_tbl["extracted_text"].to_pylist()))
    assert got == {u: (t or "") for u, t in want.items()}
