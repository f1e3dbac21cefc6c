"""WAT metadata lane (sources/warc.py WAT half): record round-trip,
foreign-record skipping, the metadata envelope (headmeta fields +
resolved links, decoy skipping), the warc→wat conversion job, and the
driver query vs its end-output DuckDB oracle."""

import datetime as dt
import json

import pyarrow as pa

TS = dt.datetime(2020, 1, 2, 3, 4, 5)


def test_wat_bytes_roundtrip_all_gzip_modes():
    from docling_translate_ray.sources.warc import (
        build_wat_bytes, parse_wat_records)

    recs = [("http://a/x", TS, '{"a":1}'),
            ("http://b/y", TS, '{"b":[1,2],"s":"\\r\\n\\r\\nWARC/1.0"}')]
    for kw in ({}, {"gzip_whole": True}, {"gzip_per_record": True}):
        got = list(parse_wat_records(build_wat_bytes(recs, **kw)))
        assert got == [(u, TS, m) for u, _t, m in recs]


def test_wat_reader_skips_foreign_records():
    from docling_translate_ray.sources.warc import (
        build_warc_bytes, build_wet_bytes, parse_wat_records)

    warc = build_warc_bytes([("http://a/x", TS, b"<html>hi</html>")])
    wet = build_wet_bytes([("http://a/x", TS, "hi")])
    assert list(parse_wat_records(warc)) == []
    assert list(parse_wat_records(wet)) == []


def test_wat_truncated_blob_keeps_prior_records():
    from docling_translate_ray.sources.warc import (
        build_wat_bytes, parse_wat_records)

    blob = build_wat_bytes([("http://a/x", TS, '{"a":1}'),
                            ("http://b/y", TS, '{"b":2}')])
    got = list(parse_wat_records(blob[:len(blob) - 15]))
    assert [u for u, _t, _m in got] == ["http://a/x"]


def test_wat_meta_batch_envelope():
    from docling_translate_ray.sources.warc import wat_meta_batch

    html = ('<title>T</title><meta name="description" content="D">'
            '<link rel="canonical" href="http://c/x">'
            '<a href="/p">go</a><a href="mailto:z@q">m</a>'
            '<a href="#top">top</a>'
            '<a href="http://other/abs">abs <b>link</b></a>')
    out = wat_meta_batch(pa.table({
        "url": pa.array(["http://h/a/b", "http://h/empty"], pa.string()),
        "html": pa.array([html.encode(), None], pa.binary()),
    }))
    env = json.loads(out["meta_json"][0].as_py())
    hm = env["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"] == {"Title": "T", "Description": "D",
                          "Canonical": "http://c/x"}
    assert hm["Links"] == [
        {"text": "go", "url": "http://h/p"},
        {"text": "abs link", "url": "http://other/abs"}]
    assert env["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"] \
        == "http://h/a/b"
    empty = json.loads(out["meta_json"][1].as_py())
    ehm = empty["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
    assert ehm == {"Head": {}, "Links": []}


def test_warc_to_wat_end_to_end(tmp_path, ray_session):
    from docling_translate_ray.sources.warc import (
        build_warc_bytes, read_wat, warc_to_wat)

    pages = [
        (f"http://h{i}.ex/p", TS,
         (f"<title>t{i}</title>" + f'<a href="/x{i}">a{i}</a>'
          ).encode()) for i in range(3)]
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "seg.warc.gz").write_bytes(
        build_warc_bytes(pages, gzip_per_record=True))
    warc_to_wat(str(tmp_path / "in"), str(tmp_path / "out"))
    rows = sorted(read_wat(str(tmp_path / "out")).take_all(),
                  key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [u for u, _t, _h in pages]
    for i, r in enumerate(rows):
        env = json.loads(r["meta_json"])
        hm = env["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
        assert hm["Head"]["Title"] == f"t{i}"
        assert hm["Links"] == [
            {"text": f"a{i}", "url": f"http://h{i}.ex/x{i}"}]
        assert r["warc_ts"] == TS


def test_driver_query_matches_oracle(sf_dir, ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    got = entrymod.queries()["wat_extract"](sf_dir).to_pylist()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    exp = sorted(
        con.execute(entrymod.oracle_sql()["wat_extract"])
        .arrow().to_pylist(), key=lambda r: r["url"])
    assert got == exp
