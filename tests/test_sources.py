"""Raw-document folder source (sources/files.py): a directory of
.html/.pdf/.txt/.py files maps to the input_hint pages schema and runs
through the UNCHANGED extraction job, byte-identical per file to the
pure kernel (extract_core.extract_page) on the same bytes — the
reference's `python main.py <file>` user story end-to-end."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from docling_translate_ray import extract_core as ec
from docling_translate_ray import pdf_core
from docling_translate_ray.sources.files import read_document_folder

_HTML = (b"<html><head><title>T</title></head><body>"
         b"<h1>Heading One</h1><p>First paragraph with enough words to "
         b"count as content.</p><table><tr><td>cell a</td><td>cell b</td>"
         b"</tr></table></body></html>")
_PY = (b"def f(x):\n    \"\"\"Docstring sentence here.\"\"\"\n"
       b"    return x + 1  # trailing comment\n")
_TXT = "Plain text line one.\nSecond line with more words.\n".encode()


def _write_corpus(root) -> dict[str, bytes]:
    files = {
        "a/page.html": _HTML,
        "b/script.py": _PY,
        "notes.txt": _TXT,
        "doc.pdf": pdf_core.build_pdf(
            [[(72.0, 700.0, "Hello pdf line"), (72.0, 680.0, "Second line")]]),
    }
    for rel, data in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)
    return files


def test_read_document_folder_schema_and_urls(tmp_path):
    files = _write_corpus(str(tmp_path))
    tbl = read_document_folder(str(tmp_path)).take_all()
    assert len(tbl) == len(files)
    by_url = {r["url"]: r for r in tbl}
    for rel, data in files.items():
        url = "file://" + os.path.abspath(os.path.join(str(tmp_path), rel))
        assert url in by_url
        assert bytes(by_url[url]["html"]) == data
        assert by_url[url]["text"] is None and by_url[url]["lang"] is None
        # deterministic default timestamp (epoch), not machine mtime
        assert by_url[url]["warc_ts"].year == 1970


def test_files_job_byte_identical_to_kernel(tmp_path):
    import ray.data  # noqa: F401  (session fixture owns Ray)

    from docling_translate_ray.pipelines.extract import run_extract_job

    files = _write_corpus(str(tmp_path / "in"))
    out = str(tmp_path / "out")
    res = run_extract_job(str(tmp_path / "in"), out, n_buckets=4,
                          layout="bucket", source_kind="files")
    assert res["doc_count"] == len(files)
    assert res["ok_count"] == len(files)

    got = {
        r["url"]: r
        for r in ray.data.read_parquet(os.path.join(out, "docs")).take_all()
    }
    for rel, data in files.items():
        url = "file://" + os.path.abspath(
            os.path.join(str(tmp_path / "in"), rel))
        want = ec.extract_page(url, data)
        assert got[url]["status"] == "ok"
        assert got[url]["extracted_text"] == want["extracted_text"]
        assert got[url]["doctype"] == want["doctype"]
    # doctype dispatch actually exercised all three lanes
    doctypes = {r["doctype"] for r in got.values()}
    assert {"html", "pdf"} <= doctypes


def test_files_source_rejects_shard_layout(tmp_path):
    from docling_translate_ray.pipelines.extract import run_extract_job

    _write_corpus(str(tmp_path / "in"))
    with pytest.raises(ValueError, match="layout='bucket'"):
        run_extract_job(str(tmp_path / "in"), str(tmp_path / "out"),
                        layout="shard", source_kind="files")


def test_write_html_files_sink(tmp_path):
    import ray.data

    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.stages.render import write_html_files

    files = _write_corpus(str(tmp_path / "in"))
    out = str(tmp_path / "out")
    run_extract_job(str(tmp_path / "in"), out, n_buckets=4,
                    layout="bucket", source_kind="files")
    docs = ray.data.read_parquet(os.path.join(out, "docs"))
    manifest = write_html_files(docs, str(tmp_path / "html")).take_all()
    assert len(manifest) == len(files)
    for row in manifest:
        assert os.path.exists(row["path"])
        assert os.path.getsize(row["path"]) == row["n_bytes"]
        data = open(row["path"], "rb").read().decode("utf-8")
        assert data.startswith("<!DOCTYPE html>")
    # deterministic + idempotent: rerun maps every url to the same path
    again = write_html_files(docs, str(tmp_path / "html")).take_all()
    assert {r["url"]: r["path"] for r in again} == \
        {r["url"]: r["path"] for r in manifest}
    # the html page carries the doc's translatable text
    page_row = next(r for r in manifest if "page-" in r["path"])
    html = open(page_row["path"], encoding="utf-8").read()
    assert "Heading One" in html


# ------------------------------------------------------------------ WARC


def _warc_records():
    import datetime as dt

    ts = dt.datetime(2017, 3, 6, 4, 3, 53)
    return [
        ("https://a.example/p1", ts, b"<html><body>hello world</body></html>"),
        ("https://b.example/p2", ts, "<html>\xeb\xb3\xb8\xeb\xac\xb8</html>".encode("latin-1")),
        ("https://c.example/empty", ts, b""),
    ]


def test_warc_roundtrip_all_three_encodings():
    from docling_translate_ray.sources import warc

    recs = _warc_records()
    for kw in ({}, {"gzip_whole": True}, {"gzip_per_record": True}):
        blob = warc.build_warc_bytes(recs, **kw)
        got = list(warc.parse_warc_records(blob))
        assert got == recs, kw


def test_warc_parser_skips_non_response_and_survives_truncation():
    import gzip

    from docling_translate_ray.sources import warc

    recs = _warc_records()
    blob = warc.build_warc_bytes(recs)
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"robo\r\n\r\n")
    assert list(warc.parse_warc_records(info + blob)) == recs
    # truncated final record: the prefix still parses, no raise
    assert list(warc.parse_warc_records(blob[:-30])) == recs[:2]
    # garbage between records aborts cleanly at the boundary
    assert list(warc.parse_warc_records(blob + b"GARBAGE")) == recs
    # corrupt gzip yields nothing, no raise
    assert list(warc.parse_warc_records(gzip.compress(blob)[:10])) == []


def test_read_warc_dataset_over_directory(tmp_path):
    from docling_translate_ray.sources import warc

    recs = _warc_records()
    (tmp_path / "seg1.warc.gz").write_bytes(
        warc.build_warc_bytes(recs[:2], gzip_per_record=True))
    (tmp_path / "seg2.warc").write_bytes(warc.build_warc_bytes(recs[2:]))
    ds = warc.read_warc(str(tmp_path))
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [u for u, _, _ in recs]
    assert rows[0]["html"] == recs[0][2]
    assert rows[2]["html"] == b""
    assert all(r["text"] == "" and r["lang"] == "" for r in rows)
    assert rows[0]["warc_ts"] == recs[0][1]


def test_write_warc_read_warc_roundtrip(tmp_path):
    import datetime as dt

    import ray.data

    from docling_translate_ray.sources import warc

    ts = dt.datetime(2020, 5, 5, 12, 0, 0)
    pages = pa.table({
        "url": [f"https://rt.example/p{i}" for i in range(10)],
        "warc_ts": pa.array([ts] * 10, pa.timestamp("us")),
        "html": [f"<html>page {i}</html>".encode() for i in range(10)],
    })
    out = str(tmp_path / "segs")
    warc.write_warc(ray.data.from_arrow(pages).repartition(3), out)
    import os

    segs = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert len(segs) >= 1 and not any(f.endswith(".tmp") for f in os.listdir(out))
    back = sorted(warc.read_warc(out).take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in back] == sorted(pages["url"].to_pylist())
    by_url = {r["url"]: r for r in back}
    for i in range(10):
        r = by_url[f"https://rt.example/p{i}"]
        assert r["html"] == f"<html>page {i}</html>".encode()
        assert r["warc_ts"] == ts


def test_warc_payload_digest_header_and_dedup(ray_session, tmp_path):
    import base64
    import datetime as dt
    import hashlib

    from docling_translate_ray.sources import warc

    ts = dt.datetime(2020, 5, 5, 12, 0, 0)
    body = b"<html>same payload</html>"
    recs = [("http://a/1", ts, body), ("http://a/2", ts, body),
            ("http://b/1", ts, b"<html>unique</html>")]
    blob = warc.build_warc_bytes(recs, gzip_per_record=True)
    (tmp_path / "seg.warc.gz").write_bytes(blob)

    # header carries the real CC annotation: sha1, base32
    got = list(warc.parse_warc_records_ex(blob))
    want = "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()
    assert got[0][4] == want and got[1][4] == want
    assert got[2][4] != want and got[2][4].startswith("sha1:")

    # read_warc surfaces it as a column
    rows = sorted(warc.read_warc(str(tmp_path)).take_all(),
                  key=lambda r: r["url"])
    assert rows[0]["payload_digest"] == want

    # dedup: headers-only, min-url canonical, digest-less kept verbatim
    out = sorted(warc.warc_digest_dedup(str(tmp_path)).take_all(),
                 key=lambda r: r["url"])
    assert [(r["url"], r["n_dups"]) for r in out] == [
        ("http://a/1", 2), ("http://b/1", 1)]


def test_warc_digest_dedup_keeps_digestless_records(ray_session, tmp_path):
    import datetime as dt

    from docling_translate_ray.sources import warc

    ts = dt.datetime(2020, 5, 5, 12, 0, 0)
    blob = warc.build_warc_bytes([("http://c/1", ts, b"x")])
    # strip the digest header to simulate a non-CC writer
    blob = b"".join(line for line in blob.splitlines(keepends=True)
                    if not line.startswith(b"WARC-Payload-Digest"))
    # content-length of the WARC record header block changed? No — the
    # digest header sits inside the WARC header block, whose length is
    # not length-prefixed (only the payload is), so stripping is safe.
    (tmp_path / "seg.warc").write_bytes(blob)
    out = warc.warc_digest_dedup(str(tmp_path)).take_all()
    assert [(r["url"], r["n_dups"]) for r in out] == [("http://c/1", 1)]
