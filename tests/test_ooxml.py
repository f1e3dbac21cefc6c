"""Pure OOXML lanes (ooxml_core.py): writer→reader golden roundtrips,
numeric slide ordering, run concatenation, tab/break handling, heading
styles, truncated-zip tolerance, dispatch precedence, poison tolerance,
and a hypothesis roundtrip property."""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings, strategies as st

from docling_translate_ray import extract_core as ec
from docling_translate_ray import ooxml_core as oc


def test_docx_roundtrip_and_heading():
    docx = oc.build_docx([("Title here", "Heading1"),
                          "first body paragraph",
                          "second body paragraph"])
    assert oc.sniff_ooxml(docx) == "docx"
    rec = ec.extract_page("https://x.example/a.docx", docx)
    assert rec["doctype"] == "docx" and rec["status"] == "ok"
    assert rec["extracted_text"] == (
        "Title here\nfirst body paragraph\nsecond body paragraph")
    kinds = [s.kind for s in rec["spans"]]
    assert kinds == ["header", "prose", "prose"]
    for s in rec["spans"]:  # spans tile the assembled text
        assert rec["extracted_text"][s.start:s.end] == s.text
        assert s.page_no == 1


def test_docx_multi_run_concatenation():
    """The writer splits multi-word paragraphs into two runs — the
    reader must join w:t texts of one paragraph seamlessly."""
    text = "alpha beta gamma delta"
    docx = oc.build_docx([text])
    xml = oc.zip_entries(docx)["word/document.xml"]
    assert xml.count(b"<w:r>") == 2  # the fixture really is two runs
    assert [t for t, _ in oc.docx_paragraphs(docx)] == [text]


def test_docx_tab_and_break():
    """Hand-built document.xml: w:tab → TAB, w:br → LF inside one
    paragraph's text."""
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
        "<w:t>c</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    blob = oc._zip_build([("word/document.xml", doc)])
    assert oc.docx_paragraphs(blob) == [("a\tb\nc", None)]


def test_docx_xml_entities_roundtrip():
    text = "a < b & c > d"
    docx = oc.build_docx([text])
    assert [t for t, _ in oc.docx_paragraphs(docx)] == [text]


def test_docx_table_paragraphs_in_document_order():
    """Paragraphs inside w:tbl/w:tr/w:tc read in-place, in document
    order (the flow contract — Docling's table recovery is the model
    lane, out of scope here)."""
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell one</w:t></w:r></w:p>"
        "</w:tc><w:tc><w:p><w:r><w:t>cell two</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    blob = oc._zip_build([("word/document.xml", doc)])
    assert [t for t, _ in oc.docx_paragraphs(blob)] == [
        "before", "cell one", "cell two", "after"]


def test_pptx_numeric_slide_order():
    """12 slides: numeric sort (slide2 < slide10) AND reversed zip
    entry order both covered — a lexicographic or entry-order reader
    fails this."""
    slides = [[f"slide {i} text"] for i in range(1, 13)]
    pptx = oc.build_pptx(slides)
    assert oc.sniff_ooxml(pptx) == "pptx"
    rows = oc.pptx_slide_paragraphs(pptx)
    assert rows == [(i, f"slide {i} text") for i in range(1, 13)]
    rec = ec.extract_page("https://x.example/deck.pptx", pptx)
    assert rec["extracted_text"] == "\n".join(
        f"slide {i} text" for i in range(1, 13))
    assert [s.page_no for s in rec["spans"]] == list(range(1, 13))


def test_truncated_docx_recovers_complete_prefix():
    """Cut the archive tail (central directory gone): every fully
    contained paragraph still extracts; the result is always a prefix
    of the full text, and no cut point ever raises."""
    paras = ["doc 7"] + [f"paragraph number {i} with several words"
                         for i in range(20)]
    docx = oc.build_docx(paras)
    full = ec.extract_page("d://7", docx)["extracted_text"]
    assert full == "\n".join(paras)
    recovered_any = False
    for frac in (0.95, 0.9, 0.8, 0.6, 0.4, 0.2, 0.05):
        rec = ec.extract_page("d://t", docx[:int(len(docx) * frac)])
        assert rec["status"] in ("ok", "skipped_binary")
        got = rec["extracted_text"]
        assert full.startswith(got)
        if got:
            recovered_any = True
    assert recovered_any  # at least one cut point yields partial text


def test_zip_entries_scan_matches_zipfile():
    docx = oc.build_docx(["one two", "three"])
    via_zipfile = oc.zip_entries(docx)
    via_scan = oc._scan_local_entries(docx)
    assert via_zipfile == via_scan


def test_data_descriptor_zip_entries():
    """Streamed zips (flag bit 3: sizes in a trailing descriptor) are
    read by the scan fallback — some real-world writers emit these."""
    import struct
    import zlib

    def member(name: str, payload: bytes) -> bytes:
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = comp.compress(payload) + comp.flush()
        head = (b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH", 20, 0x08, 8, 0, 0, 0, 0, 0, len(name), 0)
            + name.encode())
        desc = b"PK\x07\x08" + struct.pack(
            "<III", zlib.crc32(payload), len(data), len(payload))
        return head + data + desc

    blob = (member("word/document.xml",
                   b'<w:document xmlns:w="x"><w:body><w:p><w:r>'
                   b"<w:t>streamed text</w:t></w:r></w:p></w:body>"
                   b"</w:document>")
            + member("word/other.xml", b"<x/>"))
    ents = oc._scan_local_entries(blob)
    assert set(ents) == {"word/document.xml", "word/other.xml"}
    assert oc.docx_paragraphs(blob) == [("streamed text", None)]
    assert oc.sniff_ooxml(blob) == "docx"


def test_regex_fallback_on_truncated_xml():
    xml = (b'<w:document xmlns:w="x"><w:body>'
           b"<w:p><w:r><w:t>kept para</w:t></w:r></w:p>"
           b"<w:p><w:r><w:t>cut off mid")
    assert oc._paras_of_xml(xml) == [("kept para", None)]


def test_dispatch_precedence_and_non_ooxml_zip():
    docx = oc.build_docx(["x"])
    assert ec.detect_doctype("https://x.example/f", docx) == "docx"
    pptx = oc.build_pptx([["y"]])
    assert ec.detect_doctype("https://x.example/f", pptx) == "pptx"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("data/readme.txt", "hi")
    plain = buf.getvalue()
    assert ec.detect_doctype("https://x.example/f.zip", plain) == "binary"
    rec = ec.extract_page("https://x.example/f.zip", plain)
    assert rec["status"] == "skipped_binary"


def test_poison_ooxml_never_raises():
    for data in (b"PK\x03\x04", b"PK\x03\x04" + b"\x99" * 64,
                 oc.build_docx(["x"])[:40],
                 oc._zip_build([("word/document.xml", "not xml at all <")])):
        rec = ec.extract_page("https://x.example/bad.docx", data)
        assert rec["status"] in ("ok", "skipped_binary")


@given(st.lists(
    st.text(min_size=1, max_size=40,
            alphabet=st.characters(codec="utf-8",
                                   exclude_categories=("Cs", "Cc", "Zl", "Zp")))
    .map(lambda t: " ".join(t.split())).filter(lambda t: t),
    min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(texts):
    """Any unicode paragraph set round-trips byte-exactly through both
    writers/readers (whitespace normalized to single spaces — the
    writers' run-splitting keeps interior spaces only)."""
    assert [t for t, _ in oc.docx_paragraphs(oc.build_docx(texts))] == texts
    rows = oc.pptx_slide_paragraphs(oc.build_pptx([texts]))
    assert [t for _no, t in rows] == texts


def test_mixed_corpus_through_the_job(tmp_path):
    """The durable extract job handles a MIXED html + docx + pptx
    corpus: every url's extracted text equals the pure kernel's output."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from docling_translate_ray.corpus import gen_pages
    from docling_translate_ray.pipelines.extract import run_extract_job

    html_pages = gen_pages(30, seed=13)
    rows = {
        "url": [], "warc_ts": html_pages["warc_ts"].to_pylist()[:10],
        "html": [], "text": [""] * 10, "lang": [""] * 10,
    }
    for i in range(10):
        if i % 2 == 0:
            rows["url"].append(f"https://docs.example/memo-{i}.docx")
            rows["html"].append(oc.build_docx(
                [(f"memo {i}", "Heading1"), f"body of memo {i}"]))
        else:
            rows["url"].append(f"https://docs.example/deck-{i}.pptx")
            rows["html"].append(oc.build_pptx(
                [[f"deck {i}"], [f"slide two of {i}"]]))
    ooxml_tbl = pa.table(
        {k: pa.array(v, type=html_pages.schema.field(k).type)
         for k, v in rows.items()}, schema=html_pages.schema)
    mixed = pa.concat_tables([html_pages, ooxml_tbl])
    pdir = str(tmp_path / "pages")
    os.makedirs(pdir)
    pq.write_table(mixed, os.path.join(pdir, "pages.parquet"))

    out = str(tmp_path / "out")
    res = run_extract_job(pdir, out, n_buckets=4)
    assert res["doc_count"] == 40

    got = {r["url"]: (r["doctype"], r["extracted_text"])
           for r in ray.data.read_parquet(os.path.join(out, "docs")).take_all()}
    assert len(got) == 40
    for url, blob in zip(mixed["url"].to_pylist(), mixed["html"].to_pylist()):
        want = ec.extract_page(url, blob or b"")
        assert got[url][1] == want["extracted_text"], url
    for i in range(10):
        if i % 2 == 0:
            u = f"https://docs.example/memo-{i}.docx"
            assert got[u] == ("docx", f"memo {i}\nbody of memo {i}")
        else:
            u = f"https://docs.example/deck-{i}.pptx"
            assert got[u] == ("pptx", f"deck {i}\nslide two of {i}")
