"""Pure PDF lane (pdf_core.py): writer→reader golden roundtrips, the
reading-order layout sort, filters, escapes, dispatch precedence, poison
tolerance, and a hypothesis roundtrip property."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from docling_translate_ray import extract_core as ec
from docling_translate_ray import pdf_core as pc


def test_scrambled_emission_extracts_in_reading_order():
    pdf = pc.build_pdf([[
        (72, 660, "third"), (72, 700, "first"),
        (200, 700, "still first line"), (72, 680, "second"),
    ]])
    assert pc.pdf_lines(pdf) == [
        (1, "first still first line"), (1, "second"), (1, "third"),
    ]


def test_multipage_page_numbers_and_flate_parity():
    pages = [[(72, 700, "page one")], [(72, 700, "page two")]]
    plain = pc.pdf_lines(pc.build_pdf(pages, compress=False))
    flate = pc.pdf_lines(pc.build_pdf(pages, compress=True))
    assert plain == flate == [(1, "page one"), (2, "page two")]


def test_string_escapes_hex_and_tj():
    # hand-built content stream exercising escapes, hex strings, TJ
    # arrays, TD/T* leading and the quote operator
    stream = (b"BT 1 0 0 1 72 700 Tm (par\\(en\\)s \\\\ and \\110i) Tj "
              b"1 0 0 1 72 680 Tm <48656c6c6f> Tj "
              b"1 0 0 1 72 660 Tm [(a) -120 (b) 30 (c)] TJ "
              b"1 0 0 1 72 650 Tm 0 -10 TD (down one) Tj (quoted)' ET")
    pdf = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(stream), stream))
    assert pc.pdf_lines(pdf) == [
        (1, "par(en)s \\ and Hi"), (1, "Hello"), (1, "abc"),
        (1, "down one"), (1, "quoted"),
    ]


def test_extract_page_dispatches_pdf_before_binary_sniff():
    pdf = pc.build_pdf([[(72, 700, "hello pdf world")]], compress=True)
    assert b"\x00" in pdf or True  # flate streams are binary-ish
    assert ec.detect_doctype("https://x.example/a.pdf", pdf) == "pdf"
    rec = ec.extract_page("https://x.example/a.pdf", pdf)
    assert rec["doctype"] == "pdf" and rec["status"] == "ok"
    assert rec["extracted_text"] == "hello pdf world"
    # spans tile the assembled text
    for s in rec["spans"]:
        assert rec["extracted_text"][s.start:s.end] == s.text
        assert s.page_no == 1 and s.kind == "prose"


def test_poison_pdfs_never_raise():
    for data in (b"%PDF-", b"%PDF-1.7 junk stream endstream",
                 b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode >> "
                 b"stream\nnot-zlib\nendstream endobj"):
        rec = ec.extract_page("https://x.example/bad.pdf", data)
        assert rec["status"] == "ok" and rec["extracted_text"] == ""


@given(st.lists(
    st.text(min_size=1, max_size=40,
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")))
    .filter(lambda t: t.strip()),
    min_size=1, max_size=12))
@settings(max_examples=80, deadline=None)
def test_roundtrip_property(texts):
    """Any unicode line set placed top-down round-trips exactly, in both
    compression modes."""
    runs = [(72.0, 700.0 - 10 * i, t) for i, t in enumerate(texts)]
    want = [(1, t) for t in texts]
    assert pc.pdf_lines(pc.build_pdf([runs])) == want
    assert pc.pdf_lines(pc.build_pdf([runs], compress=True)) == want


def test_mixed_html_pdf_corpus_through_the_job(tmp_path):
    """The durable extract job handles a MIXED html + pdf corpus: every
    url's extracted text equals the pure kernel's output for its bytes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from docling_translate_ray.corpus import gen_pages
    from docling_translate_ray.pipelines.extract import run_extract_job

    html_pages = gen_pages(40, seed=11)
    pdf_rows = {
        "url": [], "warc_ts": html_pages["warc_ts"].to_pylist()[:10],
        "html": [], "text": [""] * 10, "lang": [""] * 10,
    }
    for i in range(10):
        pdf_rows["url"].append(f"https://pdfs.example/report-{i}.pdf")
        pdf_rows["html"].append(pc.build_pdf(
            [[(72, 700, f"report {i} heading"),
              (72, 688, f"body line for report {i}")]],
            compress=(i % 2 == 0)))
    pdf_tbl = pa.table(
        {k: pa.array(v, type=html_pages.schema.field(k).type)
         for k, v in pdf_rows.items()}, schema=html_pages.schema)
    mixed = pa.concat_tables([html_pages, pdf_tbl])
    pdir = str(tmp_path / "pages")
    os.makedirs(pdir)
    pq.write_table(mixed, os.path.join(pdir, "pages.parquet"))

    out = str(tmp_path / "out")
    res = run_extract_job(pdir, out, n_buckets=4)
    assert res["doc_count"] == 50

    got = {r["url"]: (r["doctype"], r["extracted_text"])
           for r in ray.data.read_parquet(os.path.join(out, "docs")).take_all()}
    assert len(got) == 50
    for url, blob in zip(mixed["url"].to_pylist(), mixed["html"].to_pylist()):
        want = ec.extract_page(url, blob or b"")
        assert got[url][1] == want["extracted_text"], url
    for i in range(10):
        u = f"https://pdfs.example/report-{i}.pdf"
        assert got[u][0] == "pdf"
        assert got[u][1] == (f"report {i} heading\nbody line for report {i}")
