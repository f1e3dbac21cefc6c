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
