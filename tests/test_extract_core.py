"""Pure-kernel tests: segmenter semantics, offsets, sentences, formulas."""

import re

import pytest

from docling_translate_ray import extract_core as ec


# ---------------------------------------------------------------- decode/sniff

def test_decode_ladder_utf8():
    assert ec.decode_bytes("héllo".encode("utf-8")) == "héllo"


def test_decode_ladder_cp949():
    s = "한국어 텍스트"
    assert ec.decode_bytes(s.encode("cp949")) == s


def test_decode_ladder_ignore():
    # invalid in both utf-8 and cp949 → lossy utf-8
    data = b"ab\xff\xfe\xc0cd"
    out = ec.decode_bytes(data)
    assert "ab" in out and "cd" in out


def test_binary_sniff():
    assert ec.is_binary(b"\x00PK")
    assert not ec.is_binary(b"plain text " * 100)
    # null byte beyond 8 KiB is NOT sniffed (text_parser.py:547 semantics)
    assert not ec.is_binary(b"a" * 8192 + b"\x00")


def test_detect_doctype():
    assert ec.detect_doctype("https://x.example/a.md", b"# hi") == "markdown"
    assert ec.detect_doctype("https://x.example/a.py", b"pass") == "python"
    assert ec.detect_doctype("https://x.example/a", b"<!DOCTYPE html><html>") == "html"
    assert ec.detect_doctype("https://x.example/a?q=1", b"hello") == "plaintext"
    assert ec.detect_doctype("https://x.example/a.bin", b"\x00") == "binary"


# ---------------------------------------------------------------- segmenters

PY_SRC = '"""Doc line one.\nDoc line two.\n"""\nx = 1\n# a comment\ny = 2\n'


def test_python_segments():
    spans = ec.segment_content("python", PY_SRC)
    kinds = [s.kind for s in spans]
    assert "docstring" in kinds and "comment" in kinds and "code" in kinds
    docstrings = [s for s in spans if s.kind == "docstring"]
    assert docstrings[0].text.startswith('"""Doc line one.')
    comments = [s for s in spans if s.kind == "comment"]
    assert comments[0].text == "# a comment"


def test_c_style_segments():
    src = "// line\nint x; /* block\nmore */ done();\n"
    spans = ec.segment_content("c_style", src)
    kinds = {s.kind for s in spans}
    assert kinds == {"line_comment", "block_comment", "code"}


def test_shell_shebang_excluded():
    src = "#!/bin/bash\n# real comment\necho hi\n"
    spans = ec.segment_content("shell", src)
    comments = [s for s in spans if s.kind == "comment"]
    assert [c.text for c in comments] == ["# real comment"]


def test_markdown_code_blocks_untranslatable():
    src = "Para one.\n\n```py\ncode()\n```\n\nPara two."
    spans = ec.segment_content("markdown", src)
    cb = [s for s in spans if s.kind == "code_block"]
    assert len(cb) == 1 and not cb[0].translatable
    prose = [s for s in spans if s.kind == "prose"]
    assert len(prose) == 2


def test_config_single_segment():
    spans = ec.segment_content("config", "a: 1\nb: 2\n")
    assert len(spans) == 1 and spans[0].kind == "config" and spans[0].translatable


def test_plaintext_paragraphs():
    spans = ec.segment_content("plaintext", "one\n\ntwo\n\nthree")
    prose = [s for s in spans if s.translatable]
    assert [p.text for p in prose] == ["one", "two", "three"]


@pytest.mark.parametrize("doctype", ["markdown", "python", "c_style", "shell", "config", "plaintext"])
def test_partition_property(doctype, docs_text_table):
    """Spans tile the decoded source exactly (FIXTURES.md §3 property)."""
    rows = docs_text_table.to_pylist()
    tested = 0
    for r in rows:
        if r["doctype"] != doctype:
            continue
        spans = ec.segment_content(doctype, r["body"])
        assert "".join(r["body"][s.start : s.end] for s in spans) == r["body"]
        assert [s.seg_id for s in spans] == list(range(len(spans)))
        tested += 1
    assert tested > 0


# ---------------------------------------------------------------- sentences

def test_sentence_split_basic():
    assert ec.split_sentences("One two. Three four! Five?") == [
        "One two.", "Three four!", "Five?"
    ]


def test_sentence_split_abbreviations():
    out = ec.split_sentences("Dr. Smith et al. proposed it. We agree.")
    assert out == ["Dr. Smith et al. proposed it.", "We agree."]


def test_sentence_split_decimals_and_acronyms():
    # "sec" is a frozen abbreviation (Sec. 3.1), so no split after "per sec."
    out = ec.split_sentences("Rate was 3.14 per sec. U.S. exports grew. Done.")
    assert out == ["Rate was 3.14 per sec. U.S. exports grew.", "Done."]
    out2 = ec.split_sentences("It costs 3.14 dollars. Next sentence.")
    assert out2 == ["It costs 3.14 dollars.", "Next sentence."]


def test_sentence_split_quotes():
    out = ec.split_sentences('He said "Stop." Then left.')
    assert out == ['He said "Stop."', "Then left."]


def test_sentence_split_empty():
    assert ec.split_sentences("") == []
    assert ec.split_sentences("   ") == []


# ---------------------------------------------------------------- formulas

def test_formula_heuristic():
    assert ec.is_formula_text(r"E = mc^{2}")
    assert ec.is_formula_text(r"\frac{a}{b}")
    assert ec.is_formula_text(r"x &= y")
    assert not ec.is_formula_text("plain prose sentence")
    assert not ec.is_formula_text("")


def test_formula_format():
    assert ec.format_formula("x^{2}") == r"\[x^{2}\]"
    assert ec.format_formula("a &= b").startswith(r"\[\begin{aligned}")
    assert ec.format_formula("$x$") == "$x$"


# ---------------------------------------------------------------- html lexer

HTML = (
    "<!DOCTYPE html><html><head><title>T</title><script>var x=1;</script>"
    "<style>p{}</style></head><body>"
    "<nav><a href='/'>skip me</a></nav>"
    "<h1>Heading One</h1>"
    "<p>First para. Second sentence.</p>"
    "<ul><li>Item A</li><li>Item B</li></ul>"
    "<table><tr><th>H1</th></tr><tr><td>cell</td></tr></table>"
    "<figure><figcaption>A caption.</figcaption></figure>"
    "<pre><code>x = 1</code></pre>"
    "<p>\\frac{a}{b} + x^{2}</p>"
    "<p><a href='/1'>l1</a> <a href='/2'>l2</a> <a href='/3'>l3</a></p>"
    "<footer><p>drop this footer</p></footer>"
    "</body></html>"
)


def test_html_kinds_and_drops():
    spans = ec.segment_content("html", HTML)
    by_kind = {}
    for s in spans:
        by_kind.setdefault(s.kind, []).append(s.text)
    assert "Heading One" in by_kind["header"]
    assert "T" in by_kind["header"]  # <title>
    assert by_kind["list_item"] == ["Item A", "Item B"]
    assert by_kind["table_cell"] == ["H1", "cell"]
    assert by_kind["caption"] == ["A caption."]
    assert by_kind["code_block"] == ["x = 1"]
    assert any("frac" in t for t in by_kind["formula"])
    # nav/script/style/footer content never appears
    all_text = " ".join(s.text for s in spans)
    assert "skip me" not in all_text
    assert "var x=1" not in all_text
    assert "drop this footer" not in all_text
    # link farm → boilerplate, not translatable
    assert any("l1" in t for t in by_kind.get("boilerplate", []))


def test_html_page_markers():
    src = (
        "<html><body><p>page zero</p>"
        "<div data-page='2'><p>on page two</p></div></body></html>"
    )
    spans = ec.segment_content("html", src)
    pages = {s.text: s.page_no for s in spans}
    assert pages["page zero"] == -1
    assert pages["on page two"] == 2


def test_html_offsets_point_into_source():
    spans = ec.segment_content("html", HTML)
    for s in spans:
        assert 0 <= s.start <= s.end <= len(HTML)
        # normalized text words all appear in the raw slice
        raw = HTML[s.start : s.end]
        for w in s.text.split()[:3]:
            assert w in raw or "&" in raw


# ---------------------------------------------------------------- assemble

def test_assemble_scored_identity_roundtrip():
    spans = ec.segment_content("html", HTML)
    sents = ec.sentences_of_spans(spans)
    mapping = {s: s for (_, _, s) in sents}
    out = ec.assemble_scored_text(spans, mapping, "identity")
    assert out == ec.assemble_text(spans)


def test_assemble_miss_policies():
    spans = ec.segment_content("plaintext", "hello world")
    assert ec.assemble_scored_text(spans, {}, "empty") == ""
    assert ec.assemble_scored_text(spans, {}, "identity") == "hello world"


def test_extract_page_binary_and_error():
    rec = ec.extract_page("https://x/a", b"\x00bin")
    assert rec["status"] == "skipped_binary" and rec["extracted_text"] == ""


# ------------------------------------------------------------- speed modes


def test_speed_mode_fast_drops_table_structure():
    """S4 profile (core.py:93-117 analog): fast trades table/caption/formula
    fidelity for speed; balanced == accurate on the HTML path."""
    from docling_translate_ray import extract_core as ec

    html = (b"<html><body><p>Hello world.</p>"
            b"<table><tr><td>cell A</td><td>cell B</td></tr>"
            b"<caption>Cap</caption></table>"
            b"<p>x^{2} &amp;= y</p><p>Tail para</p></body></html>")
    acc = ec.extract_page("u", html)
    bal = ec.extract_page("u", html, speed_mode="balanced")
    fast = ec.extract_page("u", html, speed_mode="fast")
    assert [s.kind for s in acc["spans"]] == [s.kind for s in bal["spans"]]
    assert acc["extracted_text"] == bal["extracted_text"]
    assert any(s.kind == "table_cell" for s in acc["spans"])
    assert any(s.kind == "formula" for s in acc["spans"])
    assert not any(s.kind in ("table_cell", "caption", "formula")
                   for s in fast["spans"])
    assert "cell A" in acc["extracted_text"]
    assert "cell A" not in fast["extracted_text"]
    # spans OUTSIDE tables keep identical offsets across modes
    acc_prose = [(s.text, s.start, s.end) for s in acc["spans"] if s.kind == "prose"]
    fast_prose = [(s.text, s.start, s.end) for s in fast["spans"] if s.kind == "prose"]
    assert set(acc_prose) <= set(fast_prose)


def test_speed_mode_validation_is_loud():
    import pytest

    from docling_translate_ray import extract_core as ec
    from docling_translate_ray.stages.extract import extract_batch

    import pyarrow as pa

    with pytest.raises(ValueError):
        ec.segment_html("<p>x</p>", speed_mode="warp")
    with pytest.raises(ValueError):
        extract_batch(pa.table({"url": ["u"], "html": [b"<p>x</p>"]}),
                      speed_mode="warp")
