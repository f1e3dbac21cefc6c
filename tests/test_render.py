"""Tests for the HTML render stage (M11/M14/M15/M16 parity) and the
fully-distributed join scoring strategy."""

from __future__ import annotations

import pyarrow as pa

from docling_translate_ray.pipelines import extract as pipe
from docling_translate_ray.stages.render import RenderHtml, _format_formula, render_doc_html


def _span(seg_id, text, kind="prose", page_no=0, translatable=True):
    return {
        "seg_id": seg_id, "start": 0, "end": len(text), "kind": kind,
        "translatable": translatable, "line_number": 1, "page_no": page_no,
        "text": text,
    }


def test_render_escapes_and_routes():
    spans = [
        _span(0, "Main Title", kind="header"),
        _span(1, "Hello <script>alert(1)</script> world."),
        _span(2, "item one", kind="list_item"),
        _span(3, "Figure 1: a caption", kind="caption"),
        _span(4, "cell text", kind="table_cell"),
        _span(5, "x = 1", kind="code", translatable=False),
        _span(6, r"E = mc^{2}", kind="formula"),
    ]
    html = render_doc_html("u://1", spans)
    assert html.startswith("<!DOCTYPE html>")
    assert "<script>alert" not in html  # escaped, never raw
    assert "&lt;script&gt;" in html
    assert "<h2>" in html and "<li>" in html and "<figcaption>" in html
    assert "<td>" in html
    assert "<pre><code>" not in html  # non-translatable code dropped
    assert r"\[E = mc^{2}\]" in html


def test_render_page_markers_and_order():
    spans = [
        _span(2, "second", page_no=2),
        _span(0, "first", page_no=1),
        _span(1, "still page one", page_no=1),
    ]
    html = render_doc_html("u://2", spans)
    assert html.index("first") < html.index("still page one") < html.index("second")
    assert html.count("page-marker") == 2  # page 1 → 2 transition only once each


def test_formula_aligned_env():
    assert _format_formula(r"\sum x_i &= 1").startswith(r"\[\begin{aligned}")
    assert _format_formula("a^2").startswith(r"\[")


def test_render_bilingual_spans():
    spans = [_span(0, "Hello world. Good day.")]
    mapping = {"Hello world.": "HALLO WELT.", "Good day.": "GUTEN TAG."}
    html = render_doc_html("u://3", spans, mapping, "empty")
    assert "id='src-0-0'" in html and "id='tgt-0-0'" in html
    assert "HALLO WELT." in html and "GUTEN TAG." in html


def test_render_code_longest_first_and_first_only():
    from docling_translate_ray.stages.render import render_code_html

    content = "# load data\nx = 1\n# load data fast\ny = 2\n# load data\n"
    trans = {
        "# load data": "# 데이터 로드",
        "# load data fast": "# 빠른 데이터 로드",
    }
    html = render_code_html("f.py", content, trans)
    # longest-first: the longer comment got ITS translation, not a partial hit
    assert "# 빠른 데이터 로드" in html
    # first-occurrence-only: exactly one replacement of the short comment
    assert html.count("# 데이터 로드") == 1
    # escaping + line numbers
    assert "<span class='lineno'>5</span>" in html
    content2 = "# a <b> tag\n"
    html2 = render_code_html("g.py", content2, {})
    assert "&lt;b&gt;" in html2 and "<b>" not in html2.split("body>")[1].split("</body")[0]


def test_render_code_stage(docs_text_table, tmp_path):
    import pyarrow.parquet as pq

    import ray.data

    from docling_translate_ray.stages.extract import extract_docs_text_batch
    from docling_translate_ray.stages.render import RenderCodeHtml

    pq.write_table(docs_text_table.slice(0, 24), tmp_path / "dt.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "dt.parquet"))
    docs = ds.map_batches(
        lambda b: extract_docs_text_batch(b).append_column("body", b["body"]),
        batch_format="pyarrow",
    )
    out = docs.map_batches(RenderCodeHtml, batch_format="pyarrow", concurrency=2)
    row = out.take(1)[0]
    assert row["html_render"].startswith("<!DOCTYPE html>")
    assert "code-line" in row["html_render"]


def test_render_stage_over_pipeline(pages_path):
    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8)
    rendered = docs.map_batches(RenderHtml, batch_format="pyarrow", concurrency=2)
    row = rendered.take(1)[0]
    assert row["html_render"].startswith("<!DOCTYPE html>")


def test_render_with_arrow_score_map(pages_path):
    """RenderHtml consumes the Arrow broadcast map end-to-end (bilingual)."""
    from docling_translate_ray.stages import dedup as dd
    from docling_translate_ray.stages.scorer import ScoreSentences

    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8).materialize()
    uniq = dd.unique_sentences(pipe.sentences_of(docs))
    scored = uniq.map_batches(
        ScoreSentences, fn_constructor_kwargs={"engine": "upper"},
        batch_format="pyarrow", concurrency=2,
    )
    ref = dd.broadcast_score_map(scored)
    rendered = docs.map_batches(
        RenderHtml, fn_constructor_kwargs={"map_ref": ref},
        batch_format="pyarrow", concurrency=2,
    )
    row = next(r for r in rendered.take(20) if "tgt-" in r["html_render"])
    assert "id='src-" in row["html_render"] and "id='tgt-" in row["html_render"]


def test_score_join_strategy_matches_broadcast(pages_path):
    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8).materialize()
    via_bcast = {
        r["url"]: r["translated_text"]
        for r in pipe.score_docs(docs, engine="upper", miss_policy="empty",
                                 strategy="broadcast").select_columns(
            ["url", "translated_text"]).take_all()
    }
    via_join = {
        r["url"]: r["translated_text"]
        for r in pipe.score_docs(docs, engine="upper", miss_policy="empty",
                                 strategy="join").select_columns(
            ["url", "translated_text"]).take_all()
    }
    # join is left_outer on docs: urls with no translatable spans get null
    for url, txt in via_bcast.items():
        assert via_join.get(url, "") in (txt, None) and (
            via_join.get(url) == txt or txt == ""
        ), url


# ------------------------------------------------------------- markdown (M18)


def test_render_markdown_extensions():
    """The three reference extensions (text_html_generator.py:24):
    fenced_code, tables, nl2br."""
    from docling_translate_ray.stages.render import render_markdown_html

    md = "\n".join([
        "# Title",
        "",
        "First line",
        "second line",
        "",
        "| colA | colB |",
        "|------|------|",
        "| a1   | b1   |",
        "| a2   | b2   |",
        "",
        "```",
        "code <here>",
        "```",
        "",
        "- item one",
        "- item two",
    ])
    html = render_markdown_html("doc://md", md)
    assert "<h1>Title</h1>" in html
    assert "<p>First line<br/>second line</p>" in html  # nl2br
    assert "<th>colA</th>" in html and "<td>b2</td>" in html  # tables
    assert "<pre><code>code &lt;here&gt;</code></pre>" in html  # fenced, escaped
    assert "<li>item one</li>" in html


def test_render_markdown_translation_probe():
    from docling_translate_ray.stages.render import render_markdown_html

    md = "| h |\n|---|\n| cell |\n\npara"
    html = render_markdown_html(
        "u", md, translations={"cell": "CELL", "para": "PARA"})
    assert "<td>CELL</td>" in html and "<p>PARA</p>" in html
    # identity miss policy: untranslated header stays
    assert "<th>h</th>" in html
    # empty miss policy blanks misses
    html2 = render_markdown_html(
        "u", md, translations={"cell": "CELL"}, miss_policy="empty")
    assert "<p></p>" in html2


def test_render_markdown_heading_without_blank_line_and_no_false_tables():
    from docling_translate_ray.stages.render import render_markdown_html

    html = render_markdown_html("u", "# Title\nBody text")
    assert "<h1>Title</h1>" in html and "<p>Body text</p>" in html
    # a bare '---' after a pipe-bearing paragraph is NOT a table separator
    html2 = render_markdown_html("u", "price 5 | qty 3\n---\nnext para")
    assert "<table>" not in html2
    assert "next para" in html2


def test_render_markdown_single_column_and_consecutive_headings():
    from docling_translate_ray.stages.render import render_markdown_html

    # leading-pipe-only separator: still a valid single-column table
    html = render_markdown_html("u", "| col |\n| ---\n| a |")
    assert "<th>col</th>" in html and "<td>a</td>" in html
    # consecutive headings without blank lines
    html2 = render_markdown_html("u", "# A\n## B\ntext")
    assert "<h1>A</h1>" in html2 and "<h2>B</h2>" in html2
    assert "<p>text</p>" in html2 and "##" not in html2
