"""Table-structure recovery contract (functions/tables.py).

Pins the frozen parser spec: WHATWG first-free-column placement with
rowspan/colspan occupancy, nested-table separation, implicit rows,
unclosed-tag tolerance, span clamping, and the markdown export."""

import pyarrow as pa

from docling_translate_ray.functions import tables as ft


def cells(html):
    return ft.parse_tables(html)


def grid(html):
    """(row, col) -> text for a one-table doc."""
    return {(r, c): t for _i, r, c, _rs, _cs, _h, t in cells(html)}


def test_plain_grid():
    h = ("<table><tr><th>a</th><th>b</th></tr>"
         "<tr><td>1</td><td>2</td></tr></table>")
    got = cells(h)
    assert [(r, c, t) for _i, r, c, _rs, _cs, _h2, t in got] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "1"), (1, 1, "2")]
    assert [hd for *_x, hd, _t in got] == [True, True, False, False]


def test_rowspan_shifts_next_row():
    # rowspan=2 at (0,1): row 1's cells must skip col 1
    h = ("<table><tr><td>a</td><td rowspan=2>b</td><td>c</td></tr>"
         "<tr><td>d</td><td>e</td></tr></table>")
    assert grid(h) == {(0, 0): "a", (0, 1): "b", (0, 2): "c",
                       (1, 0): "d", (1, 2): "e"}


def test_colspan_shifts_same_row():
    h = "<table><tr><td colspan=2>a</td><td>b</td></tr></table>"
    g = cells(h)
    assert [(r, c, cs, t) for _i, r, c, _rs, cs, _h2, t in g] == [
        (0, 0, 2, "a"), (0, 2, 1, "b")]


def test_rowspan_and_colspan_combined():
    # 2x2 block at (0,0): rows 0 and 1 both skip cols 0-1
    h = ("<table><tr><td rowspan=2 colspan=2>x</td><td>a</td></tr>"
         "<tr><td>b</td></tr><tr><td>c</td></tr></table>")
    assert grid(h) == {(0, 0): "x", (0, 2): "a", (1, 2): "b", (2, 0): "c"}


def test_stacked_rowspans_accumulate():
    # cascading rowspans: each row contributes a new spanning col
    h = ("<table><tr><td rowspan=3>a</td><td>b</td><td>c</td></tr>"
         "<tr><td rowspan=2>d</td><td>e</td></tr>"
         "<tr><td>f</td></tr></table>")
    assert grid(h) == {(0, 0): "a", (0, 1): "b", (0, 2): "c",
                       (1, 1): "d", (1, 2): "e", (2, 2): "f"}


def test_nested_table_is_separate_and_text_not_duplicated():
    h = ("<table><tr><td>outer <table><tr><td>inner</td></tr></table>"
         " tail</td></tr></table>")
    got = cells(h)
    by_idx = {}
    for i, r, c, _rs, _cs, _h2, t in got:
        by_idx.setdefault(i, []).append((r, c, t))
    assert by_idx[1] == [(0, 0, "inner")]
    assert by_idx[0] == [(0, 0, "outer tail")]


def test_implicit_row_and_unclosed_cells():
    h = "<table><td>a<td>b<tr><td>c</table>"
    assert grid(h) == {(0, 0): "a", (0, 1): "b", (1, 0): "c"}


def test_truncated_table_flushes_at_eof():
    h = "<table><tr><td>a</td><td>b"
    assert grid(h) == {(0, 0): "a", (0, 1): "b"}


def test_span_clamping_and_junk_attrs():
    h = ('<table><tr><td rowspan=0 colspan="999999">a</td>'
         "<td rowspan=junk>b</td></tr></table>")
    got = cells(h)
    assert got[0][3] == 1 and got[0][4] == ft.MAX_SPAN
    assert got[1][3] == 1  # junk attr -> default 1


def test_text_normalization_strips_tags_entities_ws():
    h = "<table><tr><td> a &amp;  <b>bold</b>\n x </td></tr></table>"
    assert grid(h) == {(0, 0): "a & bold x"}


def test_script_style_comment_stripped():
    h = ("<table><tr><td><script>var t='<td>no</td>';</script>"
         "<!-- <td>c</td> -->keep</td></tr></table>")
    assert grid(h) == {(0, 0): "keep"}


def test_tr_td_outside_table_ignored():
    assert cells("<tr><td>stray</td></tr>") == []


def test_uppercase_tags():
    h = "<TABLE><TR><TD>a</TD></TR></TABLE>"
    assert grid(h) == {(0, 0): "a"}


def test_tables_batch_binary_and_multiple_tables():
    batch = pa.table({
        "url": ["u1", "u2"],
        "html": pa.array(
            [b"<table><tr><td>x</td></tr></table>"
             b"<table><tr><td>y</td></tr></table>", b"no tables"],
            pa.binary()),
    })
    out = ft.tables_batch(batch)
    assert out["url"].to_pylist() == ["u1", "u1"]
    assert out["table_idx"].to_pylist() == [0, 1]
    assert out["text"].to_pylist() == ["x", "y"]


def test_table_to_markdown_spans_repeat():
    h = ("<table><tr><th>h1</th><th colspan=2>h2</th></tr>"
         "<tr><td rowspan=2>a</td><td>b</td><td>c</td></tr>"
         "<tr><td>d</td><td>e</td></tr></table>")
    md = ft.table_to_markdown(cells(h))
    assert md.splitlines() == [
        "| h1 | h2 | h2 |",
        "| --- | --- | --- |",
        "| a | b | c |",
        "| a | d | e |",
    ]


def test_extract_tables_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "url": ["a", "b"],
        "html": ["<table><tr><td>1</td><td>2</td></tr></table>", ""],
    }))
    out = ft.extract_tables(ds).to_pandas()
    assert sorted(zip(out["url"], out["col"], out["text"])) == [
        ("a", 0, "1"), ("a", 1, "2")]


def test_mixed_case_table_tag_not_skipped():
    # the fast-path sniff must be as case-insensitive as the tag scanner
    assert cells("<tAbLe><tr><td>A</td></tr></tAbLe>") == \
        [(0, 0, 0, 1, 1, False, "A")]
