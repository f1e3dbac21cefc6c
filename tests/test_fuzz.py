"""Property/fuzz tests (hypothesis) for the pure extraction kernel.

Invariants fuzzed over arbitrary inputs:
* ``extract_page`` never raises — poison bytes become status rows;
* text/code segmenters TILE the content (offsets contract,
  text_parser.py:28-46 analog): span [start,end) ranges are sorted,
  non-overlapping, and concatenating content[start:end] over all spans
  reproduces the input exactly;
* ``segment_html`` span offsets stay in-bounds and ordered;
* ``split_sentences`` loses no non-whitespace characters.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from docling_translate_ray import extract_core as ec

_TEXTY = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=400,
)

_HTMLISH = st.text(
    alphabet=st.sampled_from(list("<>/ab p\n\"'=!-&;#x1")),
    max_size=300,
)


@given(st.binary(max_size=600))
@settings(max_examples=150, deadline=None)
def test_extract_page_never_raises(data):
    rec = ec.extract_page("https://f.example/x", data)
    assert rec["status"].startswith(("ok", "skipped", "error"))
    assert isinstance(rec["extracted_text"], str)


@given(st.sampled_from(["markdown", "python", "c_style", "shell", "config", "plaintext"]),
       _TEXTY)
@settings(max_examples=200, deadline=None)
def test_text_segments_tile_content(doctype, content):
    spans = ec.segment_content(doctype, content)
    pos = 0
    for s in sorted(spans, key=lambda x: x.start):
        assert s.start == pos, (doctype, s)
        assert s.end >= s.start
        assert content[s.start:s.end] == s.text
        pos = s.end
    if spans:
        assert pos == len(content)
    else:
        assert content == "" or doctype == "config" and content == ""


@given(_HTMLISH)
@settings(max_examples=200, deadline=None)
def test_segment_html_offsets_in_bounds(content):
    spans = ec.segment_html(content)
    last = -1
    for s in spans:
        text, start, end = s[0], s[1], s[2]
        assert 0 <= start <= end <= len(content)
        assert start >= last  # reading order
        last = start
        assert isinstance(text, str) and text.strip()


@given(_TEXTY)
@settings(max_examples=200, deadline=None)
def test_split_sentences_preserves_nonspace(text):
    sents = ec.split_sentences(text)
    lost = "".join(text.split())
    got = "".join("".join(s.split()) for s in sents)
    assert got == lost


@given(st.text(alphabet=st.sampled_from(list("ab#|-` \n*:")), max_size=300))
@settings(max_examples=150, deadline=None)
def test_render_markdown_never_raises(md):
    from docling_translate_ray.stages.render import render_markdown_html

    html = render_markdown_html("u", md)
    assert html.startswith("<!DOCTYPE html>") and html.endswith("</html>")


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    import numpy as np

    from docling_translate_ray.functions import multimodal as mm

    img = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (mm.decode_bmp(mm.encode_bmp(img)) == img).all()


@given(_HTMLISH)
@settings(max_examples=150, deadline=None)
def test_fast_mode_never_raises_and_drops_structure(content):
    acc = ec.segment_html(content)
    fast = ec.segment_html(content, speed_mode="fast")
    assert not any(kind in ("table_cell", "caption", "formula")
                   for _, _, _, kind, _, _ in fast)
    # fast never invents spans beyond the accurate parse's block count
    assert len(fast) <= len(acc)
