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


# ---------------------------------------------------------------- round-2 ops


@given(st.lists(st.text(alphabet=st.sampled_from(
    list("abcXYZ09:/?#.@%wW-+=~_ ")), max_size=60), max_size=20))
@settings(max_examples=150, deadline=None)
def test_url_canonicalize_idempotent_fuzz(urls):
    import polars as pl

    from docling_translate_ray.functions.urltools import canonicalize_urls

    once = canonicalize_urls(pl.Series(urls, dtype=pl.String))
    twice = canonicalize_urls(once)
    assert once.to_list() == twice.to_list()
    # canonical form never contains a fragment or query remnant
    for c in once.to_list():
        assert "#" not in c
        assert "?" not in c


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_rep_signals_bounds_fuzz(text):
    import pyarrow as pa

    from docling_translate_ray.functions.text_stats import rep_signals_batch

    out = rep_signals_batch(pa.table({"text": [text]})).to_pylist()[0]
    for k in ("dup_word_frac", "dup_2gram_frac", "top_2gram_frac"):
        assert 0.0 <= out[k] <= 1.0, (k, out)
    assert out["n_words"] >= 0


@given(st.lists(st.text(alphabet=st.sampled_from(list("abc ")), max_size=80),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=10),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=100, deadline=None)
def test_chunk_docs_tiling_fuzz(texts, stride, extra):
    import pyarrow as pa

    from docling_translate_ray.functions.packing import chunk_docs_batch

    window = stride + extra  # always stride <= window
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = chunk_docs_batch(tbl, window=window, stride=stride)
    by_doc: dict[int, list] = {}
    for r in out.to_pylist():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        toks = text.split()
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not toks:
            assert not chunks
            continue
        # stride-prefix tiling reconstructs the token stream exactly
        rebuilt = []
        for r in chunks:
            ctoks = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert len(ctoks) == r["n_chunk_tokens"]
            assert len(ctoks) <= window
            rebuilt.extend(ctoks[:stride])
        assert rebuilt == toks


@given(st.text(max_size=200))
@settings(max_examples=150, deadline=None)
def test_pii_scrub_no_residual_fuzz(text):
    import pyarrow as pa

    from docling_translate_ray.functions.text_stats import (
        PII_EMAIL_RE,
        pii_scrub_batch,
    )

    out = pii_scrub_batch(pa.table({"text": [text]})).to_pylist()[0]
    # no email pattern survives redaction
    import re

    assert not re.search(PII_EMAIL_RE, out["text_redacted"].replace("<EMAIL>", ""))


# ---------------------------------------------------------- crawl classify


@given(st.lists(st.tuples(st.integers(0, 30),      # url id
                          st.integers(0, 3),       # content version
                          st.sampled_from([0, 1])),  # side
                max_size=60))
@settings(max_examples=200, deadline=None)
def test_snapshot_classify_matches_dict_model(rows):
    """functions/crawl._classify_partition == the obvious dict diff, for
    any partition content (urls deduplicated per side, as the operator's
    caller contract guarantees)."""
    import pyarrow as pa

    from docling_translate_ray.functions.crawl import _classify_partition

    seen: dict[tuple[int, int], str] = {}
    for u, v, s in rows:
        seen.setdefault((s, u), f"md5-{v}")
    part = pa.table({
        "url": pa.array([f"u{u}" for (_, u) in seen], pa.string()),
        "md5": pa.array(list(seen.values()), pa.string()),
        "side": pa.array([s for (s, _) in seen], pa.int8()),
    })
    got = {r["url"]: r["change"]
           for r in _classify_partition(part).to_pylist()}
    old = {u: m for (s, u), m in seen.items() if s == 0}
    new = {u: m for (s, u), m in seen.items() if s == 1}
    want = {}
    for u in old.keys() | new.keys():
        if u not in new:
            want[f"u{u}"] = "removed"
        elif u not in old:
            want[f"u{u}"] = "added"
        elif old[u] != new[u]:
            want[f"u{u}"] = "changed"
    assert got == want


# ------------------------------------------------- new-parser totality (r3)


@given(st.text(max_size=800))
@settings(max_examples=200, deadline=None)
def test_parse_robots_total(txt):
    """Any text → a list of non-empty prefixes, never a raise."""
    from docling_translate_ray.functions.crawl import parse_robots

    for agent in ("*", "mybot"):
        out = parse_robots(txt, agent=agent)
        assert isinstance(out, list)
        assert all(isinstance(p, str) and p for p in out)


@given(st.text(max_size=800))
@settings(max_examples=200, deadline=None)
def test_parse_sitemap_total(xml):
    from docling_translate_ray.functions.crawl import parse_sitemap

    out = parse_sitemap(xml)
    assert all(isinstance(u, str) and u for (u, _) in out)
    assert all(isinstance(lm, str) for (_, lm) in out)


@given(st.binary(max_size=1200))
@settings(max_examples=200, deadline=None)
def test_parse_warc_records_total(blob):
    """Arbitrary bytes (incl. gzip-magic prefixes) → a finite list,
    never a raise — the dirty-crawl-data contract."""
    from docling_translate_ray.sources.warc import parse_warc_records

    for rec in parse_warc_records(blob):
        url, ts, body = rec
        assert isinstance(url, str) and isinstance(body, bytes)


@given(st.text(max_size=200), st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_resolve_href_total_and_absolute(base, href):
    """Any (base, href) → None or an absolute http(s) URL when the base
    itself is http(s); never a raise."""
    from docling_translate_ray.functions.graph import resolve_href

    out = resolve_href(base, href)
    assert out is None or isinstance(out, str)
    if out is not None and base.startswith(("http://", "https://")):
        assert out.startswith(("http://", "https://")) or "://" in out


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_warc_writer_roundtrips_arbitrary_payload(body_text):
    """build_warc_bytes(parse) is the identity on any utf-8 payload —
    including payloads containing CRLFCRLF and WARC/ markers (the
    Content-Length framing, not sentinels, delimits records)."""
    import datetime as dt

    from docling_translate_ray.sources import warc

    tricky = body_text + "\r\n\r\nWARC/1.0\r\n"  # embed framing look-alikes
    recs = [("https://t.example/x", dt.datetime(2021, 1, 1),
             tricky.encode("utf-8"))]
    for kw in ({}, {"gzip_per_record": True}):
        assert list(warc.parse_warc_records(
            warc.build_warc_bytes(recs, **kw))) == recs


# --- session-4 surfaces: normalize chain + BPE merge kernel -----------------

@given(st.lists(st.text(max_size=60), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_normalize_expr_idempotent_and_oracle_parity(texts):
    """For ARBITRARY unicode text the polars normalize chain must (a) be
    a fixpoint after one application and (b) agree byte-for-byte with
    the DuckDB oracle expression — the two properties the driver gate
    rests on."""
    import duckdb
    import polars as pl

    from docling_translate_ray.functions.normalize import normalize_expr

    once = (pl.DataFrame({"t": pl.Series(texts, dtype=pl.String)})
            .select(normalize_expr("t").alias("t")))["t"].to_list()
    twice = (pl.DataFrame({"t": pl.Series(once, dtype=pl.String)})
             .select(normalize_expr("t").alias("t")))["t"].to_list()
    assert twice == once
    sql = [r[0] for r in duckdb.connect().execute(
        r"""SELECT trim(regexp_replace(nfc_normalize(regexp_replace(v,
            '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
            ' {2,}', ' ', 'g'), ' ')
            FROM (SELECT unnest(?) v)""", [texts]).fetchall()]
    assert once == sql


@given(st.lists(st.sampled_from(["a", "b", "ab", "c", "中"]),
                min_size=0, max_size=12),
       st.sampled_from([("a", "b"), ("a", "a"), ("ab", "c"), ("b", "a")]))
@settings(max_examples=200, deadline=None)
def test_bpe_merge_word_invariants(syms, pair):
    """merge_word must preserve the concatenation (re-joining the output
    reproduces the input string), never emit an empty symbol, and leave
    no adjacent (a,b) that started inside a replaced window."""
    from docling_translate_ray.functions.bpe import merge_word

    a, b = pair
    out = merge_word(syms, a, b, a + b)
    assert "".join(out) == "".join(syms)
    assert all(s for s in out) or not syms
    # greedy left-to-right: scanning the OUTPUT, an (a, b) adjacency can
    # only remain if its left symbol was itself produced by this merge
    # (e.g. pair (b, a) over "b a b a" -> "ba ba" legitimately contains
    # no raw (b, a)); for the self-pair case specifically, no two
    # adjacent raw 'a's may both have been mergeable
    if a == b:
        for i in range(len(out) - 1):
            assert not (out[i] == a and out[i + 1] == b)


@given(st.lists(st.integers(0, 50), min_size=1, max_size=120))
@settings(max_examples=60, deadline=None)
def test_tercile_pick_rule_matches_quantile_disc(vals):
    """quality_tiers' boundary rule (value at 1-based index
    max(1, ceil(q·n)) over the cumsummed histogram) must equal DuckDB
    quantile_disc for BOTH terciles on any integer multiset — the exact
    float-ceil edge is the risk this fuzz pins."""
    import math

    import duckdb
    import pyarrow as pa

    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(vals, pa.int64())}))
    want = con.execute(
        "SELECT quantile_disc(v, 1.0/3), quantile_disc(v, 2.0/3) FROM t"
    ).fetchone()

    hist: dict[int, int] = {}
    for v in vals:
        hist[v] = hist.get(v, 0) + 1
    values = sorted(hist)
    cums, c = [], 0
    for v in values:
        c += hist[v]
        cums.append(c)
    total = c
    got = tuple(
        next(v for v, cc in zip(values, cums)
             if cc >= max(1, math.ceil(q * total)))
        for q in (1.0 / 3, 2.0 / 3)
    )
    assert got == want


@given(
    st.lists(st.one_of(st.none(),
                       st.text(alphabet=st.sampled_from(list("abc🙂 \t")),
                               max_size=40)),
             min_size=1, max_size=12),
    st.lists(st.tuples(st.sampled_from(list("abc")),
                       st.sampled_from(list("abc"))), max_size=6),
)
@settings(max_examples=60, deadline=None)
def test_bpe_encoder_bounds_fuzz(texts, merges):
    """BPEEncoder totality + bounds on arbitrary text and merge tables:
    every word contributes >=1 and <=len(word) tokens, so
    n_words <= n_bpe_tokens <= n_chars_nonws (0 for empty docs), for ANY
    merge list (including merges of symbols produced by earlier merges)."""
    import pyarrow as pa

    from docling_translate_ray.functions.bpe import BPEEncoder

    # chain some composite merges so multi-char symbols appear
    full_merges = list(merges) + [("ab", "c"), ("a", "bc")]
    enc = BPEEncoder(full_merges)
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = enc(batch)
    for r in out.to_pylist():
        t = texts[r["doc_id"]] or ""
        words = t.split()
        assert r["n_words"] == len(words)
        assert r["n_chars_nonws"] == sum(len(w) for w in words)
        assert len(words) <= r["n_bpe_tokens"] <= r["n_chars_nonws"] \
            or (not words and r["n_bpe_tokens"] == 0)
    # memoized second pass is identical
    assert enc(batch).equals(out)


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=50),
       st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_shard_key_partial_fuzz(ids, hex_digits):
    """train_shards' keying partial: key = md5('shard:'||id) hex, shard
    = its prefix — engine-portable by construction; _w stays in [0,9973)."""
    import hashlib

    import pyarrow as pa

    from docling_translate_ray.functions.shards import _keyed_partial

    batch = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * len(ids), pa.string()),
    })
    out = _keyed_partial("doc_id", "text", "shard", hex_digits, False)(batch)
    for i, r in zip(ids, out.to_pylist()):
        k = hashlib.md5(f"shard:{i}".encode()).hexdigest()
        assert r["key"] == k and r["shard"] == k[:hex_digits]
        assert 0 <= r["_w"] < 9973 and r["n_chars"] == 1


class _FakeDS:
    """Batch-level shim: runs a Dataset operator's map_batches fn
    directly on one pyarrow table (no Ray per hypothesis example)."""

    def __init__(self, t):
        self.t = t

    def select_columns(self, cols):
        return _FakeDS(self.t.select(cols))

    def map_batches(self, fn, **kw):
        return fn(self.t)


@given(st.lists(st.text(alphabet=st.sampled_from(
    list("<>/ab p\n\"'=nav foter li asde&;— ")), max_size=200),
    min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_strip_boilerplate_total_fuzz(htmls):
    import pyarrow as pa

    from docling_translate_ray.functions.boilerplate import strip_boilerplate

    t = pa.table({
        "doc_id": pa.array(range(len(htmls)), pa.int64()),
        "html": pa.array(htmls, pa.string()),
    })
    out = strip_boilerplate(_FakeDS(t))
    assert out.num_rows == len(htmls)          # every doc emits a row
    for r in out.to_pylist():
        assert 0 <= r["n_kept"] <= r["n_blocks"]
        assert isinstance(r["clean_text"], str)
        if r["n_kept"] == 0:
            assert r["clean_text"] == ""


@given(st.lists(st.text(alphabet=st.sampled_from(list("ab \n\t")),
                        max_size=120), min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_trim_repeated_lines_fuzz_matches_dict_model(texts):
    import pyarrow as pa

    from docling_translate_ray.functions.dedup import trim_repeated_lines

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = trim_repeated_lines(_FakeDS(t)).to_pylist()
    for text, r in zip(texts, out):
        lines = text.split("\n") if text else []
        seen: dict[str, None] = {}
        for ln in lines:
            seen.setdefault(ln, None)
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(seen)
        assert r["text_trimmed"] == "\n".join(seen)
        # idempotence through the same kernel
        t2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                       "text": pa.array([r["text_trimmed"]], pa.string())})
        again = trim_repeated_lines(_FakeDS(t2)).to_pylist()[0]
        assert again["text_trimmed"] == r["text_trimmed"]
        assert again["n_lines"] == again["n_kept"]


@given(st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=16))
@settings(max_examples=200, deadline=None)
def test_pq_scale_query_matches_kmeans_quantizer(vec):
    import numpy as np
    import pyarrow as pa

    from docling_translate_ray.functions.knn import _to_int_matrix
    from docling_translate_ray.functions.pq import _scale_query

    t = pa.table({"embedding": pa.array([vec], pa.list_(pa.float64()))})
    expected = _to_int_matrix(t, "embedding")[0]
    got = _scale_query(vec)
    assert np.array_equal(got, expected)


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_decode_png_total(blob):
    # totality: arbitrary bytes either decode or raise ValueError —
    # never crash, hang, or return garbage shapes
    from docling_translate_ray.functions.multimodal import decode_png

    try:
        out = decode_png(b"\x89PNG\r\n\x1a\n" + blob)
    except ValueError:
        return
    assert out.ndim == 3 and out.dtype.name == "uint8"


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_decode_jpeg_total(blob):
    # totality: arbitrary bytes after SOI either decode or ValueError
    from docling_translate_ray.functions.jpeg import decode_jpeg

    try:
        out = decode_jpeg(b"\xFF\xD8" + blob)
    except ValueError:
        return
    assert out.ndim == 3 and out.dtype.name == "uint8"
