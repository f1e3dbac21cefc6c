"""Driver-contract query pipelines (``__ray_entry__.queries()`` bodies).

Each function takes ``sf_dir`` (a directory of the driver's synthetic
parquet tables, TESTDATA.md) and returns a Ray ``Dataset`` or a small
``pyarrow.Table``.  Where a DuckDB oracle exists (``__ray_entry__.
oracle_sql()``), column names AND value semantics here are kept in lockstep
with the SQL:

* float-valued aggregates are computed as **scaled-integer sums** (cents /
  1e-4 units) so the driver's value-hash compare is exact — a distributed
  float sum is order-dependent in the last ulps, an int64 sum is not;
* sorts that feed a LIMIT break ties on the group key;
* every aggregation uses the partial-per-batch → final-per-group pattern
  (combiner before the shuffle, SURVEY.md §4) so the groupby exchanges one
  row per (batch, key), not one per input row.

None of these functions calls ``ray.init``; the caller owns the session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_translate_ray import corpus
from docling_translate_ray.functions import dedup as fdedup
from docling_translate_ray.functions import knn as fknn
from docling_translate_ray.functions import multimodal as fmm
from docling_translate_ray.functions import text_stats as fts
from docling_translate_ray.stages import dedup as sdedup
from docling_translate_ray.stages.extract import (
    explode_spans_batch,
    extract_batch,
    extract_docs_text_batch,
)


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _collect(ds) -> pa.Table:
    """Materialize a SMALL dataset to one Arrow table (driver-side only)."""
    from docling_translate_ray.util import collect_to_table

    return collect_to_table(ds)


# ------------------------------------------------------------------ extraction
# The flagship path: wrap each `documents` row as an input_hint-shaped HTML
# page (deterministic — corpus.doc_row_to_page_html), run the real extraction
# kernel, compare byte-identically against a string-built DuckDB oracle.


def wrap_documents_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    return pa.table(
        {
            "url": pa.array([f"doc://{i}" for i in ids], pa.string()),
            "html": pa.array(
                [
                    corpus.doc_row_to_page_html(i, t or "", l or "").encode("utf-8")
                    for i, t, l in zip(ids, texts, langs)
                ],
                pa.binary(),
            ),
            "lang": pa.array([l or "" for l in langs], pa.string()),
        }
    )


def _wrapped_docs(sf_dir: str):
    pages = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        wrap_documents_batch, batch_format="pyarrow"
    )
    return pages.map_batches(extract_batch, batch_format="pyarrow")


def q_extract_pages(sf_dir: str):
    """Byte-identical extracted text per url (the north-rule invariant)."""
    return _wrapped_docs(sf_dir).select_columns(
        ["url", "status", "extracted_text", "n_chars"]
    )


def q_warc_extract(sf_dir: str):
    """The Common-Crawl first mile end-to-end: wrap each document's page
    html into WARC/1.0 response records (gzip member per record, the CC
    layout), write segment files, ``read_warc`` them back as input_hint
    pages, and run the SAME extraction DAG — byte-identical to
    extract_pages, proving the WARC source is a transparent surface."""
    import datetime as _dt
    import os
    import shutil
    import tempfile
    import uuid

    from docling_translate_ray.sources.warc import build_warc_bytes, read_warc

    tmp = tempfile.mkdtemp(prefix="dtr_warc_")
    try:
        ts = _dt.datetime(2017, 3, 6, 4, 3, 53)

        def write_segment(batch: pa.Table) -> pa.Table:
            recs = [
                (f"doc://{i}", ts,
                 corpus.doc_row_to_page_html(i, t or "", l or "").encode("utf-8"))
                for i, t, l in zip(batch["doc_id"].to_pylist(),
                                   batch["text"].to_pylist(),
                                   batch["lang"].to_pylist())
            ]
            blob = build_warc_bytes(recs, gzip_per_record=True)
            with open(os.path.join(tmp, f"seg-{uuid.uuid4().hex}.warc.gz"),
                      "wb") as f:
                f.write(blob)
            return pa.table({"n": pa.array([len(recs)], pa.int64())})

        _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
            write_segment, batch_format="pyarrow").materialize()
        out = (
            read_warc(tmp)
            .select_columns(["url", "html", "lang"])
            .map_batches(extract_batch, batch_format="pyarrow")
            .select_columns(["url", "status", "extracted_text", "n_chars"])
        )
        # pin before the segment files vanish
        return _collect(out).sort_by("url")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_wet_roundtrip(sf_dir: str):
    """The Common-Crawl LAST mile: write each document's text as WET
    segments (WARC/1.0 ``conversion`` records, gzip member per record —
    the format CC publishes extracted text in), ``read_wet`` them back,
    and return ``(url, text, n_chars)`` — byte fidelity of the
    text-output interchange surface (``sources/warc.py`` WET half, the
    output leg matching ``warc_extract``'s input leg)."""
    import datetime as _dt
    import shutil
    import tempfile

    import polars as pl

    from docling_translate_ray.sources.warc import read_wet, write_wet

    tmp = tempfile.mkdtemp(prefix="dtr_wet_")
    try:
        ts = _dt.datetime(2017, 3, 6, 4, 3, 53)

        def to_rows(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            return (
                df.select(
                    ("doc://" + pl.col("doc_id").cast(pl.String))
                    .alias("url"),
                    pl.lit(ts).cast(pl.Datetime("us")).alias("warc_ts"),
                    pl.col("text").fill_null("").alias("text"),
                ).to_arrow()
            )

        write_wet(_read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            to_rows, batch_format="pyarrow"), tmp)

        def with_len(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(["url", "text"]))
            return df.with_columns(
                pl.col("text").str.len_chars().cast(pl.Int64)
                .alias("n_chars")).to_arrow()

        return _collect(read_wet(tmp).map_batches(
            with_len, batch_format="pyarrow")).sort_by("url")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_jsonl_roundtrip(sf_dir: str):
    """The corpus-interchange surface: shard the documents table out as
    gzipped JSON-Lines (the format LLM corpora ship in — Pile /
    RedPajama / Dolma), ``read_jsonl`` it back with an explicit schema,
    and return ``(doc_id, lang, text, n_chars)`` — value fidelity of
    the NDJSON writer/parser pair including nulls and escapes
    (``sources/jsonl.py``; vectorized polars write / pyarrow C++ read,
    no per-row json in either direction)."""
    import shutil
    import tempfile

    import polars as pl

    from docling_translate_ray.sources.jsonl import read_jsonl, write_jsonl

    tmp = tempfile.mkdtemp(prefix="dtr_jsonl_")
    try:
        write_jsonl(_read(sf_dir, "documents", ["doc_id", "lang", "text"]),
                    tmp)
        schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                            ("text", pa.string())])

        def with_len(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch)
            return df.with_columns(
                pl.col("text").fill_null("").str.len_chars().cast(pl.Int64)
                .alias("n_chars")).to_arrow()

        return _collect(read_jsonl(tmp, schema=schema).map_batches(
            with_len, batch_format="pyarrow")).sort_by("doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def pdf_pages_batch(batch: pa.Table) -> pa.Table:
    """input_hint-shaped pages whose payloads are REAL PDFs (pdf_core
    writer, FlateDecode): a title line ``doc <id>`` then the 8-word-
    wrapped text lines, 12pt apart — emitted in REVERSED order so the
    extraction result depends on pdf_core's (−y, x) reading-order sort,
    not on stream order."""
    from docling_translate_ray import pdf_core

    urls, blobs = [], []
    for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = (t or "").split()
        lines = [" ".join(toks[j:j + 8]) for j in range(0, len(toks), 8)]
        runs = [(72.0, 720.0, f"doc {i}")] + [
            (72.0, 720.0 - 12.0 * (k + 1), ln) for k, ln in enumerate(lines)
        ]
        runs.reverse()
        urls.append(f"pdf://{i}")
        blobs.append(pdf_core.build_pdf([runs], compress=True))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(blobs, pa.binary()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })


def q_pdf_extract(sf_dir: str):
    """PDF lane end-to-end (the north rule's layout-parse path): build a
    real Flate-compressed PDF per doc, run the SAME extraction DAG as the
    html pages, and compare the reading-order text byte-identically."""
    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        pdf_pages_batch, batch_format="pyarrow"
    )
    return pages.map_batches(extract_batch, batch_format="pyarrow") \
        .select_columns(["url", "status", "extracted_text", "n_chars"])


def docx_pages_batch(batch: pa.Table) -> pa.Table:
    """input_hint-shaped pages whose payloads are REAL DOCX packages
    (ooxml_core writer, zip + WordprocessingML): a Heading1 title
    paragraph ``doc <id>`` then one paragraph per 8-word-wrapped text
    line — each multi-word paragraph split into two runs, so the
    result depends on the reader's run concatenation."""
    from docling_translate_ray import ooxml_core

    urls, blobs = [], []
    for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = (t or "").split()
        lines = [" ".join(toks[j:j + 8]) for j in range(0, len(toks), 8)]
        urls.append(f"docx://{i}")
        blobs.append(ooxml_core.build_docx(
            [(f"doc {i}", "Heading1")] + lines))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(blobs, pa.binary()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })


def q_docx_extract(sf_dir: str):
    """DOCX lane end-to-end (reference core.py:119-134 allowed_formats):
    build a real zip+XML DOCX per doc, run the SAME extraction DAG as
    html/pdf pages, compare the paragraph text byte-identically."""
    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        docx_pages_batch, batch_format="pyarrow"
    )
    return pages.map_batches(extract_batch, batch_format="pyarrow") \
        .select_columns(["url", "status", "extracted_text", "n_chars"])


def pptx_pages_batch(batch: pa.Table) -> pa.Table:
    """Pages whose payloads are REAL PPTX packages: the title paragraph
    ``doc <id>`` opens slide 1, then 4 wrapped lines per slide — and the
    writer emits slide entries in REVERSED zip order, so the extraction
    result depends on the reader's NUMERIC slide sort."""
    from docling_translate_ray import ooxml_core

    urls, blobs = [], []
    for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = (t or "").split()
        lines = [" ".join(toks[j:j + 8]) for j in range(0, len(toks), 8)]
        slides = [[f"doc {i}"] + lines[:4]]
        slides += [lines[j:j + 4] for j in range(4, len(lines), 4)]
        urls.append(f"pptx://{i}")
        blobs.append(ooxml_core.build_pptx(slides))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(blobs, pa.binary()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })


def q_pptx_extract(sf_dir: str):
    """PPTX lane end-to-end: real PresentationML packages through the
    SAME extraction DAG; slide order must be recovered numerically."""
    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        pptx_pages_batch, batch_format="pyarrow"
    )
    return pages.map_batches(extract_batch, batch_format="pyarrow") \
        .select_columns(["url", "status", "extracted_text", "n_chars"])


def table_pages_batch(batch: pa.Table) -> pa.Table:
    """Pages carrying a planted 5-row × 4-col HTML table whose span
    layout is a pure function of doc_id, so the SQL oracle can replay
    the WHATWG grid placement algebraically: a header row of <th>,
    one rowspan=2 cell at (rr = 1 + doc_id%2, cr = doc_id%4) — whose
    shadow displaces row rr+1 — and one colspan=2 cell in row 4 at
    source position cc = doc_id%3.  Cell text is ``d<id>.<row>.<k>``
    (k = source ordinal), so resolved coordinates are the ONLY thing
    the parser can get wrong."""
    urls, blobs = [], []
    for i in batch["doc_id"].to_pylist():
        rr, cr, cc = 1 + i % 2, i % 4, i % 3
        rows = ["".join(f"<th>d{i}.0.{k}</th>" for k in range(4))]
        for r in range(1, 4):
            if r == rr:
                rows.append("".join(
                    f"<td{' rowspan=2' if k == cr else ''}>d{i}.{r}.{k}</td>"
                    for k in range(4)))
            elif r == rr + 1:
                rows.append("".join(
                    f"<td>d{i}.{r}.{k}</td>" for k in range(3)))
            else:
                rows.append("".join(
                    f"<td>d{i}.{r}.{k}</td>" for k in range(4)))
        rows.append("".join(
            f"<td{' colspan=2' if k == cc else ''}>d{i}.4.{k}</td>"
            for k in range(3)))
        body = "".join(f"<tr>{r}</tr>" for r in rows)
        urls.append(f"table://{i}")
        blobs.append(f"<html><body><table>{body}</table></body></html>"
                     .encode())
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(blobs, pa.binary()),
    })


def q_table_extract(sf_dir: str):
    """Table-structure recovery (functions/tables.py — the Docling
    TableFormer slot, reference core.py:93-117): planted span layouts
    through the grid parser; every resolved (row, col, rowspan,
    colspan) must match the oracle's algebraic replay."""
    from docling_translate_ray.functions import tables as ftab

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        table_pages_batch, batch_format="pyarrow"
    )
    return ftab.extract_tables(pages)


def q_sentences(sf_dir: str):
    """Sentence explosion of the extracted docs (M9 analog)."""
    from docling_translate_ray.stages.extract import explode_sentences_batch

    return (
        _wrapped_docs(sf_dir)
        .map_batches(explode_sentences_batch, batch_format="pyarrow")
        .select_columns(["url", "sentence"])
    )


def q_unique_sentences(sf_dir: str):
    """Exact sentence dedup (A1 analog): distinct sentence strings."""
    from docling_translate_ray.stages.extract import explode_sentences_batch

    sent = _wrapped_docs(sf_dir).map_batches(
        explode_sentences_batch, batch_format="pyarrow"
    )
    return sdedup.unique_sentences(sent).select_columns(["sentence"])


def q_score_upper(sf_dir: str):
    """Phase-2 dedup→score→join-back with the `upper` engine (J1/J2).

    Broadcast strategy consumes docs twice (unique-build + probe), so pin
    the extraction result once — the query-scale analog of the job's
    durable docs read-back (pipelines/extract.py run_extract_job)."""
    from docling_translate_ray.pipelines.extract import score_docs

    docs = _wrapped_docs(sf_dir).materialize()
    scored = score_docs(docs, engine="upper", miss_policy="empty", strategy="broadcast")
    return scored.select_columns(["url", "translated_text"])


def q_docs_text_segments(sf_dir: str):
    """Text/code segmenter family (M1-M7) over the deterministic fixture
    corpus; spans table out.  Golden-file tests freeze exact offsets; here
    the driver records the rows-only check."""
    import ray.data

    tbl = corpus.gen_docs_text(240, seed=43)
    ds = ray.data.from_arrow(tbl)
    docs = ds.map_batches(extract_docs_text_batch, batch_format="pyarrow")
    return docs.map_batches(explode_spans_batch, batch_format="pyarrow").select_columns(
        ["url", "seg_id", "start", "end", "kind", "translatable", "line_number"]
    )


def q_extract_lineage(sf_dir: str):
    """Full checkpointed job: extract wrapped docs → bucketed parquet +
    per-partition lineage; returns the lineage table (A3/A5 analog)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.state import checkpoint as ckpt

    work = tempfile.mkdtemp(prefix="dtr_lineage_")
    try:
        pages_dir = os.path.join(work, "pages")
        os.makedirs(pages_dir)
        pages = _collect(
            _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
                wrap_documents_batch, batch_format="pyarrow"
            )
        )
        pq.write_table(pages, os.path.join(pages_dir, "pages.parquet"))
        out = os.path.join(work, "out")
        run_extract_job(pages_dir, out, n_buckets=16)
        ldir = ckpt.lineage_dir(out)
        files = [os.path.join(ldir, f) for f in os.listdir(ldir)]
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        return tbl.drop_columns(["run_id", "failure_urls"]).sort_by("bucket")
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ------------------------------------------------------------------ dedup family


def q_exact_dedup(sf_dir: str):
    # hash_mode="md5": the oracle replays md5(text) in DuckDB; production
    # callers (curate/webcurate) take the xx64 default
    return fdedup.exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]),
                              hash_mode="md5")


def q_minhash_near_dup(sf_dir: str):
    return fdedup.minhash_lsh_dedup(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.7
    )


def q_dedup_keep_best(sf_dir: str):
    """Quality-retention fuzzy dedup (functions/dedup.dedup_keep_best):
    near-dup clusters via the MinHash-LSH closure, then keep the LONGEST
    member per cluster (whitespace tokens, ties → min id) plus every
    non-clustered doc — the Dolma/FineWeb retention policy, vs
    minhash_near_dup's min-id canonical labeling."""
    return fdedup.dedup_keep_best(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.7
    )


def incoming_snapshot_batch(batch: pa.Table) -> pa.Table:
    """Deterministic 'next crawl snapshot' view: every ``doc_id % 5 == 0``
    document re-crawled unchanged, ids offset into a disjoint space (the
    oracle rebuilds the same view in SQL — cf. plant_embedding_twins_batch)."""
    ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
    out = batch.filter(pa.array(ids % 5 == 0))
    return pa.table({
        "doc_id": pa.array(
            np.asarray(out["doc_id"].to_pylist(), dtype=np.int64) + 10_000_000,
            pa.int64()),
        "text": out["text"],
    })


def q_minhash_index_probe(sf_dir: str):
    """Incremental crawl dedup: build the persistent MinHash-LSH index over
    the corpus ONCE (band rows + doc store, hash-partitioned parquet), then
    probe the next snapshot against it with pruned partition reads — the
    corpus is never rescanned.  Output: verified cross pairs
    ``(index_id, new_id)`` at exact 3-gram Jaccard ≥ 0.7; every re-crawled
    doc matches its own indexed copy (J=1), so the row set is non-vacuous
    by construction."""
    import shutil
    import tempfile

    corpus_ds = _read(sf_dir, "documents", ["doc_id", "text"])
    incoming = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        incoming_snapshot_batch, batch_format="pyarrow"
    )
    tmp = tempfile.mkdtemp(prefix="dtr_mhidx_")
    try:
        fdedup.build_minhash_index(corpus_ds, tmp)
        out = fdedup.minhash_index_probe(incoming, tmp, threshold=0.7)
        # small verified-pair table; pin it before the index dir vanishes
        return _collect(out).sort_by([("index_id", "ascending"),
                                      ("new_id", "ascending")])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_simhash_near_dup(sf_dir: str):
    return fdedup.simhash_near_dup(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_ngram_jaccard(sf_dir: str):
    """Exact all-pairs 3-gram Jaccard ≥ 0.8 (integer-exact threshold)."""
    return fdedup.ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold_pct=80
    )


def lineq_docs_batch(batch: pa.Table) -> pa.Table:
    """Docs whose lines exercise every line-quality rule: 8-token
    wraps where line (i+j) ≡0 (mod 7) is truncated to ONE token
    (min-words rule), ≡0 (mod 5) gets a shouty 'LOUD NOISE ' prefix
    (caps rule), and the suffix cycles ' fin.' / ' fin!' / ' fin'
    (terminal-punctuation rule).  The oracle rebuilds the SAME lines
    and replays the three predicates — rule replay, not planted
    truth."""
    ids, texts = [], []
    for i, t in zip(batch["doc_id"].to_pylist(),
                    batch["text"].to_pylist()):
        toks = (t or "").split()
        lines = []
        for j in range((len(toks) + 7) // 8):
            seg = toks[j * 8:(j + 1) * 8]
            if (i + j) % 7 == 0:
                seg = seg[:1]
            line = (("LOUD NOISE " if (i + j) % 5 == 0 else "")
                    + " ".join(seg)
                    + [" fin.", " fin!", " fin"][(i + j) % 3])
            lines.append(line)
        ids.append(i)
        texts.append("\n".join(lines))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def q_line_quality_trim(sf_dir: str):
    """C4 line-quality rules (functions/dedup.line_quality_trim):
    terminal punctuation + min-words + not-shouty per line, document
    reassembly, zero exchanges; the oracle replays the predicates over
    identically constructed lines."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lineq_docs_batch, batch_format="pyarrow"
    )
    return fdedup.line_quality_trim(docs)


def recip_edges_batch(batch: pa.Table) -> pa.Table:
    """Host-graph edges with planted reciprocity: docs ≡0 (mod 3) link
    h<i%40>→h<(i+1)%40>, docs ≡1 link the REVERSE of the same pair
    (making {k, k+1} pairs reciprocal), docs ≡2 link h<i%40>→h<(i+7)%40>
    (one-directional)."""
    src, dst = [], []
    for i in batch["doc_id"].to_pylist():
        a, b, c = f"h{i % 40}", f"h{(i + 1) % 40}", f"h{(i + 7) % 40}"
        if i % 3 == 0:
            src.append(a), dst.append(b)
        elif i % 3 == 1:
            src.append(b), dst.append(a)
        else:
            src.append(a), dst.append(c)
    return pa.table({
        "src_host": pa.array(src, pa.string()),
        "dst_host": pa.array(dst, pa.string()),
    })


def q_link_reciprocity(sf_dir: str):
    """Link-farm signal (functions/graph.link_reciprocity): per-host
    distinct out-neighbours, reciprocated count and integer percent
    over a planted host graph with known reciprocal pairs."""
    from docling_translate_ray.functions.graph import link_reciprocity

    edges = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        recip_edges_batch, batch_format="pyarrow"
    )
    return link_reciprocity(edges)


_LANGMIX_LINES = {
    "en": "the and of to a in is that it for",
    "de": "der die das und ist nicht ein zu mit von",
    "fr": "le la les et est un une de que pour",
    "es": "el la los y es un una de que para",
}


def langmix_docs_batch(batch: pa.Table) -> pa.Table:
    """Docs with PLANTED per-line languages: doc i has 4 + i%5 lines;
    line j is the full stopword line of ['en','de','fr','es'][(i+j)%4]
    (decisively that language under the frozen LangId chain) unless
    (i+j)%7 ≥ 4, which plants an 'und' line.  The oracle replays the
    planted truth closed-form; the langid CHAIN itself stays
    oracle-checked by the legacy langid entry."""
    order = ["en", "de", "fr", "es"]
    ids, texts = [], []
    for i in batch["doc_id"].to_pylist():
        lines = []
        for j in range(4 + i % 5):
            if (i + j) % 7 >= 4:
                lines.append("qqq zzz xxx")
            else:
                lines.append(_LANGMIX_LINES[order[(i + j) % 4]])
        ids.append(i)
        texts.append("\n".join(lines))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def q_lang_mix(sf_dir: str):
    """Mixed-language detection (functions/text_stats.lang_mix): the
    per-line LangId vote over planted multilingual docs; plurality,
    tie-break, pct and the mixed flag replayed closed-form."""
    from docling_translate_ray.functions.text_stats import lang_mix

    docs = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        langmix_docs_batch, batch_format="pyarrow"
    )
    return lang_mix(docs)


def feed_docs_batch(batch: pa.Table) -> pa.Table:
    """Per-host feed documents: even docs are RSS 2.0 (3 linked items
    + one linkless item the parser must skip), odd docs are Atom (2
    entries with href links); every field is closed-form in (doc_id,
    item ordinal) for the oracle."""
    hosts, xmls = [], []
    for i in batch["doc_id"].to_pylist():
        host = f"feed{i % 31}.example"
        if i % 2 == 0:
            items = "".join(
                f"<item><title>post {i} {j}</title>"
                f"<link>https://{host}/post/{i}/{j}</link>"
                f"<pubDate>2024-0{1 + j % 9}-0{1 + i % 9}</pubDate></item>"
                for j in range(3))
            items += "<item><title>teaser without link</title></item>"
            xml = (f'<?xml version="1.0"?><rss version="2.0"><channel>'
                   f"<title>chan {i}</title>{items}</channel></rss>")
        else:
            xml = ('<feed xmlns="http://www.w3.org/2005/Atom">'
                   f"<title>feed {i}</title>" + "".join(
                       f"<entry><title>post {i} {j}</title>"
                       f'<link href="https://{host}/post/{i}/{j}"/>'
                       f"<updated>2024-0{1 + j % 9}-0{1 + i % 9}</updated>"
                       f"</entry>" for j in range(2)) + "</feed>")
        hosts.append(host)
        xmls.append(xml)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "feed_xml": pa.array(xmls, pa.string()),
    })


def q_feed_seeds(sf_dir: str):
    """RSS/Atom feed discovery lane (functions/crawl.feed_seeds — the
    fourth frontier surface next to sitemaps/links/history): planted
    two-dialect feeds, linkless items skipped, fields replayed
    closed-form by the oracle."""
    from docling_translate_ray.functions.crawl import feed_seeds

    docs = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        feed_docs_batch, batch_format="pyarrow"
    )
    return feed_seeds(docs)


def jsonld_pages_batch(batch: pa.Table) -> pa.Table:
    """Pages carrying planted JSON-LD: odd docs get an INVALID block
    first (trailing comma — the parse must skip it without shifting
    the valid block's ordinal), then every doc gets one well-formed
    NewsArticle block whose field values are closed-form in doc_id so
    the oracle rebuilds the same JSON and extracts with DuckDB's JSON
    kernel."""
    urls, blobs = [], []
    for i in batch["doc_id"].to_pylist():
        blk = ('{"@type": "NewsArticle", "headline": "doc %d headline", '
               '"datePublished": "201%d-0%d-15", '
               '"author": {"name": "author %d"}}'
               % (i, i % 10, 1 + i % 9, i % 13))
        bad = ('<script type="application/ld+json">'
               '{"@type": "Broken",}</script>' if i % 2 else "")
        urls.append(f"ld://{i}")
        blobs.append(
            f'<html><head>{bad}<script type="application/ld+json">'
            f"{blk}</script></head><body>doc {i}</body></html>")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(blobs, pa.string()),
    })


def q_jsonld_meta(sf_dir: str):
    """Structured-data extraction (functions/structured.extract_jsonld
    — the extruct/schema.org slot): planted Article blocks, invalid
    JSON skipped, field ladders replayed by the oracle through
    DuckDB's json_extract_string over the SAME constructed blocks."""
    from docling_translate_ray.functions.structured import extract_jsonld

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        jsonld_pages_batch, batch_format="pyarrow"
    )
    return extract_jsonld(pages)


def mirror_pages_batch(batch: pa.Table) -> pa.Table:
    """Mirror-corpus plant: doc pairs (2k, 2k+1) serve IDENTICAL
    content from two different hosts (h<2k%40> / h<2k+1%40>), so every
    even/odd host pair is a full mirror; content is closed-form in
    doc_id for the oracle."""
    urls, texts = [], []
    for i in batch["doc_id"].to_pylist():
        urls.append(f"https://h{i % 40}.example/p/{i}")
        texts.append(f"mirror content {i // 2}")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "text": pa.array(texts, pa.string()),
    })


def q_mirror_hosts(sf_dir: str):
    """Content-based mirror detection (functions/mirrors.mirror_hosts):
    shared-fingerprint host pairs with the boilerplate host-cap fence
    and the containment pct gate; md5 mode so the oracle replays the
    fingerprints."""
    from docling_translate_ray.functions.mirrors import mirror_hosts

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        mirror_pages_batch, batch_format="pyarrow"
    )
    return mirror_hosts(pages, min_shared=3, min_pct=50, algo="md5")


def trap_pages_batch(batch: pa.Table) -> pa.Table:
    """Crawl-trap plant: even docs form one exploding calendar pattern,
    docs ≡1 (mod 10) spread thinly over 3 hosts (below threshold), the
    rest form a second exploding pattern with two digit runs."""
    urls = []
    for i in batch["doc_id"].to_pylist():
        if i % 2 == 0:
            urls.append(f"https://cal.example/day/{i}/view")
        elif i % 10 == 1:
            urls.append(f"https://s{i % 3}.example/item?id={i}")
        else:
            urls.append(f"https://long.example/p{i}-{i * 7}")
    return pa.table({"url": pa.array(urls, pa.string())})


def q_url_traps(sf_dir: str):
    """URL-pattern crawl-trap detection
    (functions/mirrors.url_pattern_traps): digit runs collapse to N,
    (host, pattern) counts above the trap threshold."""
    from docling_translate_ray.functions.mirrors import url_pattern_traps

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        trap_pages_batch, batch_format="pyarrow"
    )
    return url_pattern_traps(pages, min_pages=100)


def q_hash_embed(sf_dir: str):
    """Feature-hash embedder (functions/embed.hash_embed — the
    deterministic text→vector bridge into the ANN/SemDeDup family):
    sparse signed md5-bucket counts per document, integer-exact so the
    oracle replays dim and sign from the same hex digest."""
    from docling_translate_ray.functions.embed import hash_embed

    return hash_embed(_read(sf_dir, "documents", ["doc_id", "text"]))


def para_docs_batch(batch: pa.Table) -> pa.Table:
    """Paragraph-structured docs for the CCNet dedup rule: a shared
    boilerplate paragraph (7 distinct strings across the corpus — the
    cross-doc duplicates the dedup must collapse to their first global
    occurrence) followed by the doc's tokens wrapped into 16-word
    paragraphs, joined by blank lines.  The oracle rebuilds the SAME
    structure from the tokens."""
    urls, texts = [], []
    for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = (t or "").split()
        paras = [f"boilerplate notice {i % 7}"] + [
            " ".join(toks[j:j + 16]) for j in range(0, len(toks), 16)]
        urls.append(i)
        texts.append("\n\n".join(paras))
    return pa.table({
        "doc_id": pa.array(urls, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def q_paragraph_dedup(sf_dir: str):
    """CCNet-style paragraph dedup (functions/dedup.paragraph_dedup):
    keep only the globally first (min doc_id, para_no) occurrence of
    every distinct paragraph; md5 fingerprint mode so the oracle's
    ``row_number() OVER (PARTITION BY md5(para))`` replays the winner
    rule exactly."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        para_docs_batch, batch_format="pyarrow"
    )
    return fdedup.paragraph_dedup(docs, hash_mode="md5")


def q_line_dedup(sf_dir: str):
    """C4-style line-level dedup: docs wrapped into deterministic 8-word
    lines, lines occurring in ≥2 distinct docs dropped, survivors
    reassembled in order (functions/dedup.line_dedup)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fdedup.wrap_words_as_lines, batch_format="pyarrow",
        fn_kwargs={"words_per_line": 8},
    )
    return fdedup.line_dedup(docs, min_docs=2)


def synth_url_variants_batch(batch: pa.Table) -> pa.Table:
    """Deterministic crawl-variant URLs for the `documents` rows (the
    oracle builds the SAME strings in SQL): every group of 4 consecutive
    doc_ids yields 4 surface variants (clean / upper+www+query /
    default-port+fragment / www+trailing-slash) of one canonical URL."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id"]))
    out = df.with_columns(
        (pl.col("doc_id") // 4).alias("_g"), (pl.col("doc_id") % 4).alias("_v")
    ).with_columns(
        ((pl.col("_g") % 97).cast(pl.String)).alias("_s"),
        pl.col("_g").cast(pl.String).alias("_gs"),
    ).with_columns(
        pl.when(pl.col("_v") == 0)
        .then("https://site" + pl.col("_s") + ".example.com/Docs/page-" + pl.col("_gs"))
        .when(pl.col("_v") == 1)
        .then("HTTPS://WWW.SITE" + pl.col("_s") + ".EXAMPLE.COM/Docs/page-"
              + pl.col("_gs") + "?utm_source=feed")
        .when(pl.col("_v") == 2)
        .then("https://site" + pl.col("_s") + ".example.com:443/Docs/page-"
              + pl.col("_gs") + "#section-2")
        .otherwise("https://www.site" + pl.col("_s") + ".example.com/Docs/page-"
                   + pl.col("_gs") + "/")
        .alias("url")
    )
    return out.select(["doc_id", "url"]).to_arrow().cast(
        pa.schema([("doc_id", pa.int64()), ("url", pa.string())])
    )


def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup (the first step of a Common-Crawl ingest):
    canonicalize crawl-variant URLs (functions/urltools spec), keep one
    row per canonical url with the winning min doc_id + duplicate count."""
    from docling_translate_ray.functions import urltools

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_url_variants_batch, batch_format="pyarrow"
    )
    return urltools.url_dedup(pages, url_column="url", id_column="doc_id")


def q_domain_cap(sf_dir: str, k: int = 3):
    """Per-domain document cap (CC curation rule "≤k pages per host"):
    extract the host from each crawl-variant URL, rank the host's docs by
    ascending doc_id, keep rank ≤ k.  One narrow (host, id) exchange."""
    from docling_translate_ray.functions import urltools

    pages = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_url_variants_batch, batch_format="pyarrow"
    )
    return urltools.domain_cap(pages, k=k, url_column="url", id_column="doc_id")


def snapshot_pair_batches(batch: pa.Table):
    """Deterministic two-snapshot view of `documents` (oracle rebuilds the
    same strings in SQL): old = every doc at ``doc://<id>``; new = the same
    crawl minus ``id % 7 == 0`` (removed), with ``id % 5 == 0`` re-crawled
    as ``text || ' v2'`` (changed), plus ``doc://new-<id>`` pages for
    ``id % 11 == 0`` (added)."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        ("doc://" + pl.col("doc_id").cast(pl.String)).alias("url")
    )
    old = df.select(["url", "text"])
    survivors = df.filter(pl.col("doc_id") % 7 != 0).with_columns(
        pl.when(pl.col("doc_id") % 5 == 0)
        .then(pl.col("text") + " v2")
        .otherwise(pl.col("text"))
        .alias("text")
    ).select(["url", "text"])
    added = df.filter(pl.col("doc_id") % 11 == 0).select(
        ("doc://new-" + pl.col("doc_id").cast(pl.String)).alias("url"), "text"
    )
    schema = pa.schema([("url", pa.string()), ("text", pa.string())])
    return (old.to_arrow().cast(schema),
            pl.concat([survivors, added]).to_arrow().cast(schema))


def q_snapshot_diff(sf_dir: str):
    """Cross-snapshot crawl diff (functions/crawl.snapshot_diff): which
    urls were added / removed / changed between two crawls — 16-byte
    fingerprints through ONE url-hash exchange, page text never shuffles."""
    from docling_translate_ray.functions import crawl as fcrawl

    def side(i: int):
        def fn(batch: pa.Table) -> pa.Table:
            return snapshot_pair_batches(batch)[i]

        return fn

    base = _read(sf_dir, "documents", ["doc_id", "text"])
    old_ds = base.map_batches(side(0), batch_format="pyarrow")
    new_ds = base.map_batches(side(1), batch_format="pyarrow")
    return fcrawl.snapshot_diff(old_ds, new_ds)


def q_latest_version(sf_dir: str):
    """Latest-version-per-url select (functions/crawl.latest_page_version)
    over a deterministic multi-snapshot view: doc ``i`` has ``i % 3 + 1``
    crawled versions at distinct ``warc_ts``; keep the newest row per url
    (combiner-first argmax, one narrow exchange)."""
    import polars as pl

    from docling_translate_ray.functions import crawl as fcrawl

    def versions(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        out = (
            df.with_columns((pl.col("doc_id") % 3 + 1).alias("_nv"))
            .with_columns(pl.int_ranges(0, pl.col("_nv")).alias("_v"))
            .explode("_v")
            .select(
                ("doc://" + pl.col("doc_id").cast(pl.String)).alias("url"),
                (1_700_000_000 + pl.col("_v") * 3600 + pl.col("doc_id"))
                .cast(pl.Int64).alias("warc_ts"),
                (pl.col("text") + " rev" + pl.col("_v").cast(pl.String))
                .alias("text"),
            )
        )
        return out.to_arrow().cast(pa.schema([
            ("url", pa.string()), ("warc_ts", pa.int64()), ("text", pa.string()),
        ]))

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        versions, batch_format="pyarrow"
    )
    return fcrawl.latest_page_version(pages)


def _robots_view():
    """Deterministic per-host robots.txt table for the 23-host frontier
    view: ``h % 3 == 0`` disallows the ``/page/1`` prefix for every
    agent, ``h % 3 == 1`` disallows everything, ``h % 3 == 2`` only
    constrains a different agent — parser groups, empty-disallow and
    prefix semantics all exercised."""
    import ray.data

    def robots_txt(h: int) -> str:
        if h % 3 == 0:
            return "# site rules\nUser-agent: *\nDisallow: /page/1\n"
        if h % 3 == 1:
            return "User-agent: bot\nUser-agent: *\nDisallow: /\n"
        return "User-agent: bot\nDisallow: /\nUser-agent: x\nDisallow:\n"

    return ray.data.from_arrow(pa.table({
        "host": pa.array([f"host-{h}.example.com" for h in range(23)],
                         pa.string()),
        "robots_txt": pa.array([robots_txt(h) for h in range(23)],
                               pa.string()),
    }))


def q_robots_filter(sf_dir: str):
    """Robots-exclusion crawl gate (functions/crawl.robots_filter) over
    the 23-host frontier view and the deterministic rule table
    (:func:`_robots_view`).  Rules broadcast once; the page side never
    shuffles."""
    from docling_translate_ray.functions.crawl import robots_filter

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        frontier_view_batch, batch_format="pyarrow"
    )
    return robots_filter(pages, _robots_view())


def q_crawl_cycle(sf_dir: str):
    """END-TO-END crawl-cycle plan (pipelines/crawl_cycle): two
    deterministic snapshots of the 23-host view (every ``i % 3 == 0``
    page changed, carrying ``' v2'``), the :func:`_robots_view` rules,
    politeness k=4 — robots gate → change detection → adaptive
    frontier, hash-checked as ONE oracle."""
    import polars as pl

    from docling_translate_ray.pipelines.crawl_cycle import crawl_cycle

    def snapshot(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(["doc_id", "text"]))
            text = pl.col("text").fill_null("")
            if which == "new":
                text = (
                    pl.when(pl.col("doc_id") % 3 == 0)
                    .then(text + " v2").otherwise(text)
                )
            return (
                df.select(
                    (pl.lit("https://host-")
                     + (pl.col("doc_id") % 23).cast(pl.String)
                     + pl.lit(".example.com/page/")
                     + pl.col("doc_id").cast(pl.String)).alias("url"),
                    text.alias("text"),
                )
                .to_arrow()
                .cast(pa.schema([("url", pa.string()), ("text", pa.string())]))
            )

        return fn

    base = _read(sf_dir, "documents", ["doc_id", "text"])
    old_ds = base.map_batches(snapshot("old"), batch_format="pyarrow")
    new_ds = base.map_batches(snapshot("new"), batch_format="pyarrow")
    return crawl_cycle(old_ds, new_ds, _robots_view(), k_per_cycle=4)


def q_sitemap_seeds(sf_dir: str):
    """Sitemap-discovery seeds (functions/crawl.sitemap_seeds) over
    deterministic per-doc sitemap bodies: doc ``i`` publishes
    ``1 + i % 3`` url blocks (lastmod only on the first), one loc-less
    block to skip when ``i % 5 == 0``, and uppercase tags on block 1
    when ``i % 7 == 0`` — whitespace/namespace/case noise the parser
    must see through; the oracle rebuilds the kept rows as strings."""
    from docling_translate_ray.functions.crawl import sitemap_seeds

    def sitemap_view(batch: pa.Table) -> pa.Table:
        hosts, xmls = [], []
        for i in batch["doc_id"].to_pylist():
            h = f"host-{i % 23}.example.com"
            parts = ['<?xml version="1.0"?>'
                     '<urlset xmlns="http://www.sitemaps.org/schemas/'
                     'sitemap/0.9">']
            for j in range(1 + i % 3):
                loc = f"https://{h}/sm/{i}/{j}"
                if j == 1 and i % 7 == 0:
                    parts.append(f"<URL><LOC> {loc} </LOC></URL>")
                elif j == 0:
                    lm = f"2024-01-{(i % 27) + 1:02d}"
                    parts.append(f"<url>\n  <loc> {loc} </loc>\n"
                                 f"  <lastmod>{lm}</lastmod>\n</url>")
                else:
                    parts.append(f"<url><loc>{loc}</loc></url>")
            if i % 5 == 0:
                parts.append("<url><lastmod>2024-02-02</lastmod></url>")
            parts.append("</urlset>")
            hosts.append(h)
            xmls.append("".join(parts))
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "sitemap_xml": pa.array(xmls, pa.string())})

    return sitemap_seeds(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            sitemap_view, batch_format="pyarrow"))


def q_host_reputation(sf_dir: str):
    """Per-host reputation stats (functions/urltools.host_reputation)
    over the 23-host frontier view carrying the documents' own text:
    combiner-first, one host-keyed partial exchange; integer means and
    ok-percent keep the oracle bit-exact."""
    import polars as pl

    from docling_translate_ray.functions.urltools import host_reputation

    def pages(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        return (
            df.select(
                (pl.lit("https://host-")
                 + (pl.col("doc_id") % 23).cast(pl.String)
                 + pl.lit(".example.com/page/")
                 + pl.col("doc_id").cast(pl.String)).alias("url"),
                pl.col("text"),
            ).to_arrow()
        )

    return host_reputation(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            pages, batch_format="pyarrow"))


def q_extract_links(sf_dir: str):
    """Outlink extraction (functions/graph.extract_links_batch) over a
    deterministic link-rich page view: doc ``i`` carries ``i % 4``
    host-absolute links, one external link, one relative link (whose
    anchor embeds a tag, exercising the strip), and two non-edges
    (fragment, mailto) that must be skipped.  The oracle rebuilds the
    kept rows as strings — the parser/resolver must agree exactly."""
    from docling_translate_ray.functions.graph import extract_links_batch

    def link_pages(batch: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for i in batch["doc_id"].to_pylist():
            h = i % 23
            body = ["<html><body><p>content</p>"]
            for k in range(i % 4):
                body.append(
                    f'<a href="/p/{(i * 7 + k * 13) % 1000}">go {k}</a>')
            body.append(f'<a href="https://ext{i % 5}.example.org/x">out</a>')
            body.append('<a href="#frag">skip1</a>')
            body.append('<a href="mailto:a@b.example">skip2</a>')
            body.append(f'<a href="rel/{i % 9}.html">rel <b>bold</b></a>')
            body.append("</body></html>")
            urls.append(f"https://host{h}.example/dir/page{i}.html")
            htmls.append("".join(body))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.string())})

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(link_pages, batch_format="pyarrow")
        .map_batches(extract_links_batch, batch_format="pyarrow")
    )


def q_recrawl_priority(sf_dir: str):
    """Adaptive-recrawl change-rate signal (functions/crawl.
    recrawl_priority) over a deterministic crawl history: doc ``i`` has
    ``i % 4 + 1`` stored versions and its content changes every SECOND
    revision (rev v carries suffix ``v - v % 2``), so urls exhibit 0%,
    50% and 100% consecutive-change rates — the scheduler's input."""
    import polars as pl

    from docling_translate_ray.functions import crawl as fcrawl

    def versions(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        out = (
            df.with_columns((pl.col("doc_id") % 4 + 1).alias("_nv"))
            .with_columns(pl.int_ranges(0, pl.col("_nv")).alias("_v"))
            .explode("_v")
            .select(
                ("doc://" + pl.col("doc_id").cast(pl.String)).alias("url"),
                (1_700_000_000 + pl.col("_v") * 3600 + pl.col("doc_id"))
                .cast(pl.Int64).alias("warc_ts"),
                (pl.col("text") + " rev"
                 + (pl.col("_v") - pl.col("_v") % 2).cast(pl.String))
                .alias("text"),
            )
        )
        return out.to_arrow().cast(pa.schema([
            ("url", pa.string()), ("warc_ts", pa.int64()),
            ("text", pa.string()),
        ]))

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        versions, batch_format="pyarrow"
    )
    return fcrawl.recrawl_priority(pages)


def snapshot_pages_batch(batch: pa.Table, which: str) -> pa.Table:
    """input_hint-shaped pages for the deterministic snapshot pair: old =
    every doc wrapped at ``doc://<id>``; new = minus ``id%7==0``, with
    ``id%5==0`` re-crawled carrying ``text || ' v2'``, plus ``doc://new-<id>``
    pages for ``id%11==0`` (same delta spec as snapshot_pair_batches)."""
    rows = []
    for i, t, l in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
                       batch["lang"].to_pylist()):
        t = t or ""
        if which == "old":
            rows.append((f"doc://{i}", i, t, l or ""))
        else:
            if i % 7 != 0:
                t2 = t + " v2" if i % 5 == 0 else t
                rows.append((f"doc://{i}", i, t2, l or ""))
            if i % 11 == 0:
                rows.append((f"doc://new-{i}", i, t, l or ""))
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array(
            [corpus.doc_row_to_page_html(r[1], r[2], r[3]).encode("utf-8")
             for r in rows], pa.binary()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
    })


def q_incremental_extract(sf_dir: str):
    """LSM-style incremental extraction (pipelines/incremental.py): run the
    full job on snapshot 1, then pay extraction ONLY for snapshot 2's
    added + changed pages; ``read_corpus_docs`` resolves base − tombstones
    + delta.  Oracle: full re-extraction of snapshot 2 — the incremental
    state must be row-identical to it (the module invariant)."""
    import functools
    import os
    import shutil
    import tempfile

    from docling_translate_ray.pipelines.extract import run_extract_job
    from docling_translate_ray.pipelines.incremental import (
        read_corpus_docs,
        run_incremental_extract_job,
    )

    work = tempfile.mkdtemp(prefix="dtr_incr_")
    try:
        base = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        for which in ("old", "new"):
            pdir = os.path.join(work, f"pages_{which}")
            os.makedirs(pdir)
            import pyarrow.parquet as pq

            pq.write_table(
                _collect(base.map_batches(
                    functools.partial(snapshot_pages_batch, which=which),
                    batch_format="pyarrow")),
                os.path.join(pdir, "pages.parquet"),
            )
        out0 = os.path.join(work, "out0")
        run_extract_job(os.path.join(work, "pages_old"), out0, n_buckets=8)
        out1 = os.path.join(work, "out1")
        stats = run_incremental_extract_job(
            os.path.join(work, "pages_old"), os.path.join(work, "pages_new"),
            out0, out1, n_buckets=8,
        )
        assert stats["doc_count"] == stats["n_added"] + stats["n_changed"]
        return _collect(
            read_corpus_docs(out1).select_columns(
                ["url", "status", "extracted_text", "n_chars"])
        ).sort_by("url")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def host_template_view_batch(batch: pa.Table) -> pa.Table:
    """Pages for the host-template query: crawl-variant urls
    (synth_url_variants_batch), text wrapped into 8-word lines, plus a
    deterministic per-host footer line — every host has ≥ 2 docs on the
    sf corpora, so the footer is template BY CONSTRUCTION (non-vacuous
    drops) while body lines are template only where real dups share a
    host.  The oracle rebuilds the identical view in SQL."""
    import polars as pl

    wrapped = fdedup.wrap_words_as_lines(batch, words_per_line=8)
    urls = synth_url_variants_batch(batch.select(["doc_id"]))
    df = (
        pl.from_arrow(wrapped.select(["doc_id", "text"]))
        .join(pl.from_arrow(urls), on="doc_id", how="inner")
        .with_columns(
            ("template footer site "
             + ((pl.col("doc_id") // 4) % 97).cast(pl.String)).alias("_foot")
        )
        .with_columns(
            pl.when(pl.col("text") == "")
            .then(pl.col("_foot"))
            .otherwise(pl.col("text") + "\n" + pl.col("_foot"))
            .alias("text")
        )
    )
    return df.select(["doc_id", "url", "text"]).to_arrow().cast(
        pa.schema([("doc_id", pa.int64()), ("url", pa.string()),
                   ("text", pa.string())])
    )


def q_host_template(sf_dir: str):
    """Host-scoped template-line removal (functions/crawl.
    host_template_lines): lines frequent within ONE host are dropped from
    that host only — site boilerplate removal the global line_dedup can't
    express."""
    from docling_translate_ray.functions.crawl import host_template_lines

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        host_template_view_batch, batch_format="pyarrow"
    )
    return host_template_lines(pages, min_docs=2)


def frontier_view_batch(batch: pa.Table) -> pa.Table:
    """Deterministic crawl-frontier view of `documents` (oracle rebuilds
    the same strings in SQL): 23 synthetic hosts, priority = whitespace
    token count (a stand-in for page importance — any scored int works)."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    return (
        df.with_columns(
            (pl.lit("https://host-") + (pl.col("doc_id") % 23).cast(pl.String)
             + pl.lit(".example.com/page/")
             + pl.col("doc_id").cast(pl.String)).alias("url"),
            pl.col("text").fill_null("").str.count_matches(r"\S+")
            .cast(pl.Int64).alias("priority"),
        )
        .select(["url", "priority"])
        .to_arrow()
    )


def q_frontier_schedule(sf_dir: str):
    """Politeness-aware crawl-frontier scheduling (functions/crawl.
    frontier_schedule): ≤k fetches per host per cycle, higher priority
    first — one host-keyed narrow exchange, cycle = (rank-1)//k + 1.
    Hosts with ``h % 4 == 0`` carry a robots ``Crawl-delay: 3`` and get
    k = 8 // 3 = 2 through :func:`parse_crawl_delay` + ``k_column``;
    the rest run the default k = 4."""
    import polars as pl

    from docling_translate_ray.functions.crawl import (
        frontier_schedule,
        parse_crawl_delay,
    )

    # per-row k derived from the host's robots crawl-delay (base cycle
    # budget 8 fetches; delay d => k = max(1, 8 // d)); null = default
    slow = parse_crawl_delay("User-agent: *\nCrawl-delay: 3\n")

    def with_k(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        # host index = doc_id % 23 is recoverable from the url tail? no —
        # recompute from the priority view's own url shape
        h = (df["url"].str.extract(r"host-(\d+)\.example", 1)
             .cast(pl.Int64))
        k = pl.select(
            pl.when(h % 4 == 0)
            .then(max(1, 8 // slow)).otherwise(None)
            .cast(pl.Int64).alias("k"))["k"]
        return batch.append_column("k", k.to_arrow().cast(pa.int64()))

    frontier = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        frontier_view_batch, batch_format="pyarrow"
    ).map_batches(with_k, batch_format="pyarrow")
    return frontier_schedule(frontier, k_per_cycle=4, k_column="k")


def q_token_budget(sf_dir: str):
    """Corpus selection under a 30%-of-total token budget
    (functions/packing.token_budget_select): exactly the docs a global
    ORDER BY (n_chars DESC, doc_id) inclusive running-sum ≤ budget keeps,
    with no global sort — score-histogram exchange + driver threshold
    refinement + one broadcast filter.  Zero-token docs are excluded on
    both engines (they are not selectable content and would make the
    window rule order-sensitive past the budget)."""
    import polars as pl

    from docling_translate_ray.functions.packing import token_budget_select

    def view(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(pl.col("text").fill_null(""))
        df = df.select(
            pl.col("doc_id"),
            pl.col("text").str.len_chars().cast(pl.Int64).alias("score"),
            pl.col("text").str.extract_all(r"\S+").list.len()
            .cast(pl.Int64).alias("n_tokens"),
        ).filter(pl.col("n_tokens") > 0)
        return df.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("score", pa.int64()),
            ("n_tokens", pa.int64()),
        ]))

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        view, batch_format="pyarrow"
    )
    return token_budget_select(ds, budget_pct=30)


def q_top_words(sf_dir: str, k: int = 50):
    """Corpus vocabulary top-k (token distribution — the training-data
    "what's in my corpus" op): global word counts via per-batch combiner →
    one grouped_sum exchange → per-partition local top-k → tiny merge (no
    global sort).  Deterministic tie-break on the word."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import grouped_sum

    def word_partial(batch: pa.Table) -> pa.Table:
        s = pl.Series(batch["text"].to_pylist(), dtype=pl.String).fill_null("")
        return (
            pl.DataFrame({"t": s})
            .select(pl.col("t").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
            .group_by("w")
            .agg(pl.len().cast(pl.Int64).alias("_n"))
            .rename({"w": "word"})
            .to_arrow()
        )

    counts = grouped_sum(
        _read(sf_dir, "documents", ["text"]).map_batches(
            word_partial, batch_format="pyarrow"
        ),
        ["word"],
        [pl.col("_n").sum().alias("_n")],
        {"n_occurrences": "_n"},
        num_partitions=32,
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .sort(["n_occurrences", "word"], descending=[True, False])
            .head(k)
            .to_arrow()
        )

    # counts already has one row per word; per-batch top-k → tiny merge
    cand = _collect(counts.map_batches(local_topk, batch_format="pyarrow"))
    top = (
        pl.from_arrow(cand)
        .sort(["n_occurrences", "word"], descending=[True, False])
        .head(k)
        .to_arrow()
    )
    from docling_translate_ray.state.checkpoint import normalize_arrow_types

    top = normalize_arrow_types(top)
    return top.append_column("rank", pa.array(range(1, top.num_rows + 1), pa.int64()))


_PLANT_OFFSET = 10_000_000


def plant_embedding_twins_batch(batch: pa.Table) -> pa.Table:
    """Self-union with perturbed near-dup twins: every ``vec_id % 10 == 0``
    row gains a twin at ``vec_id + _PLANT_OFFSET`` whose first coordinate
    is scaled 1.3× (cos(v, v') ≥ 0.999 on the sf corpora, vs ≤ 0.52 for
    any unplanted pair) — the ground-truth clusters are exactly the
    planted pairs, and the perturbation is SQL-expressible so the DuckDB
    oracle rebuilds the identical view (same float64 ops).  Pattern:
    multimodal.gen_image_corpus's planted perceptual dups."""
    ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
    if ids.size == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "embedding": pa.array([], pa.list_(pa.float64()))})
    mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    sel = ids % 10 == 0
    twins = mat[sel].copy()
    twins[:, 0] *= 1.3
    return pa.table({
        "vec_id": pa.array(
            np.concatenate([ids, ids[sel] + _PLANT_OFFSET]), pa.int64()),
        "embedding": pa.array(
            mat.tolist() + twins.tolist(), pa.list_(pa.float64())),
    })


def q_embedding_near_dup(sf_dir: str):
    """Hyperplane-LSH embedding near-dup over the planted-twin view (the
    raw sf embeddings hold no cos ≥ 0.9 pair, which made the round-2
    driver row vacuous at 0 rows).  Oracle: exact all-pairs cosine ≥ 0.9
    on the same view + transitive closure (the cosine_pairs model)."""
    planted = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        plant_embedding_twins_batch, batch_format="pyarrow"
    )
    return fdedup.embedding_near_dup(planted, threshold=0.9, num_planes=6)


# ------------------------------------------------------------------ knn


def _query_vectors(sf_dir: str, n: int = 2) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id").slice(0, n)
    return np.array(t["embedding"].to_pylist(), dtype=np.float64)


def q_cosine_pairs(sf_dir: str):
    """Exact all-pairs cosine similarity at 0.40 over the embeddings table
    (the brute-force oracle for embedding_near_dup; min |cos − 0.40|
    margin on the sf corpora is ≥ 1e-4, far above kernel-order ulps)."""
    return fknn.cosine_pairs(_read(sf_dir, "embeddings"), threshold=0.40)


def q_knn_topk(sf_dir: str):
    """Brute-force cosine top-10 for the first two embedding rows.

    Compared rank-only against DuckDB ``list_cosine_similarity`` (float
    values themselves differ in the last ulps between kernels)."""
    q = _query_vectors(sf_dir, 2)
    out = fknn.knn_brute_force(_read(sf_dir, "embeddings"), q, k=10)
    return out.select(["query_idx", "vec_id", "rank"])


def q_knn_ivf(sf_dir: str):
    """IVF ANN at FULL probe (n_probe == n_centroids): exercises the whole
    physical path — centroid training, partitioned index build, pruned
    per-partition top-k, merge — while being exact by construction, so the
    brute-force SQL (the knn_topk oracle at 1 query) is a true oracle.
    The n_probe < n_centroids pruning/recall behaviour stays pinned by
    tests/test_functions.py (deleting un-probed partitions keeps answers)."""
    q = _query_vectors(sf_dir, 1)
    out = fknn.knn_ivf(_read(sf_dir, "embeddings"), q, k=10, n_centroids=8, n_probe=8)
    return out.select(["query_idx", "vec_id", "rank"])


# ------------------------------------------------------------------ text stats


def q_token_count(sf_dir: str):
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fts.token_count_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
    )


def q_quality(sf_dir: str):
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fts.quality_batch, batch_format="pyarrow")
        .select_columns(
            ["doc_id", "n_chars", "n_tokens", "punct_ratio", "upper_ratio",
             "mean_token_len", "quality_ok"]
        )
    )


def q_fingerprint(sf_dir: str):
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fts.fingerprint_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "fp_md5"])
    )


def q_token_count_bpe(sf_dir: str):
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fts.token_count_bpe_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens_bpe"])
    )


def q_gopher_quality(sf_dir: str):
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fts.gopher_quality_batch, batch_format="pyarrow")
        .select_columns(
            ["doc_id", "n_words", "n_lines", "has_stopword", "symbol_ratio",
             "bullet_ratio", "gopher_ok"]
        )
    )


_INDEX_LOOKUP_TERMS = ["data", "hash", "table", "the", "zzz-absent"]


def q_inverted_index(sf_dir: str):
    """Build a term-hash-partitioned inverted index (functions/index.py)
    under /tmp, then answer a fixed term lookup through the PRUNED
    partition read — the IVF pattern applied to text search."""
    import hashlib

    from docling_translate_ray.functions import index as fidx

    idx_dir = "/tmp/dtr_inv_index_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fidx.build_inverted_index(
        _read(sf_dir, "documents", ["doc_id", "text"]), idx_dir,
        num_partitions=16,
    )
    return fidx.lookup_postings(idx_dir, _INDEX_LOOKUP_TERMS)


def q_chunk_docs(sf_dir: str):
    """Overlapping fixed-token chunking (window 64, stride 48) — the
    RAG/embedding layout explode (functions/packing.chunk_docs_batch)."""
    from docling_translate_ray.functions.packing import chunk_docs_batch

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        chunk_docs_batch, batch_format="pyarrow"
    )


_SPLIT_TRAIN_BOUND = "c" + "8" * 31
_SPLIT_VAL_BOUND = "e" + "1" * 31


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag train-split docs sharing any word
    5-gram with the test split (n scaled down from the published 13-gram
    rule because synthetic docs are short; 12/392 hit at sf0.01).
    Splits reuse q_dataset_split's content-hash boundaries."""
    import pyarrow.compute as pc

    from docling_translate_ray.functions.decontam import decontaminate

    def keep_split(lo: str | None, hi: str | None):
        def fn(batch: pa.Table) -> pa.Table:
            md5 = fts.fingerprint_batch(batch)["fp_md5"]
            mask = pc.greater_equal(md5, lo) if lo else pc.less(md5, hi)
            return batch.filter(mask)

        return fn

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    train = docs.map_batches(
        keep_split(None, _SPLIT_TRAIN_BOUND), batch_format="pyarrow"
    )
    test = docs.map_batches(
        keep_split(_SPLIT_VAL_BOUND, None), batch_format="pyarrow"
    )
    return decontaminate(train, test, n=5)


def q_normalize_text(sf_dir: str):
    """Unicode normalization pass (functions/normalize.normalize_docs):
    NFC + control-strip + space-run collapse + trim, with a null-safe
    ``changed`` flag.  The corpus text is clean ASCII, so every 7th doc
    is deterministically perturbed IN the query (decomposed accent +
    C0 byte + double spaces — the same CASE expression on the SQL side)
    to keep the driver row non-vacuous: the normalizer must both fix
    the perturbed rows and leave the rest byte-identical."""
    import polars as pl

    from docling_translate_ray.functions.normalize import normalize_docs

    def perturb(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch)
            .with_columns(
                pl.when(pl.col("doc_id") % 7 == 0)
                .then(pl.lit("e\u0301  \x01") + pl.col("text") + pl.lit("  "))
                .otherwise(pl.col("text"))
                .alias("text"))
            .to_arrow()
        )
        return out.cast(batch.schema)

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        perturb, batch_format="pyarrow")
    return normalize_docs(docs)


def q_pack_sequences(sf_dir: str):
    """Sequence packing (concatenate-then-chunk at capacity 512) via the
    distributed exclusive prefix sum in functions/packing.py; tiny
    bucket_width so the multi-bucket path is exercised at sf scale."""
    from docling_translate_ray.functions.packing import pack_sequences

    return pack_sequences(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        capacity=512, bucket_width=64,
    )


def q_token_quantiles(sf_dir: str):
    """Exact token-count quantiles via histogram combiner (no global
    sort); oracle = DuckDB quantile_disc, whose discrete index rule the
    kernel reproduces exactly."""
    return fts.token_quantiles(_read(sf_dir, "documents", ["text"]))


def q_cooccurrence(sf_dir: str):
    """Top-50 bigram collocations by lift (monotone PMI) —
    functions/text_stats.cooccurrence_lift."""
    return fts.cooccurrence_lift(
        _read(sf_dir, "documents", ["text"]), k=50, min_count=5
    )


def q_pii_scrub(sf_dir: str):
    """PII redaction over deterministically planted contact lines (the
    testdata corpus contains no real PII, so every third doc gets a
    synthesized email and/or phone appended — the oracle builds the SAME
    strings — then functions/text_stats.pii_scrub_batch redacts them)."""
    import polars as pl

    def plant_and_scrub(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "doc_id": pl.from_arrow(batch["doc_id"]).cast(pl.Int64),
                "t": pl.from_arrow(batch["text"]).fill_null(""),
            }
        ).with_columns(
            (pl.col("doc_id") % 3).alias("_v"),
            (pl.col("doc_id") % 10000).cast(pl.String).str.zfill(4).alias("_p4"),
        ).with_columns(
            pl.when(pl.col("_v") == 0)
            .then(
                pl.col("t") + " Contact user" + pl.col("doc_id").cast(pl.String)
                + "@mail.example.com now"
            )
            .when(pl.col("_v") == 1)
            .then(pl.col("t") + " Call +1-555-" + pl.col("_p4") + " today")
            .otherwise(pl.col("t"))
            .alias("text")
        )
        planted = pa.table(
            {
                "doc_id": df["doc_id"].to_arrow().cast(pa.int64()),
                "text": df["text"].to_arrow().cast(pa.string()),
            }
        )
        return fts.pii_scrub_batch(planted)

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(plant_and_scrub, batch_format="pyarrow")
        .select_columns(["doc_id", "text_redacted", "n_emails", "n_phones"])
    )


def q_approx_distinct(sf_dir: str):
    """HyperLogLog distinct-text estimate (functions/sketch.py) — the
    mergeable-sketch reduce; rows-only (DuckDB's approx_count_distinct is
    a different sketch), accuracy pinned in pytest at several
    cardinalities."""
    from docling_translate_ray.functions.sketch import approx_distinct

    return approx_distinct(_read(sf_dir, "documents", ["text"]), "text")


def q_lang_token_quantiles(sf_dir: str):
    """Per-language token-count quantiles (grouped histogram combiner —
    same scan, 5 rows per lang)."""
    return fts.token_quantiles(
        _read(sf_dir, "documents", ["text", "lang"]), group_column="lang"
    )


_STRATA_BOUNDS = [
    ("en", "80000000" + "0" * 24),  # keep 1/2
    ("ko", "40000000" + "0" * 24),  # keep 1/4
]
_STRATA_DEFAULT = "20000000" + "0" * 24  # keep 1/8


def q_stratified_sample(sf_dir: str):
    """Per-language deterministic hash sampling at different rates
    (en 1/2, ko 1/4, others 1/8): keep rows whose hex md5 sorts below the
    language's boundary — layout/engine-independent like q_sample_docs,
    the standard way to rebalance a multilingual corpus."""
    import polars as pl

    bound_map = dict(_STRATA_BOUNDS)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        md5 = fts.fingerprint_batch(batch)["fp_md5"]
        bounds = (
            pl.from_arrow(batch["lang"])
            .replace_strict(bound_map, default=_STRATA_DEFAULT)
            .to_arrow()
            .cast(pa.string())
        )
        return batch.filter(pc.less(md5, bounds))

    return (
        _read(sf_dir, "documents", ["doc_id", "lang", "text"])
        .map_batches(keep, batch_format="pyarrow")
        .select_columns(["doc_id", "lang"])
    )


def q_rep_signals(sf_dir: str):
    """Gopher-style repetition gate (dup-word / dup-2gram / top-2gram
    fractions, functions/text_stats.rep_signals_batch)."""
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(fts.rep_signals_batch, batch_format="pyarrow")
        .select_columns(
            ["doc_id", "n_words", "dup_word_frac", "dup_2gram_frac",
             "top_2gram_frac", "rep_ok"]
        )
    )


def q_sample_docs(sf_dir: str):
    """Deterministic content-hash sampling (~25%): keep rows whose hex md5
    sorts below the 1/4 boundary — reproducible across runs, engines, and
    cluster sizes (the standard corpus-subsampling trick; never
    random_sample, whose output depends on block layout)."""
    bound = "4" + "0" * 31  # top nibble < 4 ⇒ 4/16 of the hash space

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        with_md5 = fts.fingerprint_batch(batch)
        return with_md5.filter(pc.less(with_md5["fp_md5"], bound))

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(keep, batch_format="pyarrow")
        .select_columns(["doc_id", "fp_md5"])
    )


def q_doc_terms(sf_dir: str):
    """Per-doc top-5 salient terms, integer-exact tf-idf analog
    (functions/text_stats.doc_salient_terms)."""
    return fts.doc_salient_terms(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=5
    )


def q_word_commonness(sf_dir: str):
    """Unigram corpus-frequency fluency score, integer-exact CCNet/KenLM
    perplexity-filter analog (functions/text_stats.word_commonness)."""
    return fts.word_commonness(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split assignment + per-split stats —
    the standard corpus-partitioning op: split = content-hash range
    (train < 0xC8…, val < 0xE1…, else test ≈ 80/10/10), reproducible
    across runs, engines and cluster sizes (layout-independent, same
    trick as q_sample_docs).  Returns (split, n_docs, total_chars)."""
    import polars as pl

    bounds = [("train", "c" + "8" * 31), ("val", "e" + "1" * 31)]

    def assign(batch: pa.Table) -> pa.Table:
        with_md5 = fts.fingerprint_batch(batch)
        md5s = with_md5["fp_md5"].to_pylist()
        split = [
            next((name for name, b in bounds if h < b), "test") for h in md5s
        ]
        return pa.table(
            {
                "split": pa.array(split, pa.string()),
                "n_chars": pa.array(
                    [len(t or "") for t in batch["text"].to_pylist()], pa.int64()
                ),
            }
        )

    return _grouped_sum(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            assign, batch_format="pyarrow"
        ),
        ["split"],
        [
            pl.len().cast(pl.Int64).alias("_n"),
            pl.col("n_chars").sum().alias("_c"),
        ],
        {"n_docs": ("_n", "sum"), "total_chars": ("_c", "sum")},
    )


def q_langid(sf_dir: str):
    from docling_translate_ray.util import auto_pool_size

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            fts.LangId, batch_format="pyarrow", concurrency=auto_pool_size()
        )
        .select_columns(["doc_id", "lang_pred"])
    )


# ------------------------------------------------------------------ aggregates
# partial-per-batch combiner → groupby(key).map_groups(final): the exchange
# carries one row per (batch, key), never per input row.


def _grouped_sum(ds, keys: list[str], partial_exprs, final_cols):
    """Two-level aggregation (combiner → hash-partitioned vectorized final).

    ``partial_exprs``: polars aggregation exprs for the per-batch combiner.
    ``final_cols``: {out_name: (partial_name, "sum")} summed per group.
    """
    from docling_translate_ray.stages.shuffle import grouped_sum

    return grouped_sum(
        ds, keys, partial_exprs, {name: src for name, (src, _) in final_cols.items()}
    )


def q_distinct_pairs(sf_dir: str):
    """Generic DISTINCT (stages/shuffle.distinct) over (lang, source)."""
    from docling_translate_ray.stages.shuffle import distinct

    return distinct(_read(sf_dir, "documents", ["lang", "source"]),
                    ["lang", "source"])


def q_lang_counts(sf_dir: str):
    import polars as pl

    return _grouped_sum(
        _read(sf_dir, "documents", ["lang"]),
        ["lang"],
        [pl.len().cast(pl.Int64).alias("_n")],
        {"n_docs": ("_n", "sum")},
    )


def q_events_by_type(sf_dir: str):
    """Count + exact cents-sum per event type (A3 aggregation analog)."""
    import polars as pl

    return _grouped_sum(
        _read(sf_dir, "events", ["event_type", "value"]),
        ["event_type"],
        [
            pl.len().cast(pl.Int64).alias("_n"),
            (pl.col("value") * 100).round(0).cast(pl.Int64).sum().alias("_cents"),
        ],
        {"n_events": ("_n", "sum"), "total_value_cents": ("_cents", "sum")},
    )


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window count per event type (windowed aggregate)."""
    import polars as pl

    def add_hour(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["ts"]).dt.truncate("1h")
        return batch.append_column("hour", s.to_arrow().cast(pa.timestamp("us")))

    ds = _read(sf_dir, "events", ["ts", "event_type"]).map_batches(
        add_hour, batch_format="pyarrow"
    )
    return _grouped_sum(
        ds.select_columns(["hour", "event_type"]),
        ["hour", "event_type"],
        [pl.len().cast(pl.Int64).alias("_n")],
        {"n_events": ("_n", "sum")},
    )


def q_windowed_watermark(sf_dir: str):
    """Streaming tumbling window with per-key watermark + late-data drop
    (stages/window.py), replayed over the events stream (arrival order =
    event_id).  The driver stream is time-ordered so the late bucket is
    empty and the result provably equals the plain hourly aggregate —
    which IS the SQL oracle; disorder semantics are pinned by
    tests/test_window.py."""
    import datetime as dt

    from docling_translate_ray.stages.window import windowed_counts_with_watermark

    ds = _read(sf_dir, "events", ["event_type", "event_id", "ts"])
    return windowed_counts_with_watermark(
        ds, key="event_type", ts_col="ts", arrival_col="event_id",
        window="1h", lateness=dt.timedelta(minutes=10),
    )


def q_windowed_watermark_disorder(sf_dir: str):
    """Watermark windows over a DISORDERED replay: arrival order is a
    deterministic pseudo-random permutation (md5 of event_id — computable
    in both engines), so events genuinely arrive out of time order, the
    per-key watermark advances non-trivially and the late bucket is
    NON-EMPTY — this drives the drop-and-count path the time-ordered
    ``windowed_watermark`` query can't reach.  The SQL oracle models the
    same per-key cumulative-max watermark with a window function."""
    import datetime as dt

    from docling_translate_ray.stages.window import windowed_counts_with_watermark

    def add_arrival(batch: pa.Table) -> pa.Table:
        import duckdb

        con = duckdb.connect()
        con.register("_e", batch.select(["event_id"]))
        arr = con.execute(
            "SELECT md5(CAST(event_id AS VARCHAR)) AS a FROM _e"
        ).arrow()["a"]
        con.close()
        return batch.append_column("arrival", arr.combine_chunks().cast(pa.string()))

    ds = _read(sf_dir, "events", ["event_type", "event_id", "ts"]).map_batches(
        add_arrival, batch_format="pyarrow"
    )
    return windowed_counts_with_watermark(
        ds, key="event_type", ts_col="ts", arrival_col="arrival",
        window="1h", lateness=dt.timedelta(minutes=10),
    )


def q_top_users(sf_dir: str):
    """Top-10 users by exact cents-sum of value (sort + limit, O2 analog)."""
    import polars as pl

    agg = _grouped_sum(
        _read(sf_dir, "events", ["user_id", "value"]),
        ["user_id"],
        [(pl.col("value") * 100).round(0).cast(pl.Int64).sum().alias("_cents")],
        {"total_value_cents": ("_cents", "sum")},
    )
    top = agg.sort(["total_value_cents", "user_id"], descending=[True, False]).limit(10)
    tbl = _collect(top)  # ≤10 rows
    return tbl.append_column(
        "rank", pa.array(range(1, tbl.num_rows + 1), pa.int64())
    )


def q_top_events(sf_dir: str, k: int = 100):
    """Global top-k WITHOUT a global sort: per-batch local top-k (each batch
    forwards at most k rows) → tiny driver merge of k × n_batches candidates
    — the same pattern knn_brute_force uses.  A full ``ds.sort`` would be an
    all-to-all range shuffle of every event for a 100-row answer.
    Deterministic tie-break on event_id."""
    import polars as pl

    def local_topk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            (pl.col("value") * 100).round(0).cast(pl.Int64).alias("value_cents")
        )
        return (
            df.sort(["value_cents", "event_id"], descending=[True, False])
            .head(k)
            .select(["event_id", "value_cents"])
            .to_arrow()
        )

    cand = _collect(
        _read(sf_dir, "events", ["event_id", "value"]).map_batches(
            local_topk, batch_format="pyarrow"
        )
    )  # ≤ k rows per batch
    import polars as pl2

    top = (
        pl2.from_arrow(cand)
        .sort(["value_cents", "event_id"], descending=[True, False])
        .head(k)
        .to_arrow()
    )
    from docling_translate_ray.state.checkpoint import normalize_arrow_types

    top = normalize_arrow_types(top)
    return top.append_column("rank", pa.array(range(1, top.num_rows + 1), pa.int64()))


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped pricing summary, exact scaled-integer sums."""
    import polars as pl

    price_e2 = (pl.col("l_extendedprice") * 100).round(0).cast(pl.Int64)
    disc_e4 = (
        (pl.col("l_extendedprice") * (1 - pl.col("l_discount")) * 10000)
        .round(0)
        .cast(pl.Int64)
    )
    out = _grouped_sum(
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        ),
        ["l_returnflag", "l_linestatus"],
        [
            pl.col("l_quantity").cast(pl.Int64).sum().alias("_qty"),
            price_e2.sum().alias("_base"),
            disc_e4.sum().alias("_disc"),
            pl.len().cast(pl.Int64).alias("_n"),
        ],
        {
            "sum_qty": ("_qty", "sum"),
            "sum_base_price_cents": ("_base", "sum"),
            "sum_disc_price_e4": ("_disc", "sum"),
            "count_order": ("_n", "sum"),
        },
    )

    def add_avg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        avg = pc.divide(
            pc.cast(batch["sum_qty"], pa.float64()),
            pc.cast(batch["count_order"], pa.float64()),
        )
        return batch.append_column("avg_qty", avg)

    return out.map_batches(add_avg, batch_format="pyarrow")


# ------------------------------------------------------------------ joins


def q_segment_revenue(sf_dir: str):
    """Hash-partitioned shuffle join orders ⋈ customer (the large-side join
    path, J1/J2 at relational scale) → per-segment order count + exact
    cents revenue.

    The aggregation is pushed BELOW the join: orders pre-aggregate to one
    row per custkey first (combiner + hash partition), so the join moves
    |customers| rows instead of |orders| — the join-input-reduction rule
    that matters when orders ≫ customers."""
    import polars as pl

    from docling_translate_ray.util import join_partitions

    per_cust = _grouped_sum(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        ["o_custkey"],
        [
            pl.len().cast(pl.Int64).alias("_n"),
            (pl.col("o_totalprice") * 100).round(0).cast(pl.Int64).sum().alias("_cents"),
        ],
        {"n_orders": ("_n", "sum"), "cust_cents": ("_cents", "sum")},
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = per_cust.join(
        cust, join_type="inner", num_partitions=join_partitions(),
        on=("o_custkey",), right_on=("c_custkey",),
    )
    return _grouped_sum(
        joined.select_columns(["c_mktsegment", "n_orders", "cust_cents"]),
        ["c_mktsegment"],
        [
            pl.col("n_orders").sum().alias("_n"),
            pl.col("cust_cents").sum().alias("_cents"),
        ],
        {"n_orders": ("_n", "sum"), "total_price_cents": ("_cents", "sum")},
    )


class _AddNationName:
    """Broadcast-join probe: nation lookup fetched ONCE per actor."""

    def __init__(self, map_ref) -> None:
        import ray

        self._map = ray.get(map_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = [self._map.get(k, "?") for k in batch["c_nationkey"].to_pylist()]
        return batch.append_column("n_name", pa.array(names, pa.string()))


def q_nation_customers(sf_dir: str):
    """Broadcast join customer ⋈ nation (small side via ray.put, never a
    shuffle — SURVEY.md §2.4) → per-nation customer count + exact cents
    account balance."""
    import polars as pl
    import pyarrow.parquet as pq

    import ray

    from docling_translate_ray.util import auto_pool_size

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    map_ref = ray.put(dict(zip(nation["n_nationkey"].to_pylist(),
                               nation["n_name"].to_pylist())))
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"]).map_batches(
        _AddNationName,
        fn_constructor_kwargs={"map_ref": map_ref},
        batch_format="pyarrow",
        concurrency=auto_pool_size(),
    )
    return _grouped_sum(
        ds.select_columns(["n_name", "c_acctbal"]),
        ["n_name"],
        [
            pl.len().cast(pl.Int64).alias("_n"),
            (pl.col("c_acctbal") * 100).round(0).cast(pl.Int64).sum().alias("_cents"),
        ],
        {"n_customers": ("_n", "sum"), "total_acctbal_cents": ("_cents", "sum")},
    )


# ------------------------------------------------------------------ sessions


def q_user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization per user (stateful windowed op a training
    pipeline needs; no reference analog — SURVEY.md §2.6 O5).

    All events of a user are co-partitioned by ``hash(user_id)``; inside a
    partition the whole computation is one vectorized polars pass (sort →
    per-user time-delta → count gaps > threshold).
    """
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def block(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part)
        return (
            df.group_by("user_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                (
                    (pl.col("ts").sort().diff() > pl.duration(minutes=gap_minutes))
                    .sum().cast(pl.Int64) + 1
                ).alias("n_sessions"),
            )
            .to_arrow()
        )

    return hash_partition_apply(ds, ["user_id"], block, num_partitions=32)


# ------------------------------------------------------------------ lang map


def lang_map_batch(batch: pa.Table, column: str = "lang") -> pa.Table:
    """M20 analog: ISO-639-1 → engine codes with the reference's COMPLETE
    tables (functions/langcodes.py — 31 NLLB codes per nllb.py:27-58, DeepL
    normalization per translation/utils.py:26-48).  The NLLB probe is a
    vectorized dictionary replace; DeepL falls back to the scalar rule only
    for codes outside its explicit map (region variants)."""
    import polars as pl

    from docling_translate_ray.functions import langcodes as lc

    s = pl.Series(batch[column].to_pylist(), dtype=pl.String).fill_null("")
    nllb = s.replace_strict(
        old=list(lc.NLLB_LANG_CODES), new=list(lc.NLLB_LANG_CODES.values()),
        default="und",
    )
    # DeepL: 2-letter codes (the corpus shape) are a vectorized uppercase;
    # anything longer routes through the scalar normalization rule
    deepl = s.str.to_uppercase().to_list()
    long_mask = (s.str.len_chars() > 2).to_list()
    if any(long_mask):
        vals = s.to_list()
        for i, is_long in enumerate(long_mask):
            if is_long:
                deepl[i] = lc.to_deepl_lang(vals[i])
    return batch.append_column(
        "deepl_code", pa.array(deepl, pa.string())
    ).append_column(
        "nllb_code", nllb.to_arrow().cast(pa.string())
    )


def q_lang_map(sf_dir: str):
    return (
        _read(sf_dir, "documents", ["doc_id", "lang"])
        .map_batches(lang_map_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "lang", "deepl_code", "nllb_code"])
    )


def q_top_users_per_type(sf_dir: str, k: int = 3):
    """Top-k per group (grouped top-k, a shape Ray Data lacks natively):
    per event_type, the k users with the highest exact cents-sum.

    Two-level: per-batch partial sums → hash-partition by (event_type,
    user_id) final sums → ONE more tiny exchange keyed by event_type where
    each partition computes its groups' top-k vectorized (polars ``top_k``)
    — group count is small by then, rows = users×types."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    per_user = _grouped_sum(
        _read(sf_dir, "events", ["event_type", "user_id", "value"]),
        ["event_type", "user_id"],
        [(pl.col("value") * 100).round(0).cast(pl.Int64).sum().alias("_cents")],
        {"total_value_cents": ("_cents", "sum")},
    )

    def topk_block(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part)
        return (
            df.sort(["event_type", "total_value_cents", "user_id"],
                    descending=[False, True, False])
            .group_by("event_type", maintain_order=True)
            .head(k)
            .with_columns(
                pl.int_range(1, pl.len() + 1).over("event_type").alias("rank")
            )
            .to_arrow()
        )

    return hash_partition_apply(per_user, ["event_type"], topk_block,
                                num_partitions=8)


def q_last_view_before_purchase(sf_dir: str):
    """As-of join (attribution shape): per purchase event, the user's most
    recent 'view' event at-or-before it (functions/asof.py — one
    co-partitioning shuffle + per-partition polars join_asof)."""
    from docling_translate_ray.functions.asof import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def only(kind):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.equal(batch["event_type"], kind))

        return fn

    purchases = events.map_batches(only("purchase"), batch_format="pyarrow")
    views = events.map_batches(only("view"), batch_format="pyarrow")
    return asof_join(
        purchases, views, by="user_id", on="ts",
        left_cols=["user_id", "event_id", "ts"],
        right_value_col="ts", out_name="last_view_ts",
    )


# ------------------------------------------------------------------ curation


def q_curate(sf_dir: str):
    """Composite curation pipeline (quality → exact dedup → near-dedup);
    single row of per-stage survivor counts (pipelines/curate.py)."""
    from docling_translate_ray.pipelines.curate import curate_stats_table

    return curate_stats_table(_read(sf_dir, "documents", ["doc_id", "text"]))


# ------------------------------------------------------------------ multimodal


def q_media_features(sf_dir: str):
    """Actor-pool featurizer over a deterministic synthetic media table
    (binary payload columns; decode kernel stubbed — see multimodal.py)."""
    import ray.data

    from docling_translate_ray.util import auto_pool_size

    ds = ray.data.from_arrow(fmm.gen_media(300, seed=42))
    out = ds.map_batches(
        fmm.MediaFeaturizer,
        fn_constructor_kwargs={"dim": 16},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=auto_pool_size(),
    )
    return out.select_columns(["media_id", "kind", "payload_bytes"])


def q_video_frames(sf_dir: str):
    """Video frame sampling (resize+explode plumbing real, frame-grab
    stubbed — multimodal.py): one row per sampled frame."""
    import ray.data

    from docling_translate_ray.util import auto_pool_size

    ds = ray.data.from_arrow(fmm.gen_media(300, seed=42))
    resized = ds.map_batches(
        fmm.MediaResizer, batch_format="pyarrow", batch_size=64,
        concurrency=auto_pool_size(),
    )
    frames = resized.map_batches(
        fmm.FrameSampler, fn_constructor_kwargs={"every_ms": 10000},
        batch_format="pyarrow", batch_size=64, concurrency=auto_pool_size(),
    )
    return frames.select_columns(["media_id", "frame_ts_ms"])


# Deterministic sig-table paths shared with oracle_sql(): the queries
# below persist their (media_id, sig) tables here ATOMICALLY so the
# DuckDB oracle can hash-check the band grouping + closure half in SQL
# (bit_count(xor) <= 3 + recursive reach — the simhash_near_dup oracle
# pattern).  Content is deterministic (fixed-seed corpus + codec), so
# concurrent writers race only over identical bytes and os.replace keeps
# every reader on a complete file.
MEDIA_SIG_PATHS = {
    "image": "/tmp/dtr_sigs_image_240_60_7.parquet",
    "audio": "/tmp/dtr_sigs_audio_240_60_11.parquet",
}


def _persist_sigs_atomic(sigs: pa.Table, path: str) -> None:
    import os
    import tempfile

    import pyarrow.parquet as pqt

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                               suffix=".parquet")
    os.close(fd)
    pqt.write_table(sigs, tmp)
    os.replace(tmp, path)


def q_image_near_dup(sf_dir: str):
    """Perceptual-hash (aHash) image near-dup clustering over a synthetic
    corpus with planted perturbed duplicates: decode BMP -> 8x8 average
    hash per actor -> shared 64-bit Hamming core (4x16-bit pigeonhole
    buckets + distributed closure).  The codec half (BMP decode + aHash)
    stays value-pinned by the brute-force oracle in
    tests/test_functions.py::test_image_near_dup_matches_bruteforce; the
    banding + closure half is SQL-checked — the query persists the
    (media_id, ahash) table and the oracle recomputes Hamming<=3 pairs +
    recursive closure from it (VERDICT r03 item 4)."""
    import ray.data

    from docling_translate_ray.functions.dedup import hamming64_near_dup
    from docling_translate_ray.util import auto_pool_size, collect_to_table

    ds = ray.data.from_arrow(fmm.gen_image_corpus(240, 60, seed=7))
    sigs = collect_to_table(
        ds.map_batches(fmm.AHasher, batch_format="pyarrow",
                       concurrency=auto_pool_size()))
    _persist_sigs_atomic(sigs, MEDIA_SIG_PATHS["image"])
    return hamming64_near_dup(
        ray.data.from_arrow(sigs), id_column="media_id",
        sig_column="ahash").sort("media_id")


def q_audio_near_dup(sf_dir: str):
    """Audio near-dup clustering over a synthetic corpus with planted
    re-gained/re-noised duplicate clips: WAV decode -> 64-frame energy
    envelope fingerprint -> shared 64-bit Hamming core.  Codec half
    pytest-pinned (test_audio_near_dup_matches_bruteforce); banding +
    closure half SQL-checked from the persisted (media_id, audio_hash)
    table — see q_image_near_dup."""
    import ray.data

    from docling_translate_ray.functions.dedup import hamming64_near_dup
    from docling_translate_ray.util import auto_pool_size, collect_to_table

    ds = ray.data.from_arrow(fmm.gen_audio_corpus(240, 60, seed=11))
    sigs = collect_to_table(
        ds.map_batches(fmm.AudioHasher, batch_format="pyarrow",
                       concurrency=auto_pool_size()))
    _persist_sigs_atomic(sigs, MEDIA_SIG_PATHS["audio"])
    return hamming64_near_dup(
        ray.data.from_arrow(sigs), id_column="media_id",
        sig_column="audio_hash").sort("media_id")


def q_events_hopping(sf_dir: str):
    """Hopping 1h/15m sliding-window counts per event type
    (stages/window.hopping_window_counts): constant 4-way vectorized
    explode + combiner-first grouped_sum."""
    from docling_translate_ray.stages.window import hopping_window_counts

    return hopping_window_counts(
        _read(sf_dir, "events", ["ts", "event_type"]),
        key="event_type", ts_col="ts", size_minutes=60, hop_minutes=15,
    )


def q_pagerank(sf_dir: str):
    """Iterative link-graph centrality (functions/graph.pagerank_int):
    3 rounds of integer-exact PageRank over the affine out-edge rule."""
    from docling_translate_ray.functions.graph import pagerank_int

    return pagerank_int(_read(sf_dir, "documents", ["doc_id"]))


def q_anchor_text(sf_dir: str):
    """Per-target anchor-text aggregation (functions/graph.anchor_text_agg)
    over the affine link graph: each doc links to ``(id*m + a) % n`` per
    edge rule, carrying its own first-2-token phrase as the anchor."""
    import polars as pl

    from docling_translate_ray.functions.graph import DEFAULT_EDGES, anchor_text_agg

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()

    def edges(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            pl.col("text").fill_null("").str.extract_all(r"\S+")
            .list.head(2).list.join(" ").alias("anchor")
        )
        parts = [
            df.select(((pl.col("doc_id") * m + a) % n).alias("dst"), "anchor")
            for (m, a) in DEFAULT_EDGES
        ]
        return pl.concat(parts).to_arrow().cast(
            pa.schema([("dst", pa.int64()), ("anchor", pa.string())])
        )

    out = anchor_text_agg(docs.map_batches(edges, batch_format="pyarrow"))
    return out.map_batches(
        lambda b: b.rename_columns(
            ["doc_id" if c == "dst" else c for c in b.column_names]),
        batch_format="pyarrow",
    )


def q_purchase_attribution(sf_dir: str):
    """Range (interval) join: per purchase, count the same user's view
    events in the 30 minutes before it (functions/asof.range_join_count:
    merge-count kernel, one co-partition shuffle, no pair blowup)."""
    import datetime as dt

    from docling_translate_ray.functions.asof import range_join_count

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    purchases = ev.filter(expr="event_type == 'purchase'").map_batches(
        lambda b: b.select(["user_id", "event_id", "ts"]).rename_columns(
            ["user_id", "purchase_id", "ts"]),
        batch_format="pyarrow",
    )
    views = ev.filter(expr="event_type == 'view'")
    return range_join_count(
        purchases, views, by="user_id", left_on="ts", right_on="ts",
        lower=dt.timedelta(minutes=-30), upper=dt.timedelta(0),
        left_cols=["user_id", "purchase_id", "ts"], out_name="n_views",
    )


def q_blocklist_filter(sf_dir: str):
    """Host-blocklist anti-filter with a Bloom prefilter + exact confirm
    (functions/bloom.blocklist_filter): bloom-negative rows never enter
    the shuffle; the output equals the plain anti-join (the oracle)."""
    import ray.data

    from docling_translate_ray.functions import urltools
    from docling_translate_ray.functions.bloom import blocklist_filter

    def add_host(batch: pa.Table) -> pa.Table:
        import polars as pl

        hosts = urltools.extract_hosts(pl.from_arrow(batch["url"]))
        return batch.append_column(
            "host", hosts.to_arrow().cast(pa.string())
        ).select(["doc_id", "host"])

    docs = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        synth_url_variants_batch, batch_format="pyarrow"
    ).map_batches(add_host, batch_format="pyarrow")
    block = ray.data.from_arrow(pa.table({
        "host": pa.array([f"site{j}.example.com" for j in range(0, 97, 11)],
                         pa.string()),
    }))
    return blocklist_filter(docs, block, column="host")


def q_heavy_hitters(sf_dir: str):
    """Exact heavy-hitter tokens (global share >= 3%) via candidate
    generation + recount (functions/text_stats.heavy_hitters) — no
    vocabulary-sized shuffle."""
    return fts.heavy_hitters(_read(sf_dir, "documents", ["text"]))


def q_dup_span_mask(sf_dir: str):
    """Substring-level exact dedup: mask token spans covered by a 5-gram
    appearing in >=2 distinct docs (functions/ngram_spans.dup_span_mask)."""
    from docling_translate_ray.functions.ngram_spans import dup_span_mask

    return dup_span_mask(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_kmeans(sf_dir: str):
    """Distributed integer-exact Lloyd k-means (k=4, 2 update rounds) over
    the embeddings table (functions/knn.kmeans_int); output is the final
    cluster assignment per vector."""
    from docling_translate_ray.functions.knn import kmeans_int

    return kmeans_int(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                      k=4, iterations=2)


def q_semdedup(sf_dir: str):
    """SemDeDup (functions/semdedup): k-means (k=4, same integer-exact
    kernel the `kmeans` oracle unrolls) over the planted-twin embedding
    view, then within-cluster cosine-≥-0.9 pruning with keep-lowest-id
    priority.  The planted twins (cos ≥ 0.999 vs ≤ 0.52 unplanted) give
    the threshold real margin on both engines AND guarantee non-vacuous
    drops; oracle = the unrolled k-means CTE + an EXISTS over i<j
    same-cluster cosine pairs."""
    from docling_translate_ray.functions.semdedup import semdedup

    planted = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        plant_embedding_twins_batch, batch_format="pyarrow"
    )
    return semdedup(planted, k=4, iterations=2, threshold=0.9)


def q_dsir_score(sf_dir: str):
    """DSIR-style hashed-unigram importance scores (functions/dsir)
    against the target domain ``source = 'src1'``: integer-exact
    smoothed-ratio bucket weights over md5[:2] buckets, per-doc
    ``Σ cnt·S[bucket]``.  Zero-token docs are absent on both engines."""
    import hashlib as _hl

    from docling_translate_ray.functions.dsir import dsir_score

    scratch = "/tmp/dtr_dsir_" + _hl.md5(sf_dir.encode()).hexdigest()[:8]
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def mark_target(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "is_target", pc.equal(batch["source"], "src1")
        ).drop_columns(["source"])

    return dsir_score(docs.map_batches(mark_target, batch_format="pyarrow"),
                      scratch_dir=scratch)


def q_nb_classifier(sf_dir: str):
    """Trained quality classifier (functions/classifier.py): integer
    Naive-Bayes-analog fit on a deterministic 50% md5 split with
    planted-truth labels (more ``customer`` than ``scan`` tokens —
    balanced ~0.38 positive, and genuinely learnable from per-bucket
    count ratios: held-out accuracy 0.84–0.89 vs the 0.62–0.65
    majority baseline), scoring every held-out doc with symmetric
    scaled likelihood-ratios — the learned web-filter slot
    (CCNet/RefinedWeb).  Training is pure counting, so the WHOLE
    train→predict pipeline replays in SQL (full hash oracle);
    zero-token docs are absent on both engines."""
    import hashlib as _hl
    import shutil
    import tempfile

    import polars as pl

    from docling_translate_ray.functions.classifier import nb_classify

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def mark(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        # label: planted truth — MORE 'customer' than 'scan' tokens
        # (the oracle replays it with list_filter over @NONWS@).
        # split: md5 of the id STRING (ids only — cheap; text hashing
        # stays vectorized xx64 elsewhere), first hex digit < '8'.
        ids = df["doc_id"].to_list()
        tr = [_hl.md5(str(i).encode()).hexdigest()[0] <= "7" for i in ids]
        toks = pl.col("text").fill_null("").str.extract_all(r"\S+")
        return (
            df.with_columns(
                (toks.list.count_matches("customer")
                 > toks.list.count_matches("scan")).alias("label"),
                pl.Series("is_train", tr, dtype=pl.Boolean),
            ).to_arrow()
        )

    tmp = tempfile.mkdtemp(prefix="dtr_nb_")
    try:
        out = nb_classify(docs.map_batches(mark, batch_format="pyarrow"),
                          scratch_dir=tmp)
        # pin before the scratch feature parquet vanishes
        return _collect(out).sort_by("doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_mixture(sf_dir: str):
    """Composite mixture builder (pipelines/mixture.py): quality gate →
    DSIR scores vs source='src1' → 50%-token-budget selection →
    α=0.5 language rebalancing.  The oracle replays the END-TO-END
    recipe in one SQL statement (quality formula + DSIR CTEs + budget
    window cumsum + sqrt-quota rank).  hash_mode='md5' keeps the
    rebalance rank SQL-replayable; production defaults to the
    vectorized xx64.  work_dir=None → a per-process temp dir (a shared
    path raced between concurrent bench/contract runs)."""
    import pyarrow.compute as pc

    from docling_translate_ray.pipelines.mixture import build_mixture

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_target", pc.equal(batch["source"], "src1")
        ).drop_columns(["source"])

    final, _stats = build_mixture(
        docs.map_batches(mark, batch_format="pyarrow"), hash_mode="md5")
    return final.select_columns(["doc_id", "lang", "n_tokens", "dsir_score"])


def q_bpe_pair_counts(sf_dir: str):
    """Top-50 BPE merge-candidate pairs (functions/bpe): adjacent
    code-point pairs inside \\S+ tokens, counted with multiplicity,
    combiner-first single pair-keyed exchange, local-topk merge."""
    from docling_translate_ray.functions.bpe import bpe_pair_counts

    return bpe_pair_counts(_read(sf_dir, "documents", ["text"]), k=50)


def q_bpe_train(sf_dir: str):
    """Full iterative BPE tokenizer training (functions/bpe.bpe_train):
    8 greedy merges over the documents corpus — corpus touched once
    (word-freq build), then vocab-sized iterations; rows-only driver
    check (the merge loop is the pagerank/kmeans class of iterative
    ops), value-pinned in pytest against a pure-Python reference and
    partition-invariant; iteration 1's ranking is oracle-covered by
    ``bpe_pair_counts``."""
    from docling_translate_ray.functions.bpe import bpe_train

    return bpe_train(_read(sf_dir, "documents", ["text"]), n_merges=8)


def q_bpe_encode(sf_dir: str):
    """Tokenizer APPLICATION (functions/bpe.bpe_encode): train 8 merges
    with ``bpe_train``, then encode the whole corpus with the trained
    table through the BPEEncoder actor pool (per-actor word→length memo
    carries across batches).  No SQL oracle exists for the iterative
    training loop, but the row now checks VALUES: every output row
    carries ``n_bpe_expected`` from the pure-Python reference encoder
    (plain per-word loop over the same pinned merge table — none of the
    distributed machinery) and the query RAISES on any mismatch, so a
    distributed-encode defect fails the driver row instead of passing
    rows-only (VERDICT r03 item 8)."""
    from docling_translate_ray.functions.bpe import (
        bpe_encode,
        bpe_train,
        reference_token_counts,
    )

    merges_tbl = bpe_train(_read(sf_dir, "documents", ["text"]), n_merges=8)
    enc = _collect(
        bpe_encode(_read(sf_dir, "documents", ["doc_id", "text"]),
                   merges_tbl)).sort_by("doc_id")
    docs = _collect(
        _read(sf_dir, "documents", ["doc_id", "text"])).sort_by("doc_id")
    merges = list(zip(merges_tbl["left"].to_pylist(),
                      merges_tbl["right"].to_pylist()))
    expected = reference_token_counts(docs["text"].to_pylist(), merges)
    got = enc["n_bpe_tokens"].to_pylist()
    if got != expected:
        bad = next(i for i, (g, e) in enumerate(zip(got, expected)) if g != e)
        raise AssertionError(
            f"bpe_encode diverged from the reference encoder at row {bad}: "
            f"got {got[bad]}, expected {expected[bad]}")
    return enc.append_column(
        "n_bpe_expected", pa.array(expected, pa.int64()))


def q_train_shards(sf_dir: str):
    """Deterministic global-shuffle training-shard layout
    (functions/shards.train_shards): md5-of-salted-doc-id shuffle key,
    hex-prefix shard pick (16 shards), within-shard full-key order.
    Returns per-shard (n_docs, total_chars, order_check); order_check
    is rank-weighted, so the DuckDB ``row_number() OVER (PARTITION BY
    shard ORDER BY key)`` oracle proves the exact within-shard
    sequence, not just membership."""
    from docling_translate_ray.functions.shards import train_shards

    return train_shards(
        _read(sf_dir, "documents", ["doc_id", "text"]), hex_digits=1
    )


def q_quality_tiers(sf_dir: str):
    """CCNet-style head/middle/tail corpus tiering
    (functions/text_stats.quality_tiers): integer fluency score
    (commonness_sum // n_tokens), quantile_disc tercile boundaries,
    per-doc tier label — the tier-extraction step; oracle embeds the
    word_commonness CTE + quantile_disc + the same CASE."""
    return fts.quality_tiers(_read(sf_dir, "documents", ["doc_id", "text"]))


def q_bitext_mine(sf_dir: str):
    """Mutual-top-1 bitext mining (functions/bitext) between the even-id
    and odd-id halves of the embeddings table (a deterministic stand-in
    for two language sides sharing one embedding space).  Rank-only
    decisions (ORDER BY cos DESC, id — the knn_topk oracle's robustness
    argument); oracle = cross-join cosine + two row_number windows +
    INTERSECT."""
    import pyarrow.compute as pc

    from docling_translate_ray.functions.bitext import bitext_mine

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def parity(keep: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch["vec_id"], 1), keep))
        return fn

    src = emb.map_batches(parity(0), batch_format="pyarrow")
    tgt = emb.map_batches(parity(1), batch_format="pyarrow")
    return bitext_mine(src, tgt)


def q_lang_rebalance(sf_dir: str):
    """Temperature-flattened (α=0.5) language rebalancing
    (functions/sampling.lang_rebalance): keep floor(sqrt(n_lang))·8 docs
    per language, chosen by ascending (md5(text), doc_id) rank
    (hash_mode='md5' = SQL-oracle lockstep; production default xx64)."""
    from docling_translate_ray.functions.sampling import lang_rebalance

    return lang_rebalance(
        _read(sf_dir, "documents", ["doc_id", "lang", "text"]),
        quota_scale=8, hash_mode="md5")


def q_search_rank(sf_dir: str):
    """Ranked retrieval through the inverted index's pruned partition
    reads (functions/index.search_rank): integer-exact tf·(N−df) scores
    for every doc matching the fixed query terms."""
    import hashlib

    from docling_translate_ray.functions import index as fidx

    idx_dir = "/tmp/dtr_inv_index_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    fidx.build_inverted_index(docs, idx_dir, num_partitions=16)
    return fidx.search_rank(idx_dir, [t for t in _INDEX_LOOKUP_TERMS],
                            n_docs=docs.count())


def q_lm_score(sf_dir: str):
    """Integer-exact bigram-LM fluency scoring (functions/lm
    .bigram_lm_score) over the documents table — the CCNet/KenLM
    perplexity-filter analog at the bigram level: per-doc
    Σ cnt·S[w1,w2] with add-one-smoothed scaled conditional
    probabilities; oracle replays the c2/c1/V CTEs in HUGEINT."""
    import hashlib as _hl

    from docling_translate_ray.functions.lm import bigram_lm_score

    scratch = "/tmp/dtr_lm_" + _hl.md5(sf_dir.encode()).hexdigest()[:8]
    return bigram_lm_score(
        _read(sf_dir, "documents", ["doc_id", "text"]), scratch_dir=scratch)


def q_bitext_align(sf_dir: str):
    """Gale-Church sentence alignment (functions/bitext
    .gale_church_align) over deterministic pseudo-bitext pairs built
    from the documents table: src = the doc's words chunked into
    5-word sentences; tgt = a per-doc deterministic perturbation
    (doc_id % 3: identity / first-two-merged / first-dropped) so the
    output provably contains 1-1, 2-1 and deletion beads — non-vacuous
    rows-only evidence (a float-cost DP has no SQL oracle; golden beads
    and structural invariants are pinned in tests/test_bitext_align.py)."""
    from docling_translate_ray.functions.bitext import gale_church_align

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def build_pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        pair_id, srcs, tgts = [], [], []
        for d, t in zip(ids, texts):
            ws = (t or "").split()
            sents = [" ".join(ws[i:i + 5]) for i in range(0, len(ws), 5)]
            tgt = list(sents)
            if d % 3 == 1 and len(tgt) >= 2:
                tgt = [tgt[0] + " " + tgt[1]] + tgt[2:]
            elif d % 3 == 2 and len(tgt) >= 1:
                tgt = tgt[1:]
            pair_id.append(d)
            srcs.append(sents)
            tgts.append(tgt)
        return pa.table({
            "pair_id": pa.array(pair_id, pa.int64()),
            "src_sents": pa.array(srcs, pa.list_(pa.string())),
            "tgt_sents": pa.array(tgts, pa.list_(pa.string())),
        })

    return gale_church_align(
        docs.map_batches(build_pairs, batch_format="pyarrow"))


def q_bitext_pipeline(sf_dir: str):
    """The full bitext factory composite (pipelines/bitext
    .run_bitext_job): URL-pattern pair mining → broadcast-or-exchange
    semi-filtered sentencization → Gale-Church alignment with text
    emission and join-free lineage passthrough, staged through durable
    parquet with resume markers.  Corpus: the q_url_pair_mine
    deterministic multilingual-site view of the documents table, text
    included.

    Returns the per-pair TILING projection of the beads, hash-checked
    in SQL (VERDICT r03 item 6): the DP itself has no SQL analog, but
    its output invariants do — per (pair_id, tgt_id) the beads must
    cover the source and target sentence sequences exactly once, so
    ``src_sents`` / ``tgt_sents`` (the bead src_n/tgt_n sums) equal the
    sentencization rule ceil(words/5) applied to the pair's documents,
    pair membership equals the url_pair_mine oracle, and ``tiled_ok``
    (every bead's lo == the running sum of earlier beads' n, both
    sides) is 1 everywhere.  Bead-level goldens stay in
    tests/test_bitext_align.py / test_bitext_pipeline.py."""
    import polars as pl

    from docling_translate_ray.pipelines.bitext import run_bitext_job
    from docling_translate_ray.stages.shuffle import hash_partition_apply

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            ("https://s" + ((pl.col("doc_id") // 3) % 211).cast(pl.String)
             + ".example/" + pl.col("lang") + "/a"
             + (pl.col("doc_id") // 3).cast(pl.String)).alias("url"))
        return df.select(["doc_id", "url", "text"]).to_arrow()

    beads, _stats = run_bitext_job(
        docs.map_batches(synth, batch_format="pyarrow"), num_partitions=16)

    out_schema = pa.schema([
        ("pair_id", pa.int64()), ("tgt_id", pa.int64()),
        ("tgt_lang", pa.string()), ("src_sents", pa.int64()),
        ("tgt_sents", pa.int64()), ("tiled_ok", pa.int64()),
    ])

    def tiling(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        df = (pl.from_arrow(part)
              .sort(["pair_id", "tgt_id", "bead_id"])
              .with_columns(
                  (pl.col("src_n").cum_sum().over(["pair_id", "tgt_id"])
                   - pl.col("src_n")).alias("_es"),
                  (pl.col("tgt_n").cum_sum().over(["pair_id", "tgt_id"])
                   - pl.col("tgt_n")).alias("_et")))
        agg = df.group_by(["pair_id", "tgt_id"]).agg(
            pl.col("tgt_lang").first(),
            pl.col("src_n").sum().cast(pl.Int64).alias("src_sents"),
            pl.col("tgt_n").sum().cast(pl.Int64).alias("tgt_sents"),
            ((pl.col("src_lo") == pl.col("_es"))
             & (pl.col("tgt_lo") == pl.col("_et"))).all()
            .cast(pl.Int64).alias("tiled_ok"),
        )
        return agg.select(out_schema.names).to_arrow().cast(out_schema)

    narrow = beads.select_columns(
        ["pair_id", "tgt_id", "tgt_lang", "bead_id",
         "src_lo", "src_n", "tgt_lo", "tgt_n"])
    return hash_partition_apply(narrow, ["pair_id", "tgt_id"], tiling,
                                num_partitions=16)


def q_boilerplate_strip(sf_dir: str):
    """jusText-style block-level boilerplate removal (functions/
    boilerplate.strip_boilerplate) over a deterministic blocked-HTML
    view of the documents table: each doc's words wrap into 12-word
    ``<p>`` blocks, every 5th block is fully link-wrapped (link
    density 1 → dropped by the ≥½ rule), plus a ``<nav>`` menu, a
    2-word "Read more" teaser (``min_words`` rule) and a ``<footer>``
    (tag rule).  The oracle replays the planted construction: kept =
    12-word chunks with chunk_index % 5 ≠ 4 and ≥ 5 words, joined in
    page order."""
    from docling_translate_ray.functions.boilerplate import strip_boilerplate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        htmls = []
        for d, t in zip(ids, texts):
            ws = (t or "").split()
            parts = [f'<nav><a href="/">Home</a> | '
                     f'<a href="/c{d % 7}">Cat {d % 7}</a></nav>']
            for ci in range((len(ws) + 11) // 12):
                s = " ".join(ws[ci * 12:ci * 12 + 12])
                if ci % 5 == 4:
                    parts.append(f'<p><a href="/l{ci}">{s}</a></p>')
                else:
                    parts.append(f"<p>{s}</p>")
            parts.append("<p>Read more</p>")
            parts.append(
                f"<footer>© host{d % 211} all rights reserved</footer>")
            htmls.append("<html><body>" + "".join(parts) + "</body></html>")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(htmls, pa.string()),
        })

    return strip_boilerplate(docs.map_batches(synth, batch_format="pyarrow"))


def q_host_components(sf_dir: str):
    """Host-graph connected components (functions/graph
    .host_components) over a deterministic chain-structured host graph:
    hosts ``host0..host96.example`` linked as 14 chains of 7
    (``h → h-1`` unless ``h % 7 == 0``), so the closure is genuinely
    multi-hop (depth 6) and the canonical label is the component's
    lexicographic MIN host string (``host10`` < ``host2`` — string
    order, not numeric).  Oracle = recursive-CTE reachability +
    min-string per host."""
    import polars as pl

    from docling_translate_ray.functions.graph import host_components

    docs = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch)
              .with_columns((pl.col("doc_id") % 97).alias("_h"))
              .filter(pl.col("_h") % 7 != 0)
              .select(
                  ("host" + pl.col("_h").cast(pl.String) + ".example")
                  .alias("src_host"),
                  ("host" + (pl.col("_h") - 1).cast(pl.String) + ".example")
                  .alias("dst_host")))
        return df.to_arrow().cast(pa.schema([
            ("src_host", pa.string()), ("dst_host", pa.string())]))

    return host_components(docs.map_batches(synth, batch_format="pyarrow"))


def q_trim_repeated_lines(sf_dir: str):
    """Within-doc repeated-line trimming (functions/dedup
    .trim_repeated_lines) over an 8-word-line view of the documents
    table with PLANTED repetitions (after every 3rd line the doc's
    first line is re-inserted), so the trim provably fires; natural
    chunk repeats are handled too because BOTH engines run the same
    general first-occurrence rule over the same view."""
    from docling_translate_ray.functions.dedup import trim_repeated_lines

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = []
        for t in texts:
            ws = (t or "").split()
            lines = [" ".join(ws[k * 8:k * 8 + 8])
                     for k in range((len(ws) + 7) // 8)]
            built = []
            for i, ln in enumerate(lines, start=1):
                built.append(ln)
                if i % 3 == 0:
                    built.append(lines[0])
            out.append("\n".join(built))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out, pa.string()),
        })

    return trim_repeated_lines(docs.map_batches(synth, batch_format="pyarrow"))


def q_pq_topk(sf_dir: str):
    """Product-quantization ANN (functions/pq): train m=2 per-subspace
    integer codebooks (k=4, 2 Lloyd iterations — the q_kmeans recipe
    per subspace), encode every embedding to 2 codes, and answer a
    top-10 asymmetric-distance query (query = the vec_id=5 embedding).
    Integer-exact end to end, so the oracle (two unrolled k-means
    chains over the d-ranges + LUT join + rank window) hash-matches."""
    from docling_translate_ray.functions.pq import pq_topk, pq_train_encode

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    codes, codebooks = pq_train_encode(emb, m=2, k=4, iterations=2)
    qrow = emb.filter(expr="vec_id == 5").take(1)
    return pq_topk(codes, codebooks, list(qrow[0]["embedding"]), k=10)


def q_ivfpq_topk(sf_dir: str):
    """IVF-PQ standing index (functions/pq.build_ivfpq_index): coarse
    k=4 integer k-means partitions + m=2 PQ codes per vector, persisted
    as cpart-partitioned parquet of code rows; the query runs FULL
    probe (n_probe = n_coarse), which is exact-equal to flat pq_topk by
    construction — so this entry hash-checks against the IDENTICAL
    pq_topk oracle SQL (the knn_ivf-vs-knn_topk pattern).  The pruning
    proof (delete un-probed partitions, answers unchanged) lives in
    tests/test_pq.py."""
    import shutil
    import tempfile

    from docling_translate_ray.functions.pq import build_ivfpq_index, ivfpq_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # per-process dir: a shared hash-of-sf_dir path raced when bench.py and
    # check_contract.py rebuilt/read the same index concurrently (ADVICE r03)
    idx = tempfile.mkdtemp(prefix="dtr_ivfpq_")
    try:
        build_ivfpq_index(emb, idx, n_coarse=4, m=2, k=4, iterations=2)
        qrow = emb.filter(expr="vec_id == 5").take(1)
        return ivfpq_topk(idx, list(qrow[0]["embedding"]), n_probe=4, k=10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_ivfpq_residual(sf_dir: str):
    """Residual-encoded IVF-PQ — IVFADC (functions/pq.build_ivfpq_index
    residual=True): PQ codes quantize ``vec − coarse_centroid`` instead
    of the raw vector, and every probed partition scores with its OWN
    per-cluster query-residual lookup table.  Full probe here, so the
    oracle replays the WHOLE integer pipeline in SQL: coarse k-means
    chain → residual view (val − cval + 2·OFFSET, the exact stored
    domain) → per-subspace k-means chains over residuals → per-(coarse,
    code) LUTs → rank.  The quantization-error win over raw codes is
    measured in tests/test_pq.py on planted clusters."""
    import shutil
    import tempfile

    from docling_translate_ray.functions.pq import build_ivfpq_index, ivfpq_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    idx = tempfile.mkdtemp(prefix="dtr_ivfpq_res_")
    try:
        build_ivfpq_index(emb, idx, n_coarse=4, m=2, k=4, iterations=2,
                          residual=True)
        qrow = emb.filter(expr="vec_id == 5").take(1)
        return ivfpq_topk(idx, list(qrow[0]["embedding"]), n_probe=4, k=10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_warc_digest_dedup(sf_dir: str):
    """Ingest-level exact dedup by the real ``WARC-Payload-Digest``
    annotation (sources/warc.warc_digest_dedup — the Common Crawl
    practice): segments planted from `documents` with every
    ``doc_id % 7 == 3`` page replaced by one constant body (one big
    digest group; all other pages embed their doc_id so they stay
    singletons), headers-only scan, one narrow keyed exchange,
    canonical = lexicographic-min url.  The oracle replays the
    equivalence classes from the plant rule (sha1 values themselves
    never reach the output — DuckDB has no sha1)."""
    import datetime as _dt
    import os
    import shutil
    import tempfile
    import uuid

    from docling_translate_ray.sources.warc import (
        build_warc_bytes,
        warc_digest_dedup,
    )

    tmp = tempfile.mkdtemp(prefix="dtr_wdigest_")
    try:
        ts = _dt.datetime(2017, 3, 6, 4, 3, 53)
        CONST = b"<html><body><p>syndicated boilerplate page</p></body></html>"

        def write_segment(batch: pa.Table) -> pa.Table:
            recs = []
            for i, t, l in zip(batch["doc_id"].to_pylist(),
                               batch["text"].to_pylist(),
                               batch["lang"].to_pylist()):
                body = (CONST if i % 7 == 3 else
                        corpus.doc_row_to_page_html(i, t or "", l or "")
                        .encode("utf-8"))
                recs.append((f"doc://{i}", ts, body, l or ""))
            blob = build_warc_bytes(recs, gzip_per_record=True)
            with open(os.path.join(tmp, f"seg-{uuid.uuid4().hex}.warc.gz"),
                      "wb") as f:
                f.write(blob)
            return pa.table({"n": pa.array([len(recs)], pa.int64())})

        _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
            write_segment, batch_format="pyarrow").materialize()
        return _collect(warc_digest_dedup(tmp)).sort_by("url")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_corpus_factory(sf_dir: str):
    """The END-TO-END corpus factory (pipelines/factory.corpus_factory):
    WARC segments (the webcurate synth pages with real CC content-
    language headers) → main-content extraction → curate (quality →
    exact dedup → near-dedup) → mixture (DSIR vs lang='en' → 50%-token
    budget → α=0.5 rebalance) → training shards → .jsonl.gz export
    with read-back verification.  One stats row whose counts AND
    value-pinning aggregates (mixture token/score sums, rank-weighted
    shard order checksum) a single composed DuckDB oracle replays from
    the raw documents — ids are SQL-replayable via ``id_regex`` over
    the planted urls; production uses the url-hash default."""
    import os
    import shutil
    import tempfile

    from docling_translate_ray.pipelines.factory import (
        corpus_factory,
        synth_warc_corpus,
    )

    tmp = tempfile.mkdtemp(prefix="dtr_factory_q_")
    try:
        synth_warc_corpus(sf_dir, os.path.join(tmp, "warc"))
        out, _dirs = corpus_factory(
            os.path.join(tmp, "warc"),
            work_dir=os.path.join(tmp, "work"),
            id_regex=r"d(\d+)\.example", target_lang="en",
            hash_mode="md5")
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def webcurate_synth_html(doc_id: int, text: str) -> bytes:
    """The planted-truth page layout the webcurate / boilerplate
    oracles replay: nav chrome, the doc's words re-cut into 12-word
    ``<p>`` chunks with every 5th fully link-wrapped (link density 1),
    a teaser, and a host-templated footer.  Shared by q_webcurate and
    the corpus-factory WARC plant so ONE SQL CTE chain covers both."""
    ws = (text or "").split()
    d = doc_id
    parts = [f'<nav><a href="/">Home</a> | '
             f'<a href="/c{d % 7}">Cat {d % 7}</a></nav>']
    for ci in range((len(ws) + 11) // 12):
        s = " ".join(ws[ci * 12:ci * 12 + 12])
        if ci % 5 == 4:
            parts.append(f'<p><a href="/l{ci}">{s}</a></p>')
        else:
            parts.append(f"<p>{s}</p>")
    parts.append("<p>Read more</p>")
    parts.append(f"<footer>© host{d % 211} all rights reserved</footer>")
    return ("<html><body>" + "".join(parts) + "</body></html>") \
        .encode("utf-8")


def q_webcurate(sf_dir: str):
    """The north-star first mile end to end with a FULL composed SQL
    oracle (pipelines/curate.curate_pages): the q_boilerplate_strip
    blocked-HTML view of the documents table (one unique synthetic url
    per doc) → boilerplate strip → quality → exact dedup → near-dedup
    → one row of per-stage counts.  The ids inside the pipeline are
    polars url hashes (not SQL-reproducible), but every COUNT is
    id-invariant — exact-dedup groups are keyed on md5(text) and
    near-dup clusters on the text's gram sets, so which member wins
    never changes the survivor counts.  Oracle = the boilerplate
    kept-chunk CTE feeding the curate counts chain."""
    from docling_translate_ray.pipelines.curate import curate_pages

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        urls = [f"https://d{d}.example/a" for d in ids]
        htmls = [webcurate_synth_html(d, t or "")
                 for d, t in zip(ids, texts)]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
        })

    _, stats = curate_pages(docs.map_batches(synth, batch_format="pyarrow"))
    return pa.table({k: pa.array([v], pa.int64()) for k, v in stats.items()})


def q_bm25_rank(sf_dir: str):
    """Okapi BM25 ranked retrieval (functions/index.bm25_rank) through
    the inverted index's pruned partition reads: integer fixed-point
    (milli) tf saturation + doc-length normalization so the SQL oracle
    replays the exact scores; dl rides on every posting row (stored at
    build), so scoring needs no doc-side join.  n_docs / avgdl are the
    corpus stats the ingest pipeline maintains — computed here with one
    narrow token-count pass."""
    import tempfile

    import polars as pl

    from docling_translate_ray.functions import index as fidx

    idx_dir = tempfile.mkdtemp(prefix="dtr_bm25_")
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    fidx.build_inverted_index(docs, idx_dir, num_partitions=16)

    def tok_counts(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch["text"]).fill_null("")
        return pa.table({
            "n_docs": pa.array([len(s)], pa.int64()),
            "n_tokens": pa.array(
                [int(s.str.count_matches(r"\S+").sum() or 0)], pa.int64()),
        })

    stats = docs.map_batches(tok_counts, batch_format="pyarrow").to_pandas()
    n_docs = int(stats["n_docs"].sum())
    avgdl = int(stats["n_tokens"].sum()) // max(1, n_docs)
    return fidx.bm25_rank(idx_dir, list(_INDEX_LOOKUP_TERMS),
                          n_docs=n_docs, avgdl=avgdl)


def q_profile_orders(sf_dir: str):
    """Single-pass column profiling (functions/profile.profile_columns)
    of the orders table's integer/string columns: per column row count,
    null count, exact distinct count, canonical-string min/max."""
    from docling_translate_ray.functions.profile import profile_columns

    return profile_columns(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"])


def q_url_pair_mine(sf_dir: str):
    """CCAligned/STRAND-style URL-pattern bitext document alignment
    (functions/urltools.url_pair_mine) over deterministic multilingual
    site URLs built from the documents table (groups of 3 consecutive
    doc_ids share one site+path, each under its own real lang segment):
    star the language segment, one representative per (site_key, lang),
    pair the en representative with every other-language representative.
    Oracle mirrors the regexes and the min-id pairing rule-for-rule."""
    import polars as pl

    from docling_translate_ray.functions.urltools import url_pair_mine

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def synth(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            ("https://s" + ((pl.col("doc_id") // 3) % 211).cast(pl.String)
             + ".example/" + pl.col("lang") + "/a"
             + (pl.col("doc_id") // 3).cast(pl.String)).alias("url"))
        return df.select(["doc_id", "url"]).to_arrow()

    return url_pair_mine(docs.map_batches(synth, batch_format="pyarrow"))


def q_cdx_lookup(sf_dir: str):
    """CDX-style sorted URL index (functions/cdx — the Common-Crawl
    index-service analog) over a deterministic crawl-variant URL view
    with SURT-canonicalization noise on every axis: mixed-case scheme /
    host / path, a ``user@`` userinfo on every 11th url, a leading
    ``WWW.`` on evens, a default ``:443`` port on every 5th, a query
    string on every 3rd and a fragment on every 4th.  Build a
    range-partitioned SURT index in a fresh tempdir, then resolve one
    host-prefix lookup (``com,example,host-7)``) reading only the
    partitions whose boundary range intersects the prefix.  The oracle
    rebuilds url + SURT with the same regex chain (RE2 ∩ rust-regex)
    and filters ``starts_with``."""
    import tempfile

    import polars as pl

    from docling_translate_ray.functions.cdx import (build_url_index,
                                                     url_index_lookup)

    def cdx_view(batch: pa.Table) -> pa.Table:
        d = pl.col("doc_id")
        url = (
            pl.lit("HTTPS://")
            + pl.when(d % 11 == 0).then(pl.lit("user@"))
            .otherwise(pl.lit(""))
            + pl.when(d % 2 == 0).then(pl.lit("WWW.")).otherwise(pl.lit(""))
            + pl.lit("Host-") + (d % 23).cast(pl.String)
            + pl.lit(".Example.COM")
            + pl.when(d % 5 == 0).then(pl.lit(":443")).otherwise(pl.lit(""))
            + pl.lit("/Sec") + (d % 7).cast(pl.String)
            + pl.lit("/Page/") + d.cast(pl.String)
            + pl.when(d % 3 == 0).then(pl.lit("?q=") + d.cast(pl.String))
            .otherwise(pl.lit(""))
            + pl.when(d % 4 == 0).then(pl.lit("#frag")).otherwise(pl.lit(""))
        )
        return (
            pl.from_arrow(batch.select(["doc_id"]))
            .select(d.cast(pl.Int64), url.alias("url"))
            .to_arrow()
            .cast(pa.schema([("doc_id", pa.int64()), ("url", pa.string())]))
        )

    urls = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        cdx_view, batch_format="pyarrow")
    idx = tempfile.mkdtemp(prefix="dtr_cdx_")
    build_url_index(urls, idx, num_partitions=8)
    return url_index_lookup(idx, "com,example,host-7)")


def q_ivfpq_insert(sf_dir: str):
    """Incremental vector upsert into the standing IVF-PQ index
    (functions/pq.ivfpq_insert): build on the base 80% (vec_id < 400),
    append the remaining 20% encoded with the FROZEN base-trained
    model (no retrain — the standard IVF incremental contract), run
    the LSM compact, then answer a full-probe query over the merged
    generations.  The oracle replays the split exactly: the per-
    subspace k-means chains TRAIN on base rows only and ASSIGN over
    the union (the _pq_chain asrc parameter), so every inserted code
    is derived from the frozen codebooks, bit for bit."""
    import shutil
    import tempfile

    from docling_translate_ray.functions.pq import (build_ivfpq_index,
                                                    ivfpq_compact,
                                                    ivfpq_insert,
                                                    ivfpq_topk)

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    idx = tempfile.mkdtemp(prefix="dtr_ivfpq_ins_")
    try:
        build_ivfpq_index(emb.filter(expr="vec_id < 400"), idx,
                          n_coarse=4, m=2, k=4, iterations=2)
        ivfpq_insert(emb.filter(expr="vec_id >= 400"), idx)
        ivfpq_compact(idx)
        qrow = emb.filter(expr="vec_id == 5").take(1)
        return ivfpq_topk(idx, list(qrow[0]["embedding"]), n_probe=4,
                          k=10)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def q_fix_mojibake(sf_dir: str):
    """Mojibake repair (functions/normalize.fix_mojibake_docs — the
    CCNet/ftfy encoding-fix slot): the corpus text is clean, so every
    5th doc gets _cp1252_garble(MOJIBAKE_SAMPLE) appended IN the query
    (the normalize_text perturbed-row recipe) — the fixer must restore
    those rows to the clean sample and leave every other row
    byte-identical (chars_removed 0).  The oracle plants the identical
    chr()-literal and replays the frozen replace chain in the same
    order (both generated from MOJIBAKE_TABLE — one source of
    truth)."""
    import polars as pl

    from docling_translate_ray.functions.normalize import (
        MOJIBAKE_SAMPLE, _cp1252_garble, fix_mojibake_docs)

    plant = _cp1252_garble(MOJIBAKE_SAMPLE)

    def perturb(batch: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(batch)
            .with_columns(
                pl.when(pl.col("doc_id") % 5 == 0)
                .then(pl.col("text") + pl.lit(plant))
                .otherwise(pl.col("text"))
                .alias("text"))
            .to_arrow()
        )
        return out.cast(batch.schema)

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        perturb, batch_format="pyarrow")
    return fix_mojibake_docs(docs)


def q_pub_dates(sf_dir: str):
    """Publish-date extraction (functions/dates.extract_pub_dates —
    the trafilatura/htmldate slot): the corpus has no page metadata,
    so url+html are synthesized IN the query from doc_id arithmetic —
    one rung of the evidence ladder planted per doc_id%6 residue
    (meta / time / url-path / body-text / meta-vs-url conflict /
    nothing), every date string derived from doc_id so the oracle
    replants bit-identically.  The conflict residue (4) proves the
    frozen precedence, not just single-rung extraction."""
    import polars as pl

    from docling_translate_ray.functions.dates import extract_pub_dates

    def _iso(yoff, moff, doff, sep: str):
        did = pl.col("doc_id")
        return pl.concat_str([
            ((did + yoff) % 24 + 2001).cast(pl.String), pl.lit(sep),
            ((did + moff) % 12 + 1).cast(pl.String).str.zfill(2),
            pl.lit(sep),
            ((did + doff) % 28 + 1).cast(pl.String).str.zfill(2)])

    def plant(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        did, k = pl.col("doc_id"), pl.col("doc_id") % 6
        iso1, slash1 = _iso(0, 0, 0, "-"), _iso(0, 0, 0, "/")
        slash2 = _iso(7, 5, 11, "/")
        text = pl.col("text").fill_null("")
        meta = pl.concat_str([
            pl.lit('<meta property="article:published_time" content="'),
            iso1, pl.lit('T00:00:00Z">'), text])
        html = (
            pl.when(k.is_in([0, 4])).then(meta)
            .when(k == 1).then(pl.concat_str([
                pl.lit('<time datetime="'), iso1, pl.lit('">'), text]))
            .when(k == 3).then(pl.concat_str([
                text, pl.lit(" published "), iso1, pl.lit(" end")]))
            .otherwise(text))
        url = (
            pl.when(k == 2).then(pl.concat_str([
                pl.lit("http://ex.com/"), slash1, pl.lit("/post")]))
            .when(k == 4).then(pl.concat_str([
                pl.lit("http://ex.com/"), slash2, pl.lit("/post")]))
            .otherwise(pl.concat_str([
                pl.lit("http://ex.com/p/"), did.cast(pl.String)])))
        out = df.select(did, url.alias("url"), html.alias("html"))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("url", pa.string()),
            ("html", pa.string())]))

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow")
    return extract_pub_dates(pages)


def q_page_meta(sf_dir: str):
    """Head-metadata extraction (functions/headmeta.extract_head_meta
    — the trafilatura/extruct metadata slot): the corpus has no page
    heads, so html is synthesized IN the query from doc_id arithmetic
    — one residue per ladder shape (og-beats-tag conflict / padded
    tag + og:description / href-first canonical / beyond-cutoff decoy
    / content-first attribute variants / og:description only), every
    planted value derived from doc_id so the oracle replants
    bit-identically and replays the same regex ladders.  Residue 3
    pads HEAD_CHARS of filler before an og:title decoy, pinning the
    frozen scan cutoff end-to-end."""
    import polars as pl

    from docling_translate_ray.functions.headmeta import (
        HEAD_CHARS, extract_head_meta)

    pad = "x" * HEAD_CHARS

    def plant(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        did, k = pl.col("doc_id"), pl.col("doc_id") % 6
        text = pl.col("text").fill_null("")
        ds = did.cast(pl.String)
        tval = pl.concat_str([pl.lit("Doc Title "), ds])
        oval = pl.concat_str([pl.lit("OG Title "), ds])
        dval = pl.concat_str([pl.lit("Summary of doc "), ds])
        gval = pl.concat_str([pl.lit("OG summary "), ds])
        curl = pl.concat_str([pl.lit("https://ex.com/c/"), ds])
        html = (
            pl.when(k == 0).then(pl.concat_str([
                pl.lit('<meta property="og:title" content="'), oval,
                pl.lit('"><title>'), tval,
                pl.lit('</title><meta name="description" content="'),
                dval, pl.lit('">'), text]))
            .when(k == 1).then(pl.concat_str([
                pl.lit("<title> \t"), tval, pl.lit(" \r\n</title>"
                '<meta property="og:description" content="'),
                gval, pl.lit('">'), text]))
            .when(k == 2).then(pl.concat_str([
                pl.lit('<link href="'), curl,
                pl.lit('" rel="canonical"><title>'), tval,
                pl.lit("</title>"), text]))
            .when(k == 3).then(pl.concat_str([
                text, pl.lit(pad),
                pl.lit('<meta property="og:title" content="decoy">')]))
            .when(k == 4).then(pl.concat_str([
                pl.lit('<meta content="'), oval,
                pl.lit('" property="og:title">'
                '<link rel="canonical" href="'), curl,
                pl.lit('"><meta content="'), dval,
                pl.lit('" name="description">'), text]))
            .otherwise(pl.concat_str([
                pl.lit('<meta content="'), gval,
                pl.lit('" property="og:description">'), text])))
        out = df.select(did, html.alias("html"))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("html", pa.string())]))

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow")
    return extract_head_meta(pages)


def q_charset_decode(sf_dir: str):
    """Declared-charset decoding (functions/charset.decode_pages —
    the CCNet/trafilatura encoding slot): content BYTES are planted IN
    the query from doc_id arithmetic — one residue per evidence shape
    (declared utf-8 / cp1252-via-ISO-8859-1 alias / Shift_JIS /
    EUC-KR→cp949 / BOM-beats-lying-declaration / undeclared ascii fast
    path / undeclared cp949 ladder rung).  Corpus text is stripped to
    printable ASCII before encoding so every residue round-trips
    losslessly through its codec; planted non-ASCII comes only from
    the frozen CHARSET_SAMPLES, which the oracle replants as chr()
    literals (the fix_mojibake transport).  The SQL oracle cannot
    decode bytes, so it checks END-OUTPUT equality: expected
    (codec, evidence, text) recomputed from the same constants."""
    import codecs as _codecs
    import re as _re

    from docling_translate_ray.functions.charset import (
        CHARSET_SAMPLES, decode_pages)

    s1252, sjis, skr = (CHARSET_SAMPLES["cp1252"],
                        CHARSET_SAMPLES["shift_jis"],
                        CHARSET_SAMPLES["cp949"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        blobs = []
        for i, t in zip(ids, texts):
            a = _re.sub(r"[^ -~]", "", t or "")
            k = i % 7
            if k == 0:
                blobs.append(('<meta charset="utf-8">' + a).encode())
            elif k == 1:
                blobs.append(('<meta charset="ISO-8859-1">' + s1252 + a)
                             .encode("cp1252"))
            elif k == 2:
                blobs.append(('<meta charset="Shift_JIS">' + sjis + a)
                             .encode("shift_jis"))
            elif k == 3:
                blobs.append(("<meta charset='EUC-KR'>" + skr + a)
                             .encode("cp949"))
            elif k == 4:
                blobs.append(_codecs.BOM_UTF8
                             + ('<meta charset="shift_jis">' + a).encode())
            elif k == 5:
                blobs.append(a.encode())
            else:
                blobs.append((skr + a).encode("cp949"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "content": pa.array(blobs, pa.binary())})

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow")
    return decode_pages(pages)


def q_resolve_redirects(sf_dir: str):
    """Redirect-chain resolution (functions/crawl.resolve_redirects —
    the crawl-side url-variant collapse that precedes dedup): the edge
    table is planted IN the query from doc_id arithmetic — ids form
    blocks of 8 where block-relative 0..6 each redirect one step
    forward and every 5th block's last id closes the loop back to the
    block head (a true cycle) — then resolved with ``max_hops=4`` so
    all three outcomes occur in-corpus: terminal within the cap
    (relative 3..6), true cycle (the closed blocks), and over-cap
    chain flagged as cycle (relative 0..2, distance 5..7 > 4).  The
    exchange path is FORCED so the driver exercises the
    pointer-doubling plan (log-rounds co-partitioned composition),
    not the small-side broadcast; nullable outputs are filled
    (''/-1) on both engines so the value hash never crosses a
    null-representation seam.  Oracle = hop-capped recursive CTE over
    the identically-planted edges."""
    import polars as pl

    from docling_translate_ray.functions.crawl import resolve_redirects

    def plant(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id"]))
        did = pl.col("doc_id")
        rel = did % 8
        closer = (rel == 7) & (((did // 8) % 5) == 0)
        ds = did.cast(pl.String)
        out = (df.filter((rel != 7) | closer)
               .select(
                   pl.concat_str([pl.lit("u"), ds]).alias("src_url"),
                   pl.when(rel != 7)
                   .then(pl.concat_str([pl.lit("u"),
                                        (did + 1).cast(pl.String)]))
                   .otherwise(pl.concat_str([pl.lit("u"),
                                             (did - 7).cast(pl.String)]))
                   .alias("dst_url")))
        return out.to_arrow().cast(pa.schema([
            ("src_url", pa.string()), ("dst_url", pa.string())]))

    edges = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        plant, batch_format="pyarrow")
    res = resolve_redirects(edges, max_hops=4, strategy="exchange",
                            num_partitions=8)

    def tidy(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "src_url": batch["src_url"],
            "final_url": pc.fill_null(batch["final_url"], ""),
            "hops": pc.fill_null(batch["hops"], -1),
            "is_cycle": batch["is_cycle"],
        })

    return res.map_batches(tidy, batch_format="pyarrow")


def q_wat_extract(sf_dir: str):
    """The Common-Crawl METADATA mile end-to-end (sources/warc.py WAT
    half, completing the WARC/WET/WAT interchange triple): plant a
    title + ``doc_id%4`` anchor links (plus a mailto and a
    pure-fragment decoy that link resolution must skip) into each
    doc's page html, wrap as WARC response segments, run
    ``warc_to_wat`` (headmeta ladder + link resolution → sorted-key
    JSON metadata records → gzip WAT segment files), ``read_wat`` back
    and parse the JSON into ``(url, title, n_links, links_concat)`` —
    every planted value doc_id-derived so the oracle recomputes the
    expected end output directly (the charset_decode recipe; SQL
    cannot read WAT segments)."""
    import datetime as _dt
    import os
    import shutil
    import tempfile
    import uuid

    import polars as pl

    from docling_translate_ray.sources.warc import (
        build_warc_bytes, read_wat, warc_to_wat)

    tmp_in = tempfile.mkdtemp(prefix="dtr_watin_")
    tmp_out = tempfile.mkdtemp(prefix="dtr_watout_")
    try:
        ts = _dt.datetime(2017, 3, 6, 4, 3, 53)

        def write_segment(batch: pa.Table) -> pa.Table:
            recs = []
            for d, t in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
                html = (
                    f"<title>Doc Title {d}</title>"
                    + "".join(f'<a href="/l{j}">go {j}</a>'
                              for j in range(d % 4))
                    + '<a href="mailto:x@y.z">mail</a>'
                    + '<a href="#top">top</a>'
                    + (t or ""))
                recs.append((f"doc://{d}", ts, html.encode("utf-8")))
            blob = build_warc_bytes(recs, gzip_per_record=True)
            with open(os.path.join(tmp_in,
                                   f"seg-{uuid.uuid4().hex}.warc.gz"),
                      "wb") as f:
                f.write(blob)
            return pa.table({"n": pa.array([len(recs)], pa.int64())})

        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            write_segment, batch_format="pyarrow").materialize()
        warc_to_wat(tmp_in, tmp_out)

        links_dtype = pl.Struct({"Envelope": pl.Struct({
            "Payload-Metadata": pl.Struct({"HTML-Metadata": pl.Struct({
                "Links": pl.List(pl.Struct({"url": pl.String,
                                            "text": pl.String}))})})})})
        title_path = ("$['Envelope']['Payload-Metadata']"
                      "['HTML-Metadata']['Head']['Title']")

        def parse(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(["url", "meta_json"]))
            links = (pl.col("meta_json").str.json_decode(links_dtype)
                     .struct.field("Envelope")
                     .struct.field("Payload-Metadata")
                     .struct.field("HTML-Metadata").struct.field("Links"))
            out = df.select(
                pl.col("url"),
                pl.col("meta_json").str.json_path_match(title_path)
                .alias("title"),
                links.list.len().cast(pl.Int64).alias("n_links"),
                links.list.eval(pl.element().struct.field("url"))
                .list.join(",").alias("links_concat"),
            )
            return out.to_arrow().cast(pa.schema([
                ("url", pa.string()), ("title", pa.string()),
                ("n_links", pa.int64()), ("links_concat", pa.string())]))

        # pin before the segment files vanish
        return _collect(read_wat(tmp_out).map_batches(
            parse, batch_format="pyarrow")).sort_by("url")
    finally:
        shutil.rmtree(tmp_in, ignore_errors=True)
        shutil.rmtree(tmp_out, ignore_errors=True)
