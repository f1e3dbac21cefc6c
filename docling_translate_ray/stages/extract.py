"""Ray Data batch transforms for the extraction DAG.

All functions here are Arrow-in / Arrow-out (``batch_format="pyarrow"``,
zero-copy from the object store).  The per-row inner parser is pure Python
(a lexer is inherently row-wise — same as the reference's per-file parse,
text_parser.py:117-160); the batch boundary amortizes scheduling and keeps
blocks Arrow end-to-end.  Nothing in this module touches Ray state: plain
functions → stateless tasks.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from docling_translate_ray import extract_core as ec

# Arrow schema of the exploded spans table (FIXTURES.md §3)
SPAN_STRUCT = pa.struct(
    [
        ("seg_id", pa.int64()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("kind", pa.string()),
        ("translatable", pa.bool_()),
        ("line_number", pa.int64()),
        ("page_no", pa.int64()),
        ("text", pa.string()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("doctype", pa.string()),
        ("status", pa.string()),
        ("extracted_text", pa.string()),
        ("n_spans", pa.int64()),
        ("n_translatable", pa.int64()),
        ("n_chars", pa.int64()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

SPANS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("seg_id", pa.int64()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("kind", pa.string()),
        ("translatable", pa.bool_()),
        ("line_number", pa.int64()),
        ("page_no", pa.int64()),
        ("text", pa.string()),
    ]
)


def extract_batch(batch: pa.Table, speed_mode: str = "accurate") -> pa.Table:
    """pages batch → docs batch (decode → detect → segment → assemble).

    One output row per input page; a poison page becomes a ``status='error…'``
    row, never a failed block (retry policy, SURVEY.md §4).  ``speed_mode``
    selects the S4 fidelity/speed profile (extract_core.SPEED_MODES).
    """
    if speed_mode not in ec.SPEED_MODES:  # loud, not a per-row error status
        raise ValueError(f"speed_mode must be one of {ec.SPEED_MODES}, got {speed_mode!r}")
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)

    out: dict[str, list] = {k: [] for k in DOCS_SCHEMA.names}
    for url, data, lang in zip(urls, htmls, langs):
        rec = ec.extract_page(url, data if data is not None else b"", speed_mode)
        spans = rec["spans"]
        n_tr = sum(1 for s in spans if s.translatable and s.text.strip())
        out["url"].append(url)
        out["lang"].append(lang or "")
        out["doctype"].append(rec["doctype"])
        out["status"].append(rec["status"])
        out["extracted_text"].append(rec["extracted_text"])
        out["n_spans"].append(len(spans))
        out["n_translatable"].append(n_tr)
        out["n_chars"].append(len(rec["extracted_text"]))
        out["spans"].append(
            [
                {
                    "seg_id": s.seg_id, "start": s.start, "end": s.end,
                    "kind": s.kind, "translatable": s.translatable,
                    "line_number": s.line_number, "page_no": s.page_no,
                    "text": s.text,
                }
                for s in spans
            ]
        )
    return pa.Table.from_pydict(out, schema=DOCS_SCHEMA)


def extract_docs_text_batch(batch: pa.Table) -> pa.Table:
    """docs_text batch (url, doctype, body:string) → docs batch.

    Text/code path of the reference (core.py:164-321): doctype is explicit,
    body is already decoded.
    """
    urls = batch["url"].to_pylist()
    doctypes = batch["doctype"].to_pylist()
    bodies = batch["body"].to_pylist()
    out: dict[str, list] = {k: [] for k in DOCS_SCHEMA.names}
    for url, dt, body in zip(urls, doctypes, bodies):
        try:
            spans = ec.segment_content(dt, body or "")
            text = ec.assemble_text(spans)
            status = "ok"
        except Exception as exc:
            spans, text, status = [], "", f"error:{type(exc).__name__}"
        n_tr = sum(1 for s in spans if s.translatable and s.text.strip())
        out["url"].append(url)
        out["lang"].append("")
        out["doctype"].append(dt)
        out["status"].append(status)
        out["extracted_text"].append(text)
        out["n_spans"].append(len(spans))
        out["n_translatable"].append(n_tr)
        out["n_chars"].append(len(text))
        out["spans"].append(
            [
                {
                    "seg_id": s.seg_id, "start": s.start, "end": s.end,
                    "kind": s.kind, "translatable": s.translatable,
                    "line_number": s.line_number, "page_no": s.page_no,
                    "text": s.text,
                }
                for s in spans
            ]
        )
    return pa.Table.from_pydict(out, schema=DOCS_SCHEMA)


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    """docs batch → spans rows (one row per span), pure Arrow flatten.

    Uses ``list_parent_indices`` + ``list_flatten`` — no Python loop.
    """
    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    parent = pc.list_parent_indices(spans_col)
    flat = pc.list_flatten(spans_col)
    urls = batch["url"].take(parent)
    cols = {"url": urls}
    for f in SPAN_STRUCT:
        cols[f.name] = pc.struct_field(flat, f.name)
    return pa.Table.from_pydict(cols, schema=SPANS_SCHEMA)


def explode_sentences_batch(batch: pa.Table) -> pa.Table:
    """docs batch → sentences rows (url, seg_id, sent_idx, sentence).

    Sentence split per the frozen rule-based spec (core.py:428 analog);
    captions/table cells pass through whole (core.py:430-451).
    """
    urls = batch["url"].to_pylist()
    spans_lists = batch["spans"].to_pylist()
    o_url: list[str] = []
    o_seg: list[int] = []
    o_idx: list[int] = []
    o_sent: list[str] = []
    for url, spans in zip(urls, spans_lists):
        for s in spans or []:
            if not s["translatable"] or not s["text"].strip():
                continue
            if s["kind"] in ec._SENTENCE_KINDS:
                sents = ec.split_sentences(s["text"])
            else:
                sents = [s["text"]]
            for i, sent in enumerate(sents):
                o_url.append(url)
                o_seg.append(s["seg_id"])
                o_idx.append(i)
                o_sent.append(sent)
    return pa.table(
        {
            "url": pa.array(o_url, pa.string()),
            "seg_id": pa.array(o_seg, pa.int64()),
            "sent_idx": pa.array(o_idx, pa.int64()),
            "sentence": pa.array(o_sent, pa.string()),
        }
    )


def drop_span_text(batch: pa.Table) -> pa.Table:
    """Slim output: remove the ``text`` field from the spans structs.

    Span text duplicates the source substring (start/end offsets into the
    decoded page already identify it) — at corpus scale that is ~40% of the
    docs payload.  Offsets + extracted_text stay, so any consumer that kept
    the source can re-derive span text; pure Arrow (no Python per row).
    """
    col = batch["spans"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    keep = [f.name for f in SPAN_STRUCT if f.name != "text"]
    slim_struct = pa.StructArray.from_arrays(
        [pc.struct_field(flat, n) for n in keep], keep
    )
    if col.offset == 0 and col.null_count == 0:
        offsets = col.offsets  # raw offsets align with list_flatten output
    else:
        # sliced array or null list slots: raw offsets do NOT align with
        # the flattened values (they index the unsliced buffer and skip
        # nothing for nulls) — rebuild from per-row lengths instead of
        # silently attaching spans to the wrong documents
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False
        )
        import numpy as np

        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        )
    slim = pa.ListArray.from_arrays(offsets, slim_struct)
    idx = batch.column_names.index("spans")
    return batch.set_column(idx, "spans", slim)


def add_url_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Partitioning key: ``bucket = hash64(url) % n_buckets``.

    The url hash already spreads a zipf-skewed host distribution (each url is
    unique), but pages from one hot host cluster in *input* file order; the
    bucket column re-partitions the output and is the resume unit.  Salting
    for genuinely hot single keys happens at dedup (sentence hash), not here.
    """
    h = _hash64_str(batch["url"])
    bucket = pc.cast(_pmod(h, n_buckets), pa.int32())
    return batch.append_column("bucket", bucket)


def _hash64_str(arr: pa.ChunkedArray | pa.Array, seed: int = 42) -> pa.Array:
    """Vectorized, process-stable 64-bit hash of a string column.

    Uses polars' xxhash kernel (deterministic for a fixed seed and polars
    version) — NEVER Python ``hash()``, which is salted per process and would
    scatter the same key to different buckets on different Ray workers.
    """
    import polars as pl

    if isinstance(arr, pa.Array):
        arr = pa.chunked_array([arr])
    s = pl.from_arrow(arr)
    return pa.array(s.hash(seed=seed).to_numpy().view("int64"), pa.int64())


def _pmod(arr: pa.Array, m: int) -> pa.Array:
    import numpy as np

    a = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.array((a % np.uint64(m)).astype(np.int64), pa.int64())
