"""JSONL source/sink — the LLM-corpus interchange format.

Web-text corpora are overwhelmingly published as gzipped JSON-Lines
(The Pile, RedPajama, Dolma, C4's TFDS export all ship ``.jsonl.gz``
/ ``.json.gz`` shards), so an engine that curates training data needs
JSONL as both an input and an output surface, the way ``sources/warc``
covers the crawl-archive side (reference input surface:
``/root/reference/src/sources/files.py`` folder batch; this is its
corpus-interchange analog).

Physical shape mirrors ``sources/warc.py``: the WRITER emits one
uuid-named ``.jsonl.gz`` file per batch/task (tmp-rename, so a crash
never leaves a partial shard visible — resumable at the file level);
the READER maps one file per task (``read_binary_files`` +
``batch_size=1``) — a shard is the natural parallel unit.

Kernels are vectorized end to end: serialization is polars
``write_ndjson`` (ryu shortest-roundtrip floats, so float64 values
survive the text round trip bit-exactly), parsing is
``pyarrow.json.read_json`` (the C++ NDJSON block parser) — no
per-row Python json.loads in either direction.

Robustness contract (interchange data is dirty): a file that fails to
PARSE is skipped (cross-format-safe — a WET segment or other non-JSON
content in the directory contributes zero rows), never an exception —
the poison-file rule of ``read_warc``/``read_wet``.  Boundary: Ray's
binary reader itself streams ``.gz``-suffixed files through Arrow's
gzip decoder, so a shard whose gzip STREAM is truncated fails at the
read layer (same behavior as the WARC/WET lanes); gzip content under
a non-``.gz`` name is decompressed — and on failure skipped — here.
Pass an explicit ``schema`` when shards may disagree on inferred
types (e.g. an all-null column in one shard); inference is per file.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid

import pyarrow as pa

_GZIP_MAGIC = b"\x1f\x8b"


def dumps_ndjson(batch: pa.Table) -> bytes:
    """One NDJSON blob (utf-8, ``\\n``-terminated lines, keys in schema
    order) for an Arrow batch — vectorized via polars."""
    import polars as pl

    return pl.from_arrow(batch).write_ndjson().encode("utf-8")


def loads_ndjson(blob: bytes, schema: pa.Schema | None = None) -> pa.Table:
    """Parse one NDJSON blob (gzip members transparently decompressed)
    into an Arrow table with pyarrow's C++ JSON reader."""
    import pyarrow.json as pj

    if blob[:2] == _GZIP_MAGIC:
        blob = gzip.decompress(blob)
    opts = (pj.ParseOptions(explicit_schema=schema)
            if schema is not None else None)
    return pj.read_json(io.BytesIO(blob), parse_options=opts)


def write_jsonl(ds, out_dir: str, columns: list[str] | None = None,
                gzip_compress: bool = True) -> None:
    """Dataset sink: one ``.jsonl[.gz]`` shard per batch/task,
    uuid-named, tmp-renamed (whole files only — a reader listing the
    directory never sees a partial shard).  ``read_jsonl`` round-trips
    it exactly, including nulls, escapes and nested lists/structs —
    fidelity JSON carries natively that WET cannot."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if gzip_compress else ".jsonl"

    def write_shard(batch: pa.Table) -> pa.Table:
        if columns is not None:
            batch = batch.select(columns)
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        blob = dumps_ndjson(batch)
        if gzip_compress:
            blob = gzip.compress(blob, mtime=0)  # byte-deterministic
        name = f"part-{uuid.uuid4().hex}{ext}"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, os.path.join(out_dir, name))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(write_shard, batch_format="pyarrow").materialize()


def warc_to_jsonl(in_path: str, out_dir: str,
                  gzip_compress: bool = True) -> None:
    """The CCNet-style corpus export job: WARC segments in → extraction
    → gzipped JSONL shards of ``(url, lang, text, n_chars)`` out — the
    shape downstream LLM-data tooling consumes.  Streaming end to end
    (the ``warc_to_wet`` recipe with the interchange sink swapped): one
    task per WARC segment, extraction in the batch kernel, one shard
    file per output batch, no driver materialization, resumable at the
    shard-file level."""
    from docling_translate_ray.sources.warc import read_warc
    from docling_translate_ray.stages.extract import extract_batch

    pages = read_warc(in_path).select_columns(["url", "html", "lang"])

    def to_rows(batch: pa.Table) -> pa.Table:
        ext = extract_batch(batch)
        return pa.table({
            "url": ext["url"],
            "lang": ext["lang"],
            "text": ext["extracted_text"],
            "n_chars": ext["n_chars"],
        })

    write_jsonl(pages.map_batches(to_rows, batch_format="pyarrow"),
                out_dir, gzip_compress=gzip_compress)


JSONL_CORPUS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("lang", pa.string()),
    ("text", pa.string()),
    ("n_chars", pa.int64()),
])


def read_jsonl(path: str, schema: pa.Schema | None = None,
               strict: bool = False):
    """Dataset from a directory/glob of ``.jsonl`` / ``.jsonl.gz``
    shards — one file per task.  With ``strict=False`` (default) a
    file that fails to decompress or parse contributes zero rows
    (cross-format-safe: a WET file fed here skips quietly); with
    ``strict=True`` the task raises."""
    import ray.data

    raw = ray.data.read_binary_files(path, include_paths=True)

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch["bytes"].to_pylist():
            try:
                tables.append(loads_ndjson(blob, schema=schema))
            except Exception:
                if strict:
                    raise
        if not tables:
            return (pa.schema([]).empty_table() if schema is None
                    else schema.empty_table())
        return pa.concat_tables(tables, promote_options="permissive")

    return raw.map_batches(parse_file, batch_format="pyarrow",
                           batch_size=1)
