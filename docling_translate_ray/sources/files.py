"""Raw-document folder source — the reference's actual input surface.

The reference tool is pointed at FILES (``python main.py file.pdf``,
``main.py:40-52``; folder batches via the same dispatch), not at a
pages table.  This source closes that user story for the Ray engine:
``read_document_folder`` turns a directory tree of raw ``.html`` /
``.pdf`` / ``.txt`` / code files into the engine's canonical
input_hint-shaped pages Dataset ``(url, warc_ts, html:binary, text,
lang)``, so EVERY downstream stage (extraction DAG, scoring, curation,
selection) runs unchanged on it.

Physical shape: ``ray.data.read_binary_files(include_paths=True)`` —
Ray parallelizes the file listing and reads; each batch is mapped
zero-copy to the pages schema (bytes column is carried through as the
``html`` binary payload; doctype dispatch downstream sniffs content
and the url extension exactly as for crawled pages, S2/S6).  The
``warc_ts`` column is a fixed caller-supplied timestamp by default —
file mtimes are machine state, not content, and would break
byte-identical reruns; pass ``use_mtime=True`` when snapshot ordering
across crawls matters more than determinism.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

_EPOCH = _dt.datetime(1970, 1, 1)


def read_document_folder(path: str, fixed_ts: _dt.datetime = _EPOCH,
                         use_mtime: bool = False):
    """Dataset of input_hint-shaped pages rows from a folder (or single
    file) of raw documents.  ``url`` = ``file://`` + absolute path —
    unique per file, stable across runs, and carrying the extension the
    doctype dispatch wants."""
    import os

    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        if use_mtime:
            ts = [
                _dt.datetime.utcfromtimestamp(int(os.path.getmtime(p)))
                if os.path.exists(p) else fixed_ts
                for p in paths
            ]
        else:
            ts = [fixed_ts] * len(paths)
        n = len(paths)
        return pa.table({
            "url": pa.array(
                ["file://" + os.path.abspath(p) for p in paths], pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": batch["bytes"].combine_chunks().cast(pa.binary()),
            "text": pa.array([None] * n, pa.string()),
            "lang": pa.array([None] * n, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")
