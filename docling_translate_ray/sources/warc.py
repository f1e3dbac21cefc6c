"""WARC source — Common Crawl's native archive format as an input
surface for the extraction DAG.

The engine's canonical input is the input_hint pages table ``(url,
warc_ts, html:binary, text, lang)``; real crawl data arrives as WARC
(ISO 28500) segment files, one ~1 GB gzip file per crawl shard.  This
source turns a directory of ``.warc`` / ``.warc.gz`` files into that
pages Dataset so every downstream stage (extract, score, dedup, curate)
runs unchanged — the missing first mile of the Common-Crawl story the
reference's file-folder input (`sources/files.py`) doesn't cover.

Physical shape: ``ray.data.read_binary_files`` with ONE FILE PER TASK
(``batch_size=1``) — a WARC segment is the natural parallel unit (its
records must be parsed sequentially; different segments are
independent), exactly how CC pipelines shard.  Parsing is stdlib-only:
``gzip`` handles both whole-file gzip and Common Crawl's per-record
concatenated gzip members transparently (multi-member streams decode
to the concatenation).

Robustness contract (crawl data is dirty): non-``response`` records
(warcinfo / request / metadata) are skipped; a malformed or truncated
record ABORTS that file's parse and returns the records before it —
never an exception for payload bytes (the poison-row rule of
``extract_core``).  The writer half (``build_warc_bytes``) exists for
tests, benchmarks and interchange; records it emits round-trip
byte-identically through the parser.
"""

from __future__ import annotations

import base64
import datetime as _dt
import gzip
import hashlib

import pyarrow as pa

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _warc_date(ts: _dt.datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def build_warc_bytes(records, gzip_whole: bool = False,
                     gzip_per_record: bool = False) -> bytes:
    """WARC/1.0 bytes for ``records`` = iterable of ``(url, ts, body)``
    (``ts`` a naive-UTC datetime, ``body`` the raw page bytes).  Each
    record wraps the body in an ``HTTP/1.1 200 OK`` response, the way a
    crawler stores fetches.  Record IDs are content-derived (md5 of
    url + date) so output is byte-deterministic.  ``gzip_per_record``
    emits one gzip member per record (the Common Crawl layout);
    ``gzip_whole`` compresses the concatenated stream."""
    out = bytearray()
    for rec_tuple in records:
        # (url, ts, body) or (url, ts, body, lang) — lang emits the real
        # Common Crawl 'WARC-Identified-Content-Language' header
        url, ts, body = rec_tuple[0], rec_tuple[1], rec_tuple[2]
        lang = rec_tuple[3] if len(rec_tuple) > 3 else ""
        body = bytes(body or b"")
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode() + _HDR_END
                + body)
        rid = hashlib.md5(
            (url + "|" + _warc_date(ts)).encode("utf-8")).hexdigest()
        lang_hdr = (b"WARC-Identified-Content-Language: "
                    + lang.encode("utf-8") + _CRLF) if lang else b""
        # the real Common Crawl payload annotation: sha1 of the HTTP
        # payload body, base32 (RFC 4648) — digest-equality dedup at
        # ingest reads headers only, never the payload
        digest = base64.b32encode(hashlib.sha1(body).digest()).decode()
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">\r\n"
               b"WARC-Date: " + _warc_date(ts).encode() + _CRLF +
               b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF +
               lang_hdr +
               b"WARC-Payload-Digest: sha1:" + digest.encode() + _CRLF +
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: " + str(len(http)).encode() + _HDR_END
               + http + _HDR_END)
        out += gzip.compress(rec, mtime=0) if gzip_per_record else rec
    blob = bytes(out)
    return gzip.compress(blob, mtime=0) if gzip_whole else blob


def _iter_records(blob: bytes):
    """Yield ``(headers, payload_bytes)`` for every record in a WARC
    blob (plain, whole-file gzip, or concatenated per-record gzip
    members).  Header keys are lower-cased.  Stops — without raising —
    at the first malformed record; everything before it is yielded."""
    if blob[:2] == _GZIP_MAGIC:
        try:  # stdlib gzip decodes concatenated members to one stream
            blob = gzip.decompress(blob)
        except (OSError, EOFError):  # corrupt / truncated gzip
            return
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record CRLF padding
        while blob[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if blob[pos:pos + 5] != b"WARC/":
            return  # not a record boundary — malformed remainder
        hdr_end = blob.find(_HDR_END, pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1"))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload_start = hdr_end + len(_HDR_END)
        payload_end = payload_start + length
        if payload_end > n:
            return  # truncated record
        yield headers, blob[payload_start:payload_end]
        pos = payload_end


def _record_ts(headers: dict[str, str]) -> _dt.datetime:
    try:
        return _dt.datetime.strptime(
            headers.get("warc-date", ""), "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return _dt.datetime(1970, 1, 1)


def parse_warc_records(blob: bytes):
    """Yield ``(url, ts, body_bytes)`` for every ``response`` record in
    a WARC blob; non-response records (warcinfo / request / metadata /
    conversion) are skipped.  Malformed-tail tolerance per
    :func:`_iter_records`."""
    for url, ts, body, _lang, _digest in parse_warc_records_ex(blob):
        yield url, ts, body


def parse_warc_records_ex(blob: bytes):
    """:func:`parse_warc_records` plus the record's Common Crawl
    annotations — ``(url, ts, body_bytes, lang, payload_digest)`` with
    ``lang`` from ``WARC-Identified-Content-Language`` and
    ``payload_digest`` from ``WARC-Payload-Digest`` ('' when absent)."""
    for headers, payload in _iter_records(blob):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        # body = HTTP payload after its header block (raw payloads
        # without one pass through whole)
        split = payload.find(_HDR_END)
        body = payload[split + len(_HDR_END):] if split >= 0 else payload
        yield url, _record_ts(headers), body, \
            headers.get("warc-identified-content-language", ""), \
            headers.get("warc-payload-digest", "")


def read_warc(path: str):
    """Dataset of input_hint-shaped pages rows from a ``.warc`` /
    ``.warc.gz`` file, directory, or list of paths.  ``text`` / ``lang``
    are empty at crawl time (extraction fills them downstream)."""
    import ray.data

    raw = ray.data.read_binary_files(path, include_paths=True)

    def parse_files(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[_dt.datetime] = []
        bodies: list[bytes] = []
        langs: list[str] = []
        digests: list[str] = []
        for blob in batch["bytes"].to_pylist():
            for url, t, body, lang, digest in parse_warc_records_ex(blob):
                urls.append(url)
                ts.append(t)
                bodies.append(body)
                langs.append(lang)
                digests.append(digest)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array(langs, pa.string()),
            "payload_digest": pa.array(digests, pa.string()),
        })

    # one segment file per task: records inside a WARC parse
    # sequentially; parallelism comes from the file count, as in CC
    return raw.map_batches(parse_files, batch_format="pyarrow",
                           batch_size=1)


def read_warc_digests(path: str):
    """Narrow ``(url, payload_digest)`` rows from WARC segments — the
    headers-only ingest view: page bytes never enter the object store,
    so digest-level decisions cost header parsing, not payload I/O."""
    import ray.data

    raw = ray.data.read_binary_files(path, include_paths=True)

    def parse_files(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        digests: list[str] = []
        for blob in batch["bytes"].to_pylist():
            for url, _ts, _body, _lang, digest in parse_warc_records_ex(blob):
                urls.append(url)
                digests.append(digest)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "payload_digest": pa.array(digests, pa.string()),
        })

    return raw.map_batches(parse_files, batch_format="pyarrow",
                           batch_size=1)


def warc_digest_dedup(path: str, num_partitions: int = 32):
    """Ingest-level exact dedup by ``WARC-Payload-Digest`` — the
    Common Crawl practice: identical payloads share the sha1 digest
    their fetcher already recorded, so duplicate elimination needs only
    the record HEADERS.  Returns one row per distinct digest:
    ``(url, n_dups)`` with ``url`` = the lexicographic-min member (the
    canonical fetch) — the pruned fetch list a downstream extract job
    consumes.  Digest-less records (non-CC writers) each stay their own
    group, keyed by url.

    Scale shape: headers-only scan (:func:`read_warc_digests`) →
    per-batch combiner → ONE narrow (digest, url) keyed exchange; the
    payload bytes of a 100 TB crawl never move."""
    import polars as pl

    from docling_translate_ray.stages.shuffle import hash_partition_apply

    def combiner(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            pl.when(pl.col("payload_digest") == "")
            .then(pl.lit("\x00url:") + pl.col("url"))
            .otherwise(pl.col("payload_digest")).alias("_g"))
        return (df.group_by("_g")
                .agg(pl.col("url").min(),
                     pl.len().cast(pl.Int64).alias("n_dups"))
                .to_arrow())

    def finalize(part: pa.Table) -> pa.Table:
        return (pl.from_arrow(part)
                .group_by("_g")
                .agg(pl.col("url").min(),
                     pl.col("n_dups").sum())
                .select(["url", "n_dups"])
                .to_arrow()
                .cast(pa.schema([("url", pa.string()),
                                 ("n_dups", pa.int64())])))

    return hash_partition_apply(
        read_warc_digests(path).map_batches(
            combiner, batch_format="pyarrow"),
        ["_g"], finalize, num_partitions=num_partitions,
        label="digest:warc_dedup")


def write_warc(ds, out_dir: str, url_column: str = "url",
               ts_column: str = "warc_ts", html_column: str = "html",
               gzip_per_record: bool = True) -> None:
    """Dataset sink: write input_hint-shaped pages as WARC segment files
    (one ``.warc.gz`` per batch/task, uuid-named so concurrent writers
    and reruns never overwrite) — the interchange surface back OUT of
    the engine; :func:`read_warc` round-trips it byte-identically.
    Resumable the same way the parquet sinks are: a partial run leaves
    whole valid segment files; rerunning appends new uuid files (dedup
    downstream by url if exactness matters)."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_segment(batch: pa.Table) -> pa.Table:
        recs = []
        for url, ts, body in zip(batch[url_column].to_pylist(),
                                 batch[ts_column].to_pylist(),
                                 batch[html_column].to_pylist()):
            if isinstance(ts, (int, float)):
                ts = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=int(ts))
            recs.append((url, ts, body or b""))
        blob = build_warc_bytes(recs, gzip_per_record=gzip_per_record)
        ext = ".warc.gz" if gzip_per_record else ".warc"
        name = f"seg-{uuid.uuid4().hex}{ext}"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, os.path.join(out_dir, name))  # whole files only
        return pa.table({"n": pa.array([len(recs)], pa.int64())})

    ds.map_batches(write_segment, batch_format="pyarrow").materialize()


# ---- WET (WARC conversion records): the extracted-text interchange ----
# Common Crawl publishes each crawl three ways: WARC (raw fetches), WAT
# (metadata), WET (plain-text conversions).  A WET file is itself WARC;
# its records are ``WARC-Type: conversion`` with a text/plain payload —
# the OUTPUT surface of exactly the extraction this engine runs.

WET_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("text", pa.string()),
])


def build_wet_bytes(records, gzip_whole: bool = False,
                    gzip_per_record: bool = False) -> bytes:
    """WET bytes for ``records`` = iterable of ``(url, ts, text)``:
    WARC/1.0 ``conversion`` records, utf-8 ``text/plain`` payloads, no
    HTTP wrapper (per the WET layout).  Record IDs are content-derived
    (md5 of url + date) so output is byte-deterministic; gzip flags as
    in :func:`build_warc_bytes`."""
    out = bytearray()
    for url, ts, text in records:
        body = (text or "").encode("utf-8")
        rid = hashlib.md5(
            (url + "|" + _warc_date(ts)).encode("utf-8")).hexdigest()
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: conversion\r\n"
               b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">\r\n"
               b"WARC-Date: " + _warc_date(ts).encode() + _CRLF +
               b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF +
               b"Content-Type: text/plain\r\n"
               b"Content-Length: " + str(len(body)).encode() + _HDR_END
               + body + _HDR_END)
        out += gzip.compress(rec, mtime=0) if gzip_per_record else rec
    blob = bytes(out)
    return gzip.compress(blob, mtime=0) if gzip_whole else blob


def parse_wet_records(blob: bytes):
    """Yield ``(url, ts, text)`` for every ``conversion`` record in a
    WET blob; response/warcinfo/etc. records are skipped (a WET reader
    pointed at a raw WARC yields nothing rather than garbage).  Payload
    length is byte-exact, so any text — CRLFs, record-boundary-looking
    lines — round-trips; decoding is utf-8 with replacement (crawl
    conversions are dirty)."""
    for headers, payload in _iter_records(blob):
        if headers.get("warc-type") != "conversion":
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        yield url, _record_ts(headers), payload.decode("utf-8",
                                                       errors="replace")


def read_wet(path: str):
    """Dataset of ``(url, warc_ts, text)`` from ``.wet`` / ``.wet.gz``
    (or any WARC with conversion records) — one segment file per task,
    same physical shape as :func:`read_warc`."""
    import ray.data

    raw = ray.data.read_binary_files(path, include_paths=True)

    def parse_files(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[_dt.datetime] = []
        texts: list[str] = []
        for blob in batch["bytes"].to_pylist():
            for url, t, text in parse_wet_records(blob):
                urls.append(url)
                ts.append(t)
                texts.append(text)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "text": pa.array(texts, pa.string()),
        })

    return raw.map_batches(parse_files, batch_format="pyarrow",
                           batch_size=1)


def write_wet(ds, out_dir: str, url_column: str = "url",
              ts_column: str = "warc_ts", text_column: str = "text",
              gzip_per_record: bool = True) -> None:
    """Dataset sink: write ``(url, ts, text)`` rows as WET segment
    files (one ``.wet.gz`` per batch/task, uuid-named, tmp-rename so a
    crash never leaves a partial segment visible) —
    :func:`read_wet` round-trips it exactly."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_segment(batch: pa.Table) -> pa.Table:
        recs = []
        for url, ts, text in zip(batch[url_column].to_pylist(),
                                 batch[ts_column].to_pylist(),
                                 batch[text_column].to_pylist()):
            if isinstance(ts, (int, float)):
                ts = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=int(ts))
            recs.append((url, ts or _dt.datetime(1970, 1, 1), text or ""))
        blob = build_wet_bytes(recs, gzip_per_record=gzip_per_record)
        ext = ".wet.gz" if gzip_per_record else ".wet"
        name = f"seg-{uuid.uuid4().hex}{ext}"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, os.path.join(out_dir, name))  # whole files only
        return pa.table({"n": pa.array([len(recs)], pa.int64())})

    ds.map_batches(write_segment, batch_format="pyarrow").materialize()


def warc_to_wet(in_path: str, out_dir: str,
                gzip_per_record: bool = True) -> None:
    """The Common-Crawl conversion job: WARC segments in → extraction →
    WET segments out.  Streaming end to end — each WARC segment parses
    in one task, pages flow through the extraction batch kernel, and
    WET segments write one file per output batch (no driver
    materialization; resumable at the segment-file level like every
    sink here)."""
    from docling_translate_ray.stages.extract import extract_batch

    pages = read_warc(in_path).select_columns(["url", "warc_ts", "html",
                                               "lang"])

    def to_wet_rows(batch: pa.Table) -> pa.Table:
        ext = extract_batch(batch.select(["url", "html", "lang"]))
        return pa.table({
            "url": ext["url"],
            "warc_ts": batch["warc_ts"],
            "text": ext["extracted_text"],
        })

    write_wet(pages.map_batches(to_wet_rows, batch_format="pyarrow"),
              out_dir, gzip_per_record=gzip_per_record)


# ----------------------------------------------------------------- WAT lane
# Common Crawl's third interchange surface (WARC = raw capture, WET =
# extracted text, WAT = per-page metadata).  A WAT file is itself a
# WARC whose records are ``metadata`` type with an ``application/json``
# payload describing the referenced page — head metadata + outlinks.
# The envelope here is the CC-flavored subset the engine's own
# downstream consumers need (headmeta fields + resolved links); it
# composes the SAME kernels the query surface exposes
# (functions/headmeta ladders, functions/graph link resolution), so a
# WAT record and the page_meta / extract_links query outputs can never
# disagree.


def wat_meta_batch(batch: pa.Table, url_column: str = "url",
                   html_column: str = "html") -> pa.Table:
    """Per-page WAT metadata JSON: ``(url, meta_json)``.

    Parser-family kernel (cf. graph.extract_links_batch): a per-row
    compiled-regex scan over the page — NOT a relational op, no
    shuffle; head fields ride the vectorized headmeta ladder first.
    JSON keys are sorted and separators fixed, so records are
    byte-deterministic for a given page.
    """
    import json

    from docling_translate_ray.functions.graph import (
        _LINK_RE, _TAG_RE, _WS_RE, resolve_href)
    from docling_translate_ray.functions.headmeta import (
        extract_head_meta_batch)

    urls = batch[url_column].to_pylist()
    htmls: list[str] = []
    for h in batch[html_column].to_pylist():
        if isinstance(h, (bytes, bytearray)):
            h = bytes(h).decode("utf-8", errors="replace")
        htmls.append(h or "")
    head_tbl = extract_head_meta_batch(
        pa.table({url_column: pa.array(urls, pa.string()),
                  html_column: pa.array(htmls, pa.string())}),
        id_column=url_column, html_column=html_column)
    metas: list[str] = []
    for url, html, title, desc, canon in zip(
            urls, htmls, head_tbl["title"].to_pylist(),
            head_tbl["description"].to_pylist(),
            head_tbl["canonical_url"].to_pylist()):
        links = []
        for m in _LINK_RE.finditer(html):
            href = m.group(1) if m.group(1) is not None else m.group(2)
            link = resolve_href(url or "", href)
            if link is None:
                continue
            links.append({
                "url": link,
                "text": _WS_RE.sub(" ", _TAG_RE.sub("", m.group(3))).strip(),
            })
        head: dict = {}
        if title is not None:
            head["Title"] = title
        if desc is not None:
            head["Description"] = desc
        if canon is not None:
            head["Canonical"] = canon
        env = {"Envelope": {
            "WARC-Header-Metadata": {"WARC-Target-URI": url or ""},
            "Payload-Metadata": {"HTML-Metadata": {
                "Head": head, "Links": links}}}}
        metas.append(json.dumps(env, separators=(",", ":"),
                                ensure_ascii=False, sort_keys=True))
    return pa.table({
        "url": pa.array([u or "" for u in urls], pa.string()),
        "meta_json": pa.array(metas, pa.string()),
    })


def build_wat_bytes(records, gzip_whole: bool = False,
                    gzip_per_record: bool = False) -> bytes:
    """WAT bytes for ``records`` = iterable of ``(url, ts, meta_json)``:
    WARC/1.0 ``metadata`` records with ``application/json`` payloads.
    Record IDs are content-derived (md5 of url + date) so output is
    byte-deterministic; gzip flags as in :func:`build_warc_bytes`."""
    out = bytearray()
    for url, ts, meta_json in records:
        body = (meta_json or "{}").encode("utf-8")
        rid = hashlib.md5(
            (url + "|" + _warc_date(ts)).encode("utf-8")).hexdigest()
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: metadata\r\n"
               b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">\r\n"
               b"WARC-Date: " + _warc_date(ts).encode() + _CRLF +
               b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF +
               b"Content-Type: application/json\r\n"
               b"Content-Length: " + str(len(body)).encode() + _HDR_END
               + body + _HDR_END)
        out += gzip.compress(rec, mtime=0) if gzip_per_record else rec
    blob = bytes(out)
    return gzip.compress(blob, mtime=0) if gzip_whole else blob


def parse_wat_records(blob: bytes):
    """Yield ``(url, ts, meta_json)`` for every ``metadata`` record in a
    WAT blob; other record types are skipped (a WAT reader pointed at a
    raw WARC or WET yields nothing rather than garbage).  Payload is
    byte-exact; decoding utf-8 with replacement."""
    for headers, payload in _iter_records(blob):
        if headers.get("warc-type") != "metadata":
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        yield url, _record_ts(headers), payload.decode("utf-8",
                                                       errors="replace")


def read_wat(path: str):
    """Dataset of ``(url, warc_ts, meta_json)`` from ``.wat`` /
    ``.wat.gz`` — one segment file per task, same physical shape as
    :func:`read_warc`."""
    import ray.data

    raw = ray.data.read_binary_files(path, include_paths=True)

    def parse_files(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[_dt.datetime] = []
        metas: list[str] = []
        for blob in batch["bytes"].to_pylist():
            for url, t, meta in parse_wat_records(blob):
                urls.append(url)
                ts.append(t)
                metas.append(meta)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "meta_json": pa.array(metas, pa.string()),
        })

    return raw.map_batches(parse_files, batch_format="pyarrow",
                           batch_size=1)


def write_wat(ds, out_dir: str, url_column: str = "url",
              ts_column: str = "warc_ts", meta_column: str = "meta_json",
              gzip_per_record: bool = True) -> None:
    """Dataset sink: write ``(url, ts, meta_json)`` rows as WAT segment
    files (one ``.wat.gz`` per batch/task, uuid-named, tmp-rename so a
    crash never leaves a partial segment visible) — :func:`read_wat`
    round-trips it exactly."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_segment(batch: pa.Table) -> pa.Table:
        recs = []
        for url, ts, meta in zip(batch[url_column].to_pylist(),
                                 batch[ts_column].to_pylist(),
                                 batch[meta_column].to_pylist()):
            if isinstance(ts, (int, float)):
                ts = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=int(ts))
            recs.append((url, ts or _dt.datetime(1970, 1, 1), meta or "{}"))
        blob = build_wat_bytes(recs, gzip_per_record=gzip_per_record)
        ext = ".wat.gz" if gzip_per_record else ".wat"
        name = f"seg-{uuid.uuid4().hex}{ext}"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, os.path.join(out_dir, name))  # whole files only
        return pa.table({"n": pa.array([len(recs)], pa.int64())})

    ds.map_batches(write_segment, batch_format="pyarrow").materialize()


def warc_to_wat(in_path: str, out_dir: str,
                gzip_per_record: bool = True) -> None:
    """The Common-Crawl metadata job: WARC segments in → head-metadata
    + link envelope per page → WAT segments out.  Streaming end to end,
    one task per input segment, one output file per batch — the same
    resumable-sink contract as :func:`warc_to_wet`."""
    pages = read_warc(in_path).select_columns(["url", "warc_ts", "html"])

    def to_wat_rows(batch: pa.Table) -> pa.Table:
        meta = wat_meta_batch(batch)
        return pa.table({
            "url": meta["url"],
            "warc_ts": batch["warc_ts"],
            "meta_json": meta["meta_json"],
        })

    write_wat(pages.map_batches(to_wat_rows, batch_format="pyarrow"),
              out_dir, gzip_per_record=gzip_per_record)
