"""Ray pipeline tests: byte-identity vs the pure kernel (golden files),
repartition invariance, dedup/join round-trip, resume."""

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from docling_translate_ray import extract_core as ec
from docling_translate_ray.pipelines import extract as pipe
from docling_translate_ray.stages import dedup as dd
from docling_translate_ray.state import checkpoint as ckpt

HERE = os.path.dirname(__file__)


def _golden(name):
    with open(os.path.join(HERE, "golden", name)) as f:
        return json.load(f)


def _docs_map(docs_ds):
    out = {}
    for b in docs_ds.iter_batches(batch_format="pyarrow", batch_size=1024):
        for r in pa.Table.from_batches([b]).to_pylist() if isinstance(b, pa.RecordBatch) else b.to_pylist():
            out[r["url"]] = r
    return out


def test_extract_matches_golden(pages_path):
    """The Ray DAG reproduces the single-process kernel byte-identically."""
    golden = _golden("pages_golden.json")
    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8)
    seen = 0
    for b in docs.iter_batches(batch_format="pyarrow", batch_size=512):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for r in t.select(["url", "doctype", "status", "extracted_text", "n_spans"]).to_pylist():
            g = golden[r["url"]]
            assert r["status"] == g["status"], r["url"]
            assert r["doctype"] == g["doctype"], r["url"]
            assert r["n_spans"] == g["n_spans"], r["url"]
            assert hashlib.md5(r["extracted_text"].encode()).hexdigest() == g["text_md5"], r["url"]
            seen += 1
    assert seen == len(golden)


def test_repartition_invariance(pages_path):
    """Output is independent of block layout / parallelism (determinism)."""
    golden = _golden("pages_golden.json")
    ds = pipe.read_pages(pages_path).repartition(13)
    docs = pipe.extract_docs(ds, n_buckets=8)
    for b in docs.iter_batches(batch_format="pyarrow", batch_size=2048):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for r in t.select(["url", "extracted_text"]).to_pylist():
            assert hashlib.md5(r["extracted_text"].encode()).hexdigest() == golden[r["url"]]["text_md5"]


def test_docs_text_golden(docs_text_table, tmp_path):
    import pyarrow.parquet as pq

    golden = _golden("docs_text_golden.json")
    pq.write_table(docs_text_table, tmp_path / "dt.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "dt.parquet"))
    docs = ds.map_batches(
        __import__("docling_translate_ray.stages.extract", fromlist=["x"]).extract_docs_text_batch,
        batch_format="pyarrow",
    )
    n = 0
    for b in docs.iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for r in t.select(["url", "extracted_text", "n_spans"]).to_pylist():
            g = golden[r["url"]]
            assert r["n_spans"] == g["n_spans"]
            assert hashlib.md5(r["extracted_text"].encode()).hexdigest() == g["text_md5"]
            n += 1
    assert n == len(golden)


def test_spans_explode_roundtrip(pages_path):
    """Exploded spans agree with the per-doc span lists."""
    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8)
    spans = pipe.spans_of(docs)
    total_from_docs = sum(
        r for b in pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8)
        .select_columns(["n_spans"]).iter_batches(batch_format="pyarrow")
        for r in (b["n_spans"].to_pylist() if hasattr(b, "column_names") else b.column("n_spans").to_pylist())
    )
    assert spans.count() == total_from_docs
    sch = spans.schema()
    assert set(["url", "seg_id", "start", "end", "kind", "translatable", "text"]) <= set(sch.names)


def test_dedup_exact(pages_path):
    """unique_sentences == DISTINCT sentence (set-semantics parity, A1)."""
    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8)
    sent = pipe.sentences_of(docs)
    all_sents = [r["sentence"] for r in sent.take_all()]
    uniq = dd.unique_sentences(sent)
    got = sorted(r["sentence"] for r in uniq.take_all())
    assert got == sorted(set(all_sents))


def test_score_roundtrip_identity(pages_path):
    """Identity engine + broadcast join-back reproduces assemble_text."""
    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8).materialize()
    scored = pipe.score_docs(docs, engine="identity", miss_policy="identity")
    for b in scored.iter_batches(batch_format="pyarrow", batch_size=2048):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for r in t.select(["url", "extracted_text", "translated_text", "spans"]).to_pylist():
            expect = ec.assemble_scored_text(
                r["spans"], {s: s for s in _sentences_of_spanlist(r["spans"])}, "identity"
            )
            assert r["translated_text"] == expect, r["url"]


def _sentences_of_spanlist(spans):
    out = []
    for s in spans:
        if not s["translatable"] or not s["text"].strip():
            continue
        if s["kind"] in ec._SENTENCE_KINDS:
            out.extend(ec.split_sentences(s["text"]))
        else:
            out.append(s["text"])
    return out


def test_upper_engine_scores(pages_path):
    docs = pipe.extract_docs(pipe.read_pages(pages_path), n_buckets=8).materialize()
    scored = pipe.score_docs(docs, engine="upper", miss_policy="empty")
    row = scored.take(1)[0]
    if row["extracted_text"]:
        assert row["translated_text"] == row["translated_text"].upper()


def test_run_job_and_resume(pages_path, tmp_path):
    out = str(tmp_path / "out")
    res1 = pipe.run_extract_job(pages_path, out, n_buckets=8, resume=True)
    assert res1["doc_count"] == 200
    assert res1["ok_count"] == 198  # 2 binary-sniffed rows skipped
    assert os.path.isdir(ckpt.docs_dir(out))
    done = ckpt.completed_buckets(out)
    assert len(done) == res1["buckets"] > 0

    # rerun: everything skipped, output unchanged
    res2 = pipe.run_extract_job(pages_path, out, n_buckets=8, resume=True)
    assert res2["skipped_buckets"] == len(done)
    assert res2["doc_count"] == 200  # lineage re-aggregates durable output

    # delete one bucket → only that bucket re-extracts
    victim = sorted(done)[0]
    import shutil

    shutil.rmtree(os.path.join(ckpt.docs_dir(out), f"bucket={victim}"))
    res3 = pipe.run_extract_job(pages_path, out, n_buckets=8, resume=True)
    assert res3["doc_count"] == 200
    assert os.path.isdir(os.path.join(ckpt.docs_dir(out), f"bucket={victim}"))


def test_shard_layout_job_resume_repair(pages_path, tmp_path):
    """The no-shuffle shard layout: run → full-skip resume → shard repair."""
    import shutil

    # shard the fixture corpus into 4 input files
    import pyarrow.parquet as pq

    src = pq.read_table(os.path.join(pages_path, "pages.parquet"))
    in_dir = str(tmp_path / "pages4")
    os.makedirs(in_dir)
    step = src.num_rows // 4
    for i in range(4):
        pq.write_table(src.slice(i * step, step), os.path.join(in_dir, f"p{i}.parquet"))

    out = str(tmp_path / "out_shard")
    res1 = pipe.run_extract_job(in_dir, out, layout="shard", resume=True)
    assert res1["doc_count"] == 200
    assert res1["ok_count"] == 198
    assert res1["shards"] == 4
    done = ckpt.completed_shards(out)
    assert done == {"p0", "p1", "p2", "p3"}

    # byte-identity survives the shard write path
    golden = _golden("pages_golden.json")
    back = ray.data.read_parquet(ckpt.docs_dir(out))
    n = 0
    for b in back.select_columns(["url", "extracted_text"]).iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for r in t.to_pylist():
            assert hashlib.md5(r["extracted_text"].encode()).hexdigest() == golden[r["url"]]["text_md5"]
            n += 1
    assert n == 200

    # full-skip rerun touches nothing
    res2 = pipe.run_extract_job(in_dir, out, layout="shard", resume=True)
    assert res2["skipped_shards"] == 4
    assert res2["doc_count"] == 200

    # repair: drop one shard dir → only it re-extracts
    shutil.rmtree(os.path.join(ckpt.docs_dir(out), "shard=p2"))
    res3 = pipe.run_extract_job(in_dir, out, layout="shard", resume=True)
    assert res3["skipped_shards"] == 3
    assert res3["doc_count"] == 200
    assert os.path.isdir(os.path.join(ckpt.docs_dir(out), "shard=p2"))


def test_slim_span_output(pages_path, tmp_path):
    """span_text=False drops the duplicated text field but keeps offsets."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "out_slim")
    res = pipe.run_extract_job(pages_path, out, layout="shard", span_text=False)
    assert res["doc_count"] == 200
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckpt.docs_dir(out)) for f in fs
        if f.endswith(".parquet")
    ]
    t = pq.read_table(files[0])
    span_type = t.schema.field("spans").type.value_type
    names = [span_type.field(i).name for i in range(span_type.num_fields)]
    assert "text" not in names and {"seg_id", "start", "end", "kind"} <= set(names)
    assert t["extracted_text"][0].as_py() is not None


def test_shard_layout_scored(pages_path, tmp_path):
    """Shard layout with a scoring phase writes scored output per shard."""
    out = str(tmp_path / "out_shard_scored")
    res = pipe.run_extract_job(pages_path, out, layout="shard", engine="upper")
    assert res["scored"]
    import duckdb

    con = duckdb.connect()
    n, n_upper = con.sql(
        f"SELECT count(*), count(*) FILTER (translated_text = upper(translated_text)) "
        f"FROM parquet_scan('{out}/scored/*/*.parquet')"
    ).fetchone()
    assert n == 200 and n_upper == n


def test_shard_layout_docs_text_source(docs_text_table, tmp_path):
    """Text/code-path source through the shard layout end-to-end."""
    import pyarrow.parquet as pq

    in_dir = str(tmp_path / "dt_in")
    os.makedirs(in_dir)
    pq.write_table(docs_text_table, os.path.join(in_dir, "files.parquet"))
    out = str(tmp_path / "dt_out")
    res = pipe.run_extract_job(in_dir, out, layout="shard", source_kind="docs_text")
    assert res["doc_count"] == docs_text_table.num_rows
    assert res["ok_count"] == docs_text_table.num_rows
    golden = _golden("docs_text_golden.json")
    back = ray.data.read_parquet(ckpt.docs_dir(out))
    for b in back.select_columns(["url", "extracted_text"]).iter_batches(batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for r in t.to_pylist():
            assert hashlib.md5(r["extracted_text"].encode()).hexdigest() == golden[r["url"]]["text_md5"]


def test_compact_shards(tmp_path):
    import pyarrow.parquet as pq

    ddir = str(tmp_path / "docs")
    for shard, nparts in (("a", 3), ("b", 1)):
        sdir = os.path.join(ddir, f"shard={shard}")
        os.makedirs(sdir)
        for i in range(nparts):
            pq.write_table(
                pa.table({"x": [shard] * 4, "i": [i] * 4}),
                os.path.join(sdir, f"part-r{i}.parquet"),
            )
    res = ckpt.compact_shards(ddir)
    assert res == {"shards_compacted": 1, "files_removed": 3}
    a_files = os.listdir(os.path.join(ddir, "shard=a"))
    assert a_files == ["part-compacted.parquet"]
    merged = pq.read_table(os.path.join(ddir, "shard=a", "part-compacted.parquet"))
    assert merged.num_rows == 12 and sorted(set(merged["i"].to_pylist())) == [0, 1, 2]
    # singleton shard untouched
    assert os.listdir(os.path.join(ddir, "shard=b")) == ["part-r0.parquet"]
    # idempotent
    assert ckpt.compact_shards(ddir)["shards_compacted"] == 0


def test_lineage_sums_match_output(pages_path, tmp_path):
    out = str(tmp_path / "out2")
    pipe.run_extract_job(pages_path, out, n_buckets=4, resume=False)
    import duckdb

    con = duckdb.connect()
    docs_n = con.sql(
        f"SELECT count(*) FROM parquet_scan('{ckpt.docs_dir(out)}/*/*.parquet')"
    ).fetchone()[0]
    lin = con.sql(
        f"SELECT sum(doc_count) FROM parquet_scan('{ckpt.lineage_dir(out)}/*.parquet')"
    ).fetchone()[0]
    assert docs_n == lin == 200
