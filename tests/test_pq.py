"""Tests for functions/pq — product-quantization encode + asymmetric-
distance top-k over the integer-exact kmeans codebooks."""

import os

import numpy as np
import pyarrow as pa
import pytest

from docling_translate_ray.functions.knn import _KM_OFFSET, _KM_SCALE
from docling_translate_ray.functions.pq import (
    _scale_query,
    pq_topk,
    pq_train_encode,
)


def _vectors(n=40, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(rng.rand(n, dim).tolist(),
                              pa.list_(pa.float64())),
    })


@pytest.fixture(scope="module")
def encoded():
    import ray.data

    t = _vectors()
    ds = ray.data.from_arrow(t)
    codes, codebooks = pq_train_encode(ds, m=2, k=4, iterations=2)
    return t, codes.take_all(), codebooks


def test_codes_shape_and_membership(encoded):
    t, rows, codebooks = encoded
    assert len(rows) == t.num_rows
    assert sorted(rows[0].keys()) == ["code_0", "code_1", "vec_id"]
    for j, (cids, cmat) in enumerate(codebooks):
        valid = set(cids.tolist())
        assert cmat.shape == (len(valid), 4)
        for r in rows:
            assert r[f"code_{j}"] in valid


def test_topk_matches_numpy_reference(encoded):
    import ray.data

    t, rows, codebooks = encoded
    q = list(t["embedding"][7].as_py())
    qi = _scale_query(q)
    sub = len(qi) // 2
    luts = []
    for j, (cids, cmat) in enumerate(codebooks):
        d = cmat - qi[j * sub:(j + 1) * sub][None, :]
        luts.append(dict(zip(cids.tolist(),
                             np.einsum("kd,kd->k", d, d).tolist())))
    expected = sorted(
        ((int(luts[0][r["code_0"]] + luts[1][r["code_1"]]), r["vec_id"])
         for r in rows))[:10]
    codes_ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = pq_topk(codes_ds, codebooks, q, k=10).to_pylist()
    assert [(r["pq_dist"], r["vec_id"]) for r in got] == expected
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_in_corpus_query_achieves_lut_minimum(encoded):
    import ray.data

    t, rows, codebooks = encoded
    q = list(t["embedding"][3].as_py())
    qi = _scale_query(q)
    sub = len(qi) // 2
    min_sum = 0
    for j, (cids, cmat) in enumerate(codebooks):
        d = cmat - qi[j * sub:(j + 1) * sub][None, :]
        min_sum += int(np.einsum("kd,kd->k", d, d).min())
    codes_ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = pq_topk(codes_ds, codebooks, q, k=3).to_pylist()
    # the in-corpus query's own code combo is the LUT minimum
    assert got[0]["pq_dist"] == min_sum


def test_quantization_scale_matches_kmeans():
    v = [0.123456789, -0.5]
    assert list(_scale_query(v)) == [
        int(np.floor(0.123456789 * _KM_SCALE + 0.5)) + _KM_OFFSET,
        int(np.floor(-0.5 * _KM_SCALE + 0.5)) + _KM_OFFSET,
    ]


def test_indivisible_dim_raises():
    import ray.data

    ds = ray.data.from_arrow(_vectors(n=10, dim=7))
    with pytest.raises(ValueError, match="divisible"):
        pq_train_encode(ds, m=2)


def test_driver_query_matches_oracle(sf_dir):
    import duckdb

    import __ray_entry__ as entrymod

    got = entrymod.queries_legacy()["pq_topk"](sf_dir).to_pylist()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')")
    exp = con.execute(entrymod.oracle_sql()["pq_topk"]).arrow().to_pylist()
    got.sort(key=lambda r: r["rank"])
    exp.sort(key=lambda r: r["rank"])
    assert got == exp
    assert len(got) == 10


def test_ivfpq_index(tmp_path):
    import shutil

    import ray.data

    from docling_translate_ray.functions.pq import (
        build_ivfpq_index,
        ivfpq_probe_cids,
        ivfpq_topk,
        pq_train_encode,
    )

    t = _vectors(n=60, dim=8, seed=11)
    ds = ray.data.from_arrow(t)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(ds, idx, n_coarse=4, m=2, k=4, iterations=2)
    q = list(t["embedding"][9].as_py())

    # full probe == flat PQ, row for row
    codes, codebooks = pq_train_encode(ds, m=2, k=4, iterations=2)
    flat = pq_topk(codes, codebooks, q, k=10).to_pylist()
    full = ivfpq_topk(idx, q, n_probe=4, k=10).to_pylist()
    assert full == flat

    # pruned read: the n_probe=1 answer must not change when every
    # UN-probed partition is physically deleted
    before = ivfpq_topk(idx, q, n_probe=1, k=10).to_pylist()
    keep = set(ivfpq_probe_cids(idx, q, 1))
    import os

    from docling_translate_ray.functions.pq import _resolve_gen

    codes_root = os.path.join(_resolve_gen(idx), "codes")
    for d in os.listdir(codes_root):
        cid = int(d.split("=")[1])
        if cid not in keep:
            shutil.rmtree(os.path.join(codes_root, d))
    after = ivfpq_topk(idx, q, n_probe=1, k=10).to_pylist()
    assert after == before
    assert before  # the probed partition holds candidates — non-vacuous


def test_ivfpq_rebuild_replaces_generation(tmp_path):
    import ray.data

    from docling_translate_ray.functions.pq import (
        build_ivfpq_index,
        ivfpq_topk,
    )

    ds = ray.data.from_arrow(_vectors(n=30, dim=8, seed=2))
    idx = str(tmp_path / "ivfpq2")
    build_ivfpq_index(ds, idx, n_coarse=2, m=2, k=4)
    q = list(_vectors(n=30, dim=8, seed=2)["embedding"][0].as_py())
    first = ivfpq_topk(idx, q, n_probe=2, k=30).to_pylist()
    build_ivfpq_index(ds, idx, n_coarse=2, m=2, k=4)
    second = ivfpq_topk(idx, q, n_probe=2, k=30).to_pylist()
    assert second == first
    assert len(second) == 30  # one generation only — no uuid-part ghosts
    import os

    gens = [d for d in os.listdir(idx) if d.startswith("gen-")]
    assert len(gens) == 1  # superseded generation pruned after the flip


def test_ivfpq_crashed_rebuild_serves_old_generation(tmp_path):
    """A rebuild that dies before the CURRENT pointer flips must leave
    queries on the previous complete generation (ADVICE r03: the old
    layout could expose new meta with a missing codes tree, which probes
    silently skip)."""
    import os

    import pyarrow.parquet as pqt
    import ray.data

    from docling_translate_ray.functions.pq import (
        _resolve_gen,
        build_ivfpq_index,
        ivfpq_topk,
    )

    ds = ray.data.from_arrow(_vectors(n=30, dim=8, seed=3))
    idx = str(tmp_path / "ivfpq3")
    build_ivfpq_index(ds, idx, n_coarse=2, m=2, k=4)
    q = list(_vectors(n=30, dim=8, seed=3)["embedding"][4].as_py())
    before = ivfpq_topk(idx, q, n_probe=2, k=30).to_pylist()
    live = _resolve_gen(idx)

    # simulate a crash mid-rebuild: a new gen dir with meta written but
    # no codes tree, pointer never flipped
    dead = os.path.join(idx, "gen-deadbeef0000")
    os.makedirs(dead)
    for f in ("coarse.parquet", "codebooks.parquet"):
        pqt.write_table(pqt.read_table(os.path.join(live, f)),
                        os.path.join(dead, f))
    assert _resolve_gen(idx) == live
    assert ivfpq_topk(idx, q, n_probe=2, k=30).to_pylist() == before


def test_ivfpq_residual_beats_raw_and_prunes(tmp_path):
    """IVFADC (residual=True): on planted clusters the residual codes
    approximate exact distances strictly better than raw-vector codes
    at the same m×k budget; the flags table round-trips; the pruned
    read holds; the per-cluster LUT path matches a pure-python replay
    of the integer pipeline for the top hit."""
    import shutil

    import ray.data

    from docling_translate_ray.functions.pq import (
        _resolve_gen,
        build_ivfpq_index,
        ivfpq_probe_cids,
        ivfpq_topk,
        load_ivfpq_flags,
    )

    rng = np.random.RandomState(7)
    centers = rng.normal(0, 4, (4, 8))
    vecs = np.concatenate(
        [centers[i % 4] + rng.normal(0, 0.3, 8)[None, :]
         for i in range(160)])
    t = pa.table({
        "vec_id": pa.array(range(160), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(t)
    q = (centers[1] + 0.1).tolist()

    qi = np.floor(np.asarray(q) * 1e6 + 0.5).astype(np.int64) + 10_000_000
    vi = np.floor(vecs * 1e6 + 0.5).astype(np.int64) + 10_000_000
    exact = np.einsum("bd,bd->b", vi - qi, vi - qi)

    errs = {}
    for res in (False, True):
        idx = str(tmp_path / f"ivfpq_{res}")
        build_ivfpq_index(ds, idx, n_coarse=4, m=2, k=4, iterations=2,
                          residual=res)
        assert load_ivfpq_flags(idx)["residual"] is res
        full = ivfpq_topk(idx, q, n_probe=4, k=160).to_pylist()
        assert len(full) == 160
        errs[res] = np.mean([abs(r["pq_dist"] - exact[r["vec_id"]])
                             for r in full])
    assert errs[True] < errs[False], errs

    # pruned read on the residual index: n_probe=1 answer unchanged
    # after physically deleting every un-probed partition
    idx = str(tmp_path / "ivfpq_True")
    before = ivfpq_topk(idx, q, n_probe=1, k=10).to_pylist()
    assert before
    keep = set(ivfpq_probe_cids(idx, q, 1))
    codes_root = os.path.join(_resolve_gen(idx), "codes")
    for d in os.listdir(codes_root):
        if int(d.split("=")[1]) not in keep:
            shutil.rmtree(os.path.join(codes_root, d))
    assert ivfpq_topk(idx, q, n_probe=1, k=10).to_pylist() == before


def test_ivfpq_residual_driver_query_matches_oracle(sf_dir):
    import duckdb

    import __ray_entry__ as entrymod

    got = entrymod.queries()["ivfpq_residual"](sf_dir).to_pylist()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')")
    exp = con.execute(
        entrymod.oracle_sql()["ivfpq_residual"]).arrow().to_pylist()
    got.sort(key=lambda r: r["rank"])
    exp.sort(key=lambda r: r["rank"])
    assert got == exp
    assert len(got) == 10


def _code_rows(idx):
    """All (vec_id, code_0, code_1, cpart) rows across the live
    generation's partition dirs."""
    import pyarrow.parquet as pqt

    from docling_translate_ray.functions.pq import _resolve_gen

    root = os.path.join(_resolve_gen(idx), "codes")
    rows = set()
    for d in sorted(os.listdir(root)):
        cid = int(d.split("=")[1])
        pdir = os.path.join(root, d)
        for f in sorted(os.listdir(pdir)):
            if not f.endswith(".parquet"):
                continue
            t = pqt.read_table(os.path.join(pdir, f))
            for r in t.to_pylist():
                rows.add((r["vec_id"], r["code_0"], r["code_1"], cid))
    return rows


@pytest.mark.parametrize("residual", [False, True])
def test_ivfpq_insert_reencodes_bit_identical(tmp_path, residual):
    """Re-inserting the ALREADY-INDEXED vectors must re-derive every
    (coarse assignment, code) exactly — compact's exact-duplicate
    collapse then restores the original row set bit-for-bit."""
    import ray.data

    from docling_translate_ray.functions.pq import (build_ivfpq_index,
                                                    ivfpq_compact,
                                                    ivfpq_insert)

    t = _vectors(n=60, dim=8, seed=11)
    ds = ray.data.from_arrow(t)
    idx = str(tmp_path / f"ins_{residual}")
    build_ivfpq_index(ds, idx, n_coarse=4, m=2, k=4, iterations=2,
                      residual=residual)
    built = _code_rows(idx)
    assert len(built) == 60

    ivfpq_insert(ray.data.from_arrow(t), idx)
    doubled = _code_rows(idx)
    assert doubled == built  # identical rows, just duplicated files

    stats = ivfpq_compact(idx)
    assert stats["files_after"] <= stats["files_before"]
    assert _code_rows(idx) == built


@pytest.mark.parametrize("residual", [False, True])
def test_ivfpq_insert_probe_visible(tmp_path, residual):
    """Inserted vectors are served by the probe path immediately — no
    rebuild, no retrain.  (ADC note: an insert sharing a code with a
    lower-id base vector can never out-RANK it — ties break on id — so
    visibility is asserted structurally: a full probe wide enough for
    the whole corpus must return every inserted id.)"""
    import ray.data

    from docling_translate_ray.functions.pq import (build_ivfpq_index,
                                                    ivfpq_insert,
                                                    ivfpq_topk)

    base = _vectors(n=50, dim=8, seed=11)
    idx = str(tmp_path / f"vis_{residual}")
    build_ivfpq_index(ray.data.from_arrow(base), idx, n_coarse=4, m=2,
                      k=4, iterations=2, residual=residual)

    rng = np.random.RandomState(7)
    inc = pa.table({
        "vec_id": pa.array(range(50, 60), pa.int64()),
        "embedding": pa.array(rng.rand(10, 8).tolist(),
                              pa.list_(pa.float64())),
    })
    q = list(base["embedding"][9].as_py())
    before = {r["vec_id"] for r in
              ivfpq_topk(idx, q, n_probe=4, k=60).to_pylist()}
    assert before == set(range(50))

    ivfpq_insert(ray.data.from_arrow(inc), idx)
    after = {r["vec_id"] for r in
             ivfpq_topk(idx, q, n_probe=4, k=60).to_pylist()}
    assert after == set(range(60))


def test_ivfpq_compact_idempotent_and_topk_stable(tmp_path):
    import glob

    import ray.data

    from docling_translate_ray.functions.pq import (_resolve_gen,
                                                    build_ivfpq_index,
                                                    ivfpq_compact,
                                                    ivfpq_insert,
                                                    ivfpq_topk)

    t = _vectors(n=60, dim=8, seed=11)
    idx = str(tmp_path / "cmp")
    build_ivfpq_index(ray.data.from_arrow(t), idx, n_coarse=4, m=2, k=4,
                      iterations=2)
    rng = np.random.RandomState(9)
    for start in (60, 80):
        inc = pa.table({
            "vec_id": pa.array(range(start, start + 20), pa.int64()),
            "embedding": pa.array(rng.rand(20, 8).tolist(),
                                  pa.list_(pa.float64())),
        })
        ivfpq_insert(ray.data.from_arrow(inc), idx)

    q = list(t["embedding"][9].as_py())
    before = ivfpq_topk(idx, q, n_probe=4, k=10).to_pylist()
    stats = ivfpq_compact(idx)
    assert stats["partitions_compacted"] >= 1
    for pdir in glob.glob(os.path.join(_resolve_gen(idx), "codes",
                                       "cpart=*")):
        assert len([f for f in os.listdir(pdir)
                    if f.endswith(".parquet")]) == 1
    assert ivfpq_topk(idx, q, n_probe=4, k=10).to_pylist() == before
    again = ivfpq_compact(idx)
    assert again["partitions_compacted"] == 0
