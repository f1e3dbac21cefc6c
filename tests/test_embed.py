"""Feature-hash embedder (functions/embed.py): determinism, merge
across batches, sign/dim lockstep with the md5 digest, and the dense
bridge into the ANN family."""

import hashlib

import numpy as np
import pyarrow as pa

from docling_translate_ray.functions import embed as femb


def _sparse(rows, **kw):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    out = femb.hash_embed(ds, **kw).to_pandas()
    return {(int(r.doc_id), r.dim): int(r.val) for r in out.itertuples()}


def test_single_token_dim_and_sign(ray_session):
    h = hashlib.md5(b"hello").hexdigest()
    want_sign = 1 if int(h[2], 16) < 8 else -1
    got = _sparse([(1, "hello")])
    assert got == {(1, h[:2]): want_sign}


def test_counts_accumulate_and_zero_rows_drop(ray_session):
    # find two tokens with SAME dim and OPPOSITE signs -> they cancel
    by_dim = {}
    pair = None
    for i in range(10000):
        w = f"w{i}"
        h = hashlib.md5(w.encode()).hexdigest()
        key = (h[:2], int(h[2], 16) < 8)
        other = (h[:2], not (int(h[2], 16) < 8))
        if other in by_dim:
            pair = (by_dim[other], w)
            break
        by_dim.setdefault(key, w)
    assert pair is not None
    got = _sparse([(7, f"{pair[0]} {pair[1]}")])
    assert got == {}  # +1 and -1 in the same dim cancel; zero dropped


def test_duplicate_docs_identical_vectors(ray_session):
    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma")]
    got = _sparse(rows)
    v1 = {d: v for (i, d), v in got.items() if i == 1}
    v2 = {d: v for (i, d), v in got.items() if i == 2}
    assert v1 == v2 and len(v1) >= 1


def test_xx64_mode_valid_dims_and_deterministic(ray_session):
    rows = [(i, f"tok{i} shared words here") for i in range(8)]
    a = _sparse(rows, hash_mode="xx64")
    b = _sparse(rows, hash_mode="xx64")
    assert a == b and len(a) > 0
    for (_i, dim), v in a.items():
        assert len(dim) == 2 and int(dim, 16) in range(256)
        assert v != 0
    # identical docs still collide exactly in xx64 mode
    dup = _sparse([(1, "alpha beta"), (2, "alpha beta")],
                  hash_mode="xx64")
    v1 = {d: v for (i, d), v in dup.items() if i == 1}
    v2 = {d: v for (i, d), v in dup.items() if i == 2}
    assert v1 == v2


def test_densify_cosine_orders_similarity(ray_session):
    rows = [(1, "the quick brown fox jumps"),
            (2, "the quick brown fox sleeps"),
            (3, "completely unrelated tokens entirely disjoint")]
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    sparse = femb.hash_embed(ds)
    # all of one doc's rows co-present: single driver-side batch (toy)
    dense = femb.densify_batch(
        pa.Table.from_pandas(sparse.to_pandas(), preserve_index=False))
    vecs = {i: np.array(v) for i, v in zip(
        dense["doc_id"].to_pylist(), dense["embedding"].to_pylist())}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(vecs[1], vecs[2]) > cos(vecs[1], vecs[3])
    assert len(vecs[1]) == 256


def test_spill_and_plasma_exchanges_identical(ray_session):
    # both physical merge paths (scratch-parquet spill vs object-store)
    # must produce identical sparse rows, in both hash modes
    rows = [(i, f"tok{i % 7} shared word{i % 3} {'x ' * (i % 5)}")
            for i in range(50)] + [(99, ""), (100, None)]
    for mode in ("md5", "xx64"):
        a = _sparse(rows, hash_mode=mode, exchange="spill")
        b = _sparse(rows, hash_mode=mode, exchange="plasma")
        assert a == b and len(a) > 0


def test_spill_exchange_empty_and_blank_inputs(ray_session):
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert femb.hash_embed(empty).take_all() == []
    blank = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([""], pa.string())}))
    assert femb.hash_embed(blank).take_all() == []
