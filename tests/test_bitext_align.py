"""gale_church_align (functions/bitext): golden beads, structural
invariants, determinism, the O(n·m) fence, and the driver pair-builder."""

import pyarrow as pa
import pytest

from docling_translate_ray.functions.bitext import (
    _gc_align_one,
    gale_church_align,
)


def _check_partition(beads, n_src, n_tgt):
    """Beads must tile [0,n_src) and [0,n_tgt) in order with no gaps."""
    si = ti = 0
    for slo, sn, tlo, tn in beads:
        assert (slo, tlo) == (si, ti)
        assert (sn, tn) in {(1, 1), (1, 0), (0, 1), (2, 1), (1, 2), (2, 2)}
        si += sn
        ti += tn
    assert (si, ti) == (n_src, n_tgt)


def test_identity_all_one_one():
    lens = [12, 40, 7, 33, 21]
    beads = _gc_align_one(lens, lens)
    assert beads == [(i, 1, i, 1) for i in range(len(lens))]


def test_merge_is_two_one():
    beads = _gc_align_one([10, 12, 30], [22, 30])
    assert beads == [(0, 2, 0, 1), (2, 1, 1, 1)]


def test_split_is_one_two():
    beads = _gc_align_one([22, 30], [10, 12, 30])
    assert beads == [(0, 1, 0, 2), (1, 1, 2, 1)]


def test_empty_sides():
    assert _gc_align_one([], [5]) == [(0, 0, 0, 1)]
    assert _gc_align_one([7], []) == [(0, 1, 0, 0)]
    assert _gc_align_one([], []) == []


def test_structural_invariants_random():
    import random

    rng = random.Random(3)
    for _ in range(25):
        src = [rng.randrange(1, 60) for _ in range(rng.randrange(0, 12))]
        tgt = [rng.randrange(1, 60) for _ in range(rng.randrange(0, 12))]
        beads = _gc_align_one(src, tgt)
        _check_partition(beads, len(src), len(tgt))
        # determinism
        assert _gc_align_one(src, tgt) == beads


def _pairs_table():
    return pa.table({
        "pair_id": pa.array([0, 1, 2], pa.int64()),
        "src_sents": pa.array(
            [["hello there friend", "a much longer second sentence here"],
             ["one two", "three four", "five six"],
             []],
            pa.list_(pa.string())),
        "tgt_sents": pa.array(
            [["hello there friend", "a much longer second sentence here"],
             ["one two three four", "five six"],
             ["orphan"]],
            pa.list_(pa.string())),
    })


def test_dataset_beads_and_schema():
    import ray.data

    out = gale_church_align(
        ray.data.from_arrow(_pairs_table())).to_pandas()
    assert list(out.columns) == ["pair_id", "bead_id", "src_lo", "src_n",
                                 "tgt_lo", "tgt_n", "bead"]
    by_pair = {p: g.sort_values("bead_id") for p, g in out.groupby("pair_id")}
    # pair 0: identical sides -> two 1-1 beads
    assert list(by_pair[0]["bead"]) == ["1-1", "1-1"]
    # pair 1: first two src sentences merged on tgt -> 2-1 then 1-1
    assert list(by_pair[1]["bead"]) == ["2-1", "1-1"]
    # pair 2: empty src, one tgt -> a single 0-1 bead
    assert list(by_pair[2]["bead"]) == ["0-1"]
    for p, g in by_pair.items():
        beads = list(zip(g["src_lo"], g["src_n"], g["tgt_lo"], g["tgt_n"]))
        tbl = _pairs_table()
        n_src = len(tbl["src_sents"][p].as_py())
        n_tgt = len(tbl["tgt_sents"][p].as_py())
        _check_partition(beads, n_src, n_tgt)


def test_emit_text_pairs():
    import ray.data

    out = gale_church_align(
        ray.data.from_arrow(_pairs_table()), emit_text=True).to_pandas()
    assert {"src_text", "tgt_text"} <= set(out.columns)
    p1 = out[out.pair_id == 1].sort_values("bead_id")
    assert list(p1["src_text"]) == ["one two three four", "five six"]
    assert list(p1["tgt_text"]) == ["one two three four", "five six"]
    # deletion/insertion beads emit empty on the absent side
    p2 = out[out.pair_id == 2].iloc[0]
    assert p2.src_text == "" and p2.tgt_text == "orphan"


def test_max_sentences_fence():
    import ray.data

    big = pa.table({
        "pair_id": pa.array([0], pa.int64()),
        "src_sents": pa.array([["x"] * 30], pa.list_(pa.string())),
        "tgt_sents": pa.array([["x"] * 30], pa.list_(pa.string())),
    })
    with pytest.raises(Exception, match="max_sentences"):
        gale_church_align(ray.data.from_arrow(big),
                          max_sentences=10).take_all()


def test_driver_query_bead_mix(sf_dir):
    """The q_bitext_align perturbation scheme must produce non-vacuous
    evidence: 1-1 beads plus at least one merge (2-1) and one deletion
    (1-0/2-1 from the dropped-first-sentence docs)."""
    from docling_translate_ray.pipelines.queries import q_bitext_align

    out = q_bitext_align(sf_dir).to_pandas()
    assert len(out) > 0
    kinds = set(out["bead"])
    assert "1-1" in kinds
    assert "2-1" in kinds
    # every pair's beads tile its ranges
    g0 = out[out.pair_id == out.pair_id.iloc[0]].sort_values("bead_id")
    assert g0["src_lo"].iloc[0] == 0 and g0["tgt_lo"].iloc[0] == 0
