"""End-to-end tests for the bitext composite pipeline
(pipelines/bitext.run_bitext_job): URL-pattern pair mining →
semi-filtered sentencization → Gale-Church alignment with lineage
passthrough, plus the StageRunner resume contract."""

import math

import pyarrow as pa
import pytest

from docling_translate_ray.pipelines.bitext import run_bitext_job

BEAD_COLS = ["pair_id", "bead_id", "src_lo", "src_n", "tgt_lo", "tgt_n",
             "bead", "src_text", "tgt_text", "tgt_id", "tgt_lang"]


def _corpus():
    """4 sites × {en, de, fr} plus two never-pairing docs.  Word counts
    differ per lang so merges/deletions appear; doc_id = site*10+slot."""
    rows = []
    for site in range(4):
        for slot, lang in enumerate(["en", "de", "fr"]):
            did = site * 10 + slot
            n_words = 7 + 3 * site + 2 * slot
            words = [f"w{site}x{k}{lang}" for k in range(n_words)]
            rows.append({
                "doc_id": did,
                "url": f"https://s{site}.example/{lang}/a{site}",
                "text": " ".join(words),
            })
    rows.append({"doc_id": 900, "url": "https://s9.example/about",
                 "text": "no language segment here"})
    rows.append({"doc_id": 901, "url": "https://s0.example/en/a99",
                 "text": "unpaired english page alone"})
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
    })


@pytest.fixture(scope="module")
def beads_and_stats():
    import ray.data

    ds = ray.data.from_arrow(_corpus())
    beads, stats = run_bitext_job(ds, sent_words=5, num_partitions=4)
    return beads.take_all(), stats


def test_schema_and_counts(beads_and_stats):
    rows, stats = beads_and_stats
    assert rows, "expected beads"
    assert sorted(rows[0].keys()) == sorted(BEAD_COLS)
    # 4 sites × 2 target langs pair against the en side; the unpaired
    # en page (a99) forms its own site_key with no other lang
    assert stats["n_pairs"] == 8
    # paired docs: 4 sites × 3 langs (the /about and a99 docs are
    # filtered before sentencization ever touches their text)
    assert stats["n_docs_paired"] == 12
    assert stats["n_beads"] == len(rows)


def test_pairs_are_en_src_and_lineage_consistent(beads_and_stats):
    rows, _ = beads_and_stats
    for r in rows:
        assert r["pair_id"] % 10 == 0          # en slot is slot 0
        assert r["tgt_lang"] in ("de", "fr")
        assert r["tgt_id"] % 10 in (1, 2)
        assert r["tgt_id"] // 10 == r["pair_id"] // 10  # same site


def test_beads_partition_both_sides(beads_and_stats):
    rows, _ = beads_and_stats
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r["pair_id"], r["tgt_id"]), []).append(r)
    assert len(by_pair) == 8
    for (pid, tid), beads in by_pair.items():
        beads.sort(key=lambda r: r["bead_id"])
        site, slot = tid // 10, tid % 10
        n_src = math.ceil((7 + 3 * site) / 5)
        n_tgt = math.ceil((7 + 3 * site + 2 * slot) / 5)
        assert [b["bead_id"] for b in beads] == list(range(len(beads)))
        s = t = 0
        for b in beads:
            assert b["src_lo"] == s and b["tgt_lo"] == t
            assert b["bead"] == f'{b["src_n"]}-{b["tgt_n"]}'
            s += b["src_n"]
            t += b["tgt_n"]
        assert s == n_src and t == n_tgt


def test_bead_text_reassembles_documents(beads_and_stats):
    rows, _ = beads_and_stats
    corpus = {r["doc_id"]: r["text"] for r in _corpus().to_pylist()}
    by_pair = {}
    for r in rows:
        by_pair.setdefault((r["pair_id"], r["tgt_id"]), []).append(r)
    for (pid, tid), beads in by_pair.items():
        beads.sort(key=lambda r: r["bead_id"])
        src = " ".join(b["src_text"] for b in beads if b["src_text"])
        tgt = " ".join(b["tgt_text"] for b in beads if b["tgt_text"])
        assert src == corpus[pid]
        assert tgt == corpus[tid]


def test_resume_skips_completed_stages(tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_corpus())
    work = str(tmp_path / "bitext_work")
    _, stats1 = run_bitext_job(ds, work_dir=work, sent_words=5,
                               num_partitions=4)
    # poison the input: a clean resume must never re-read it
    poisoned = ray.data.from_arrow(_corpus()).map_batches(
        lambda b: (_ for _ in ()).throw(RuntimeError("input re-read")),
        batch_format="pyarrow")
    beads2, stats2 = run_bitext_job(poisoned, work_dir=work, sent_words=5,
                                    num_partitions=4, resume=True)
    assert stats2 == stats1
    assert beads2.count() == stats1["n_beads"]


def test_param_mismatch_refused(tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_corpus())
    work = str(tmp_path / "bitext_work2")
    run_bitext_job(ds, work_dir=work, sent_words=5, num_partitions=4)
    with pytest.raises(ValueError, match="param"):
        run_bitext_job(ds, work_dir=work, sent_words=7, num_partitions=4,
                       resume=True)


def test_empty_when_no_language_urls():
    import ray.data

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "url": pa.array(["https://a.example/x", "https://b.example/y"],
                        pa.string()),
        "text": pa.array(["one two", "three four"], pa.string()),
    })
    beads, stats = run_bitext_job(ray.data.from_arrow(t), num_partitions=2)
    assert stats == {"n_pairs": 0, "n_docs_paired": 0, "n_beads": 0}
    assert beads.count() == 0
    assert sorted(beads.schema().names) == sorted(BEAD_COLS)
