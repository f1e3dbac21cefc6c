"""CCNet paragraph-dedup semantics (functions/dedup.paragraph_dedup):
first global occurrence wins, later copies drop, per-doc reassembly in
order, xx64/md5 fingerprint modes agree."""

import pyarrow as pa

from docling_translate_ray.functions import dedup as fdedup


def _run(rows, **kw):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    out = fdedup.paragraph_dedup(ds, **kw).to_pandas()
    return {int(r.doc_id): (r.text_deduped, int(r.n_paras_kept))
            for r in out.itertuples()}


def test_first_occurrence_wins(ray_session):
    got = _run([
        (1, "alpha\n\nshared"),
        (2, "shared\n\nbeta"),      # 'shared' already seen in doc 1
        (3, "shared"),              # all paras dropped -> omitted
    ])
    assert got == {1: ("alpha\n\nshared", 2), 2: ("beta", 1)}


def test_within_doc_repeat_keeps_first(ray_session):
    got = _run([(5, "x\n\nx\n\ny")])
    assert got == {5: ("x\n\ny", 2)}


def test_empty_and_ws_paras_ignored(ray_session):
    got = _run([(1, "a\n\n   \n\nb"), (2, "")])
    assert got == {1: ("a\n\nb", 2)}


def test_strip_normalizes_before_compare(ray_session):
    # '  a  ' and 'a' are the same paragraph after the frozen strip
    got = _run([(1, "a"), (2, "  a  \n\nb")])
    assert got == {1: ("a", 1), 2: ("b", 1)}


def test_md5_and_xx64_agree(ray_session):
    rows = [(i, f"p{i % 3}\n\nuniq{i}") for i in range(12)]
    assert _run(rows, hash_mode="md5") == _run(rows, hash_mode="xx64")
