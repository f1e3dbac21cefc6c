"""C4 line-quality trim (functions/dedup.line_quality_trim)."""

import pyarrow as pa

from docling_translate_ray.functions.dedup import line_quality_trim


def _run(rows, **kw):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    out = line_quality_trim(ds, **kw).to_pandas()
    return {int(r.doc_id): (r.text_trimmed, int(r.n_lines), int(r.n_kept))
            for r in out.itertuples()}


def test_three_rules(ray_session):
    text = "\n".join([
        "a good enough line.",        # kept
        "too short.",                  # 2 words -> dropped
        "no terminal punctuation at all",  # dropped
        "THIS LINE IS VERY SHOUTY INDEED!",  # caps -> dropped
        'he said "stop" and left!',    # kept
    ])
    got = _run([(1, text)])
    assert got == {1: ('a good enough line.\nhe said "stop" and left!',
                       5, 2)}


def test_quote_and_question_terminals(ray_session):
    text = 'is this kept too?\nshe whispered "yes"'
    got = _run([(2, text)])
    assert got[2][2] == 2


def test_all_dropped_doc_omitted(ray_session):
    got = _run([(3, "SHOUT ONE TWO THREE!"), (4, "fine line stays here.")])
    assert 3 not in got and got[4][2] == 1


def test_caps_boundary_exactly_half(ray_session):
    # 'AA bb.' -> up=2, alpha=4 -> 2*2 <= 4 -> kept (boundary inclusive)
    got = _run([(5, "AA bb cc.")])
    assert got[5][2] == 1
