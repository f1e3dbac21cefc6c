"""Mixed-language detection (functions/text_stats.lang_mix)."""

import pyarrow as pa

from docling_translate_ray.functions.text_stats import LangId, lang_mix

EN = "the and of to a in is that it for"
DE = "der die das und ist nicht ein zu mit von"
FR = "le la les et est un une de que pour"


def _run(rows, **kw):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    out = lang_mix(ds, **kw).to_pandas()
    return {int(r.doc_id): (r.main_lang, int(r.n_lines), int(r.main_pct),
                            bool(r.is_mixed))
            for r in out.itertuples()}


def test_pure_doc_not_mixed(ray_session):
    got = _run([(1, "\n".join([EN] * 5))])
    assert got == {1: ("en", 5, 100, False)}


def test_bilingual_doc_flagged(ray_session):
    got = _run([(2, "\n".join([EN, DE, EN, DE]))])
    # 2/4 each; tie-break -> 'de' (smallest string), pct 50 -> mixed
    assert got == {2: ("de", 4, 50, True)}


def test_majority_threshold_boundary(ray_session):
    # 7 en + 3 fr -> 70% -> NOT mixed at the default 70 cutoff
    got = _run([(3, "\n".join([EN] * 7 + [FR] * 3))])
    assert got == {3: ("en", 10, 70, False)}
    got = _run([(3, "\n".join([EN] * 6 + [FR] * 4))])
    assert got[3] == ("en", 10, 60, True)


def test_blank_lines_skipped_and_empty_doc_omitted(ray_session):
    got = _run([(4, f"{EN}\n   \n\n{EN}"), (5, ""), (6, "  \n  ")])
    assert got == {4: ("en", 2, 100, False)}


def test_per_line_chain_matches_scalar_spec(ray_session):
    # the vote consumes the SAME LangId chain: each planted line alone
    # must classify as its planted language
    lid = LangId()
    for line, want in [(EN, "en"), (DE, "de"), (FR, "fr"),
                       ("qqq zzz", "und")]:
        assert lid.detect_one(line) == want
