"""Mirror detection + crawl-trap detection (functions/mirrors.py)."""

import pyarrow as pa

from docling_translate_ray.functions import mirrors as fm


def _pages(rows):
    import ray

    return ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_mirror_pair_detected(ray_session):
    rows = []
    # a.example and b.example serve identical 4-page corpora (mirrors);
    # c.example shares nothing
    for i in range(4):
        rows.append((f"https://a.example/p{i}", f"content {i}"))
        rows.append((f"https://b.example/p{i}", f"content {i}"))
        rows.append((f"https://c.example/p{i}", f"other {i}"))
    out = fm.mirror_hosts(_pages(rows), min_shared=3, min_pct=50).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.host_a, r.host_b, int(r.shared), int(r.pct)) == \
        ("a.example", "b.example", 4, 100)


def test_mirror_pct_gate(ray_session):
    rows = []
    # d shares 3 fps with e but also has 3 of its own: pct of the
    # SMALLER side (containment) = 100*3//6 = 50 -> gated at 60
    for i in range(10):
        rows.append((f"https://e.example/p{i}", f"c{i}"))
    for i in range(3):
        rows.append((f"https://d.example/p{i}", f"c{i}"))
        rows.append((f"https://d.example/own{i}", f"own{i}"))
    out = fm.mirror_hosts(_pages(rows), min_shared=3, min_pct=60).to_pandas()
    assert len(out) == 0
    out2 = fm.mirror_hosts(_pages(rows), min_shared=3, min_pct=50).to_pandas()
    assert len(out2) == 1 and int(out2.iloc[0].pct) == 50
    # full containment: the 3-fp-only subset site reads pct 100
    sub = [r for r in rows if "/own" not in r[0]]
    out3 = fm.mirror_hosts(_pages(sub), min_shared=3, min_pct=90).to_pandas()
    assert len(out3) == 1 and int(out3.iloc[0].pct) == 100


def test_mirror_boilerplate_cap(ray_session):
    # one fp on 20 hosts (> cap 16) must not create any pair
    rows = [(f"https://h{i}.example/x", "same everywhere")
            for i in range(20)]
    out = fm.mirror_hosts(_pages(rows), min_shared=1, min_pct=0).to_pandas()
    assert len(out) == 0


def test_trap_patterns(ray_session):
    rows = []
    for i in range(120):
        rows.append((f"https://cal.example/day/{i}/view", f"t{i}"))
    for i in range(5):
        rows.append((f"https://ok.example/about{i}", f"a{i}"))
    out = fm.url_pattern_traps(_pages(rows), min_pages=100).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.host, r.pattern, int(r.n_pages)) == \
        ("cal.example", "/day/N/view", 120)


def test_trap_query_fragment_stripped(ray_session):
    rows = [(f"https://q.example/s?page={i}#frag", f"x{i}")
            for i in range(100)]
    out = fm.url_pattern_traps(_pages(rows), min_pages=100).to_pandas()
    assert len(out) == 1 and out.iloc[0].pattern == "/s"


def test_trap_uppercase_scheme_host_normalized(ray_session):
    # 'HTTPS://Host/…' must group with 'https://host/…' — the hostless
    # strip is (?i) so scheme+authority never leaks into the pattern
    rows = [(f"{'HTTPS' if i % 2 else 'https'}://{'Cal' if i % 2 else 'cal'}"
             f".example/day/{i}/view", f"t{i}") for i in range(120)]
    out = fm.url_pattern_traps(_pages(rows), min_pages=100).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.host, r.pattern, int(r.n_pages)) == \
        ("cal.example", "/day/N/view", 120)
