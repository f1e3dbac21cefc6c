"""Cross-snapshot crawl operators (functions/crawl.py): diff classification
ground truth, md5 fingerprint semantics, argmax determinism, repartition
invariance."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from docling_translate_ray.functions import crawl


def _ds(rows, schema):
    import ray.data

    return ray.data.from_arrow(pa.table(rows, schema=schema))


_PAGE_SCHEMA = pa.schema([("url", pa.string()), ("text", pa.string())])


def _to_rows(ds):
    return sorted(
        (tuple(r.values()) for r in ds.take_all()), key=lambda t: t[0]
    )


def test_snapshot_diff_classifies_all_three_kinds():
    old = _ds({"url": ["u1", "u2", "u3", "u4"],
               "text": ["same", "before", "gone", "also same"]}, _PAGE_SCHEMA)
    new = _ds({"url": ["u1", "u2", "u5", "u4"],
               "text": ["same", "after", "brand new", "also same"]}, _PAGE_SCHEMA)
    got = _to_rows(crawl.snapshot_diff(old, new))
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got == [
        ("u2", "changed", md5("before"), md5("after")),
        ("u3", "removed", md5("gone"), ""),
        ("u5", "added", "", md5("brand new")),
    ]


def test_snapshot_diff_empty_and_disjoint():
    old = _ds({"url": ["a"], "text": ["x"]}, _PAGE_SCHEMA)
    new = _ds({"url": ["b"], "text": ["y"]}, _PAGE_SCHEMA)
    got = _to_rows(crawl.snapshot_diff(old, new))
    assert [(r[0], r[1]) for r in got] == [("a", "removed"), ("b", "added")]
    # identical snapshots → empty diff
    same = _to_rows(crawl.snapshot_diff(old, old))
    assert same == []


_VER_SCHEMA = pa.schema([("url", pa.string()), ("warc_ts", pa.int64()),
                         ("text", pa.string())])


def test_latest_page_version_argmax_and_tiebreak():
    ds = _ds({
        "url": ["u", "u", "u", "v", "w", "w"],
        "warc_ts": [3, 1, 2, 9, 5, 5],
        "text": ["newest", "oldest", "mid", "only", "zebra", "alpha"],
    }, _VER_SCHEMA)
    got = {r["url"]: (r["warc_ts"], r["text"])
           for r in crawl.latest_page_version(ds).take_all()}
    assert got["u"] == (3, "newest")
    assert got["v"] == (9, "only")
    # tie on warc_ts breaks by remaining columns DESCENDING → "zebra"
    assert got["w"] == (5, "zebra")


def test_latest_page_version_repartition_invariant():
    rows = {
        "url": [f"u{i % 7}" for i in range(50)],
        "warc_ts": [(i * 13) % 29 for i in range(50)],
        "text": [f"t{i}" for i in range(50)],
    }
    a = crawl.latest_page_version(_ds(rows, _VER_SCHEMA).repartition(2))
    b = crawl.latest_page_version(_ds(rows, _VER_SCHEMA).repartition(9))
    ra = sorted((r["url"], r["warc_ts"], r["text"]) for r in a.take_all())
    rb = sorted((r["url"], r["warc_ts"], r["text"]) for r in b.take_all())
    assert ra == rb and len(ra) == 7


def test_host_template_lines_is_host_scoped():
    """The same line is template on host A (3 docs) but rare on host B
    (1 doc) — it must vanish from A's docs and survive in B's."""
    from docling_translate_ray.functions.crawl import host_template_lines

    footer = "copyright acme corp all rights reserved"
    rows = {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "url": pa.array([
            "https://a.example/p1", "https://a.example/p2",
            "https://a.example/p3", "https://b.example/p1",
        ], pa.string()),
        "text": pa.array([
            f"unique one\n{footer}", f"unique two\n{footer}",
            f"unique three\n{footer}", f"other host body\n{footer}",
        ], pa.string()),
    }
    schema = pa.schema([("doc_id", pa.int64()), ("url", pa.string()),
                        ("text", pa.string())])
    got = {r["doc_id"]: (r["host"], r["text_cleaned"], r["n_lines_kept"])
           for r in host_template_lines(
               _ds(rows, schema), min_docs=3).take_all()}
    assert got[1] == ("a.example", "unique one", 1)
    assert got[2] == ("a.example", "unique two", 1)
    assert got[3] == ("a.example", "unique three", 1)
    # host B keeps the footer — only 1 doc there
    assert got[4] == ("b.example", f"other host body\n{footer}", 2)


def test_host_template_lines_omits_all_template_docs():
    from docling_translate_ray.functions.crawl import host_template_lines

    rows = {
        "doc_id": pa.array([1, 2], pa.int64()),
        "url": pa.array(["https://a.example/x", "https://a.example/y"],
                        pa.string()),
        "text": pa.array(["same\nlines", "same\nlines"], pa.string()),
    }
    schema = pa.schema([("doc_id", pa.int64()), ("url", pa.string()),
                        ("text", pa.string())])
    out = host_template_lines(_ds(rows, schema), min_docs=2).take_all()
    assert out == []


def test_frontier_schedule_politeness_cycles():
    """9 urls on one host at k=4 → cycles 1,1,1,1,2,2,2,2,3 in
    priority-desc order; a second host schedules independently."""
    tbl = pa.table({
        "url": [f"https://big.example.com/p{i}" for i in range(9)]
               + ["https://small.example.com/a", "https://small.example.com/b"],
        "priority": pa.array([90, 80, 70, 60, 50, 40, 30, 20, 10, 5, 99],
                             pa.int64()),
    })
    got = crawl.frontier_schedule(_ds(tbl, tbl.schema), k_per_cycle=4)
    rows = {r["url"]: (r["host"], r["priority"], r["cycle"])
            for r in got.take_all()}
    assert rows["https://big.example.com/p0"] == ("big.example.com", 90, 1)
    assert rows["https://big.example.com/p3"] == ("big.example.com", 60, 1)
    assert rows["https://big.example.com/p4"] == ("big.example.com", 50, 2)
    assert rows["https://big.example.com/p7"] == ("big.example.com", 20, 2)
    assert rows["https://big.example.com/p8"] == ("big.example.com", 10, 3)
    # small host: priority 99 first, both inside cycle 1
    assert rows["https://small.example.com/b"] == ("small.example.com", 99, 1)
    assert rows["https://small.example.com/a"] == ("small.example.com", 5, 1)


def test_frontier_schedule_tie_breaks_by_url_and_validates_k():
    import pytest

    tbl = pa.table({
        "url": ["https://h.example.com/z", "https://h.example.com/a"],
        "priority": pa.array([7, 7], pa.int64()),
    })
    got = crawl.frontier_schedule(_ds(tbl, tbl.schema), k_per_cycle=1)
    rows = {r["url"]: r["cycle"] for r in got.take_all()}
    # equal priority → url ascending: /a fetches first
    assert rows["https://h.example.com/a"] == 1
    assert rows["https://h.example.com/z"] == 2
    with pytest.raises(ValueError):
        crawl.frontier_schedule(_ds(tbl, tbl.schema), k_per_cycle=0)


def test_recrawl_priority_change_rates():
    """Hand-built history: u_static never changes (0%), u_flappy changes
    every fetch (100%), u_half changes once in two intervals (50%),
    u_single has one version (rate 0, no intervals)."""
    tbl = pa.table({
        "url": ["u_static"] * 3 + ["u_flappy"] * 3 + ["u_half"] * 3
               + ["u_single"],
        "warc_ts": pa.array([1, 2, 3, 1, 2, 3, 1, 2, 3, 1], pa.int64()),
        "text": ["same", "same", "same",
                 "a", "b", "c",
                 "x", "x", "y",
                 "once"],
    })
    got = {r["url"]: (r["n_versions"], r["n_changes"], r["change_rate_pct"])
           for r in crawl.recrawl_priority(_ds(tbl, tbl.schema)).take_all()}
    assert got == {
        "u_static": (3, 0, 0),
        "u_flappy": (3, 2, 100),
        "u_half": (3, 1, 50),
        "u_single": (1, 0, 0),
    }


def test_recrawl_priority_orders_by_ts_not_input_order():
    """Out-of-order input rows: change counting follows warc_ts, so a
    history A→B→A at ts 1,2,3 has 2 changes even when rows arrive
    shuffled."""
    tbl = pa.table({
        "url": ["u"] * 3,
        "warc_ts": pa.array([3, 1, 2], pa.int64()),
        "text": ["A", "A", "B"],  # ts-ordered: A(1), B(2), A(3)
    })
    got = crawl.recrawl_priority(_ds(tbl, tbl.schema)).take_all()
    assert (got[0]["n_versions"], got[0]["n_changes"]) == (3, 2)


def test_parse_robots_groups_comments_and_empty_disallow():
    txt = (
        "# header comment\n"
        "User-agent: googlebot\n"
        "User-agent: *\n"          # multi-agent group includes *
        "Disallow: /private/\n"
        "disallow: /tmp/  # inline comment\n"
        "\n"
        "User-agent: other\n"      # NEW group — does not apply to us
        "Disallow: /everything/\n"
        "\n"
        "User-agent: *\n"
        "Disallow:\n"              # empty = allow, contributes nothing
        "Crawl-delay: 10\n"        # unknown field ignored
    )
    assert crawl.parse_robots(txt) == ["/private/", "/tmp/"]
    assert crawl.parse_robots(txt, agent="other") == ["/everything/"]
    assert crawl.parse_robots("") == []
    # directives before any User-agent line apply to no one
    assert crawl.parse_robots("Disallow: /x\n") == []


def test_robots_filter_prefix_semantics():
    import ray.data

    pages = pa.table({"url": [
        "https://a.example/private/p1",   # blocked (prefix)
        "https://a.example/privateer",    # NOT blocked (path, not prefix... /private/ vs /privateer)
        "https://a.example/ok",           # kept
        "https://b.example/private/p1",   # other host: no rules -> kept
    ]})
    robots = pa.table({
        "host": ["a.example"],
        "robots_txt": ["User-agent: *\nDisallow: /private/\n"],
    })
    kept = sorted(r["url"] for r in crawl.robots_filter(
        ray.data.from_arrow(pages), ray.data.from_arrow(robots)).take_all())
    assert kept == [
        "https://a.example/ok",
        "https://a.example/privateer",
        "https://b.example/private/p1",
    ]


def test_crawl_cycle_composite_hand_case():
    """robots gate + change detection + politeness in one plan: changed
    pages outrank unchanged, disallowed urls never appear, old-only urls
    drop, new-only urls enter at priority 0."""
    import ray.data

    from docling_translate_ray.pipelines.crawl_cycle import crawl_cycle

    old = pa.table({
        "url": ["https://a.example/ok1", "https://a.example/ok2",
                "https://a.example/sec/page", "https://a.example/gone"],
        "text": ["v1", "same", "v1", "bye"],
    })
    new = pa.table({
        "url": ["https://a.example/ok1", "https://a.example/ok2",
                "https://a.example/sec/page", "https://b.example/x"],
        "text": ["v2", "same", "v2", "fresh"],
    })
    robots = pa.table({
        "host": ["a.example"],
        "robots_txt": ["User-agent: *\nDisallow: /sec/\n"],
    })
    plan = {r["url"]: (r["host"], r["priority"], r["cycle"])
            for r in crawl_cycle(ray.data.from_arrow(old),
                                 ray.data.from_arrow(new),
                                 ray.data.from_arrow(robots),
                                 k_per_cycle=1).take_all()}
    assert plan == {
        "https://a.example/ok1": ("a.example", 100, 1),  # changed → first
        "https://a.example/ok2": ("a.example", 0, 2),    # unchanged → later
        "https://b.example/x": ("b.example", 0, 1),      # new host, own queue
    }


def test_parse_sitemap_subset():
    xml = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url>\n  <loc> https://a.example/1 </loc>\n"
        "  <lastmod>2024-01-05</lastmod>\n</url>"
        "<URL><LOC>https://a.example/2</LOC></URL>"      # case-insensitive
        "<url><lastmod>2024-02-02</lastmod></url>"        # no loc -> skipped
        "<url><loc></loc></url>"                          # empty loc -> skipped
        "</urlset>"
    )
    assert crawl.parse_sitemap(xml) == [
        ("https://a.example/1", "2024-01-05"),
        ("https://a.example/2", ""),
    ]
    assert crawl.parse_sitemap("") == []
    assert crawl.parse_sitemap("<notxml>") == []


def test_host_reputation_integer_stats():
    import ray.data

    from docling_translate_ray.functions.urltools import host_reputation

    good = ("This is a perfectly reasonable sentence with many plain "
            "words inside it.")
    junk = "!!! ??? ,,, ;;; ..."
    pages = pa.table({
        "url": ["https://a.example/1", "https://a.example/2",
                "https://a.example/3", "https://b.example/1"],
        "text": [good, good, junk, good],
    })
    got = {r["host"]: r for r in host_reputation(
        ray.data.from_arrow(pages)).take_all()}
    a, b = got["a.example"], got["b.example"]
    n_good = len(good.split())
    assert a["n_pages"] == 3
    assert a["total_tokens"] == 2 * n_good + len(junk.split())
    assert a["tokens_per_page"] == a["total_tokens"] // 3
    assert a["ok_pct"] == 200 // 3          # 2 of 3 pass -> 66
    assert (b["n_pages"], b["ok_pct"]) == (1, 100)


def test_new_crawl_ops_repartition_invariant():
    """frontier_schedule / recrawl_priority / robots_filter results are
    pure functions of the row set, not of block boundaries."""
    import ray.data

    tbl = pa.table({
        "url": [f"https://h{i % 3}.example/p{i}" for i in range(24)],
        "priority": pa.array([(i * 37) % 11 for i in range(24)], pa.int64()),
    })

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    a = rows(crawl.frontier_schedule(ray.data.from_arrow(tbl), k_per_cycle=2))
    b = rows(crawl.frontier_schedule(
        ray.data.from_arrow(tbl).repartition(7), k_per_cycle=2))
    assert a == b and len(a) == 24

    hist = pa.table({
        "url": [f"u{i % 5}" for i in range(20)],
        "warc_ts": pa.array(list(range(20)), pa.int64()),
        "text": [f"v{(i * 7) % 3}" for i in range(20)],
    })
    a = rows(crawl.recrawl_priority(ray.data.from_arrow(hist)))
    b = rows(crawl.recrawl_priority(
        ray.data.from_arrow(hist).repartition(9)))
    assert a == b and len(a) == 5

    robots = pa.table({"host": ["h0.example"],
                       "robots_txt": ["User-agent: *\nDisallow: /p1\n"]})
    pages = tbl.select(["url"])
    a = rows(crawl.robots_filter(ray.data.from_arrow(pages),
                                 ray.data.from_arrow(robots)))
    b = rows(crawl.robots_filter(ray.data.from_arrow(pages).repartition(5),
                                 ray.data.from_arrow(robots)))
    assert a == b


def test_robots_filter_no_rules_keeps_everything():
    import ray.data

    pages = pa.table({"url": ["https://a.example/x", "https://b.example/y"]})
    empty_rules = pa.table({"host": pa.array([], pa.string()),
                            "robots_txt": pa.array([], pa.string())})
    kept = crawl.robots_filter(ray.data.from_arrow(pages),
                               ray.data.from_arrow(empty_rules)).take_all()
    assert sorted(r["url"] for r in kept) == sorted(pages["url"].to_pylist())


def test_parse_crawl_delay_precedence_and_values():
    txt = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /a\n\n"
        "User-agent: mybot\nCrawl-delay: 0.4\n\n"   # ceil -> 1
        "User-agent: slowbot\nCrawl-delay: ten\n"   # malformed -> ignored
    )
    assert crawl.parse_crawl_delay(txt) == 2
    # named group OVERRIDES *, never merges
    assert crawl.parse_crawl_delay(txt, agent="mybot") == 1
    assert crawl.parse_crawl_delay(txt, agent="slowbot") is None
    assert crawl.parse_crawl_delay("") is None
    # multiple applying groups: the LARGEST (most polite) delay wins
    two = "User-agent: *\nCrawl-delay: 1\n\nUser-agent: *\nCrawl-delay: 7\n"
    assert crawl.parse_crawl_delay(two) == 7


def test_frontier_schedule_per_host_k_column():
    """k_column overrides the default per row: the slow host fits 1 url
    per cycle, the default host 2; null k falls back to k_per_cycle."""
    tbl = pa.table({
        "url": [f"https://slow.example/p{i}" for i in range(3)]
               + [f"https://fast.example/p{i}" for i in range(3)],
        "priority": pa.array([30, 20, 10, 30, 20, 10], pa.int64()),
        "k": pa.array([1, 1, 1, None, None, None], pa.int64()),
    })
    got = {r["url"]: r["cycle"] for r in crawl.frontier_schedule(
        _ds(tbl, tbl.schema), k_per_cycle=2, k_column="k").take_all()}
    assert got == {
        "https://slow.example/p0": 1,
        "https://slow.example/p1": 2,
        "https://slow.example/p2": 3,
        "https://fast.example/p0": 1,
        "https://fast.example/p1": 1,
        "https://fast.example/p2": 2,
    }
