"""URL canonicalization + canonical-URL dedup (functions/urltools).

The canonicalization spec (fragment → query → lowercase authority →
default ports → www. → trailing slash, in that order) is frozen here with
unit cases; the DuckDB oracle in __ray_entry__ mirrors it regex for regex,
so any drift between the two surfaces as a CORRECTNESS hash mismatch.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

import ray.data

from docling_translate_ray.functions.urltools import (
    canonicalize_batch,
    canonicalize_urls,
    domain_cap,
    extract_hosts,
    url_dedup,
)


def _canon(url: str) -> str:
    return canonicalize_urls(pl.Series([url])).to_list()[0]


def test_canonicalize_rules():
    # all six rules in one URL
    assert (
        _canon("https://www.Example.COM:443/Path/To/Page?q=1#frag")
        == "https://example.com/Path/To/Page"
    )
    # path case is PRESERVED, authority case is not
    assert _canon("HTTP://EXAMPLE.com/CaseSensitive") == "http://example.com/CaseSensitive"
    # non-default ports survive; a ':' in the path is not a port
    assert _canon("https://example.com:8443/keep:port") == "https://example.com:8443/keep:port"
    # default port dropped with and without a trailing path
    assert _canon("http://example.com:80") == "http://example.com"
    assert _canon("http://example.com:80/x") == "http://example.com/x"
    # :443 only default for https, :80 only for http
    assert _canon("http://example.com:443/x") == "http://example.com:443/x"
    # www. only stripped as the leading host label of http(s)
    assert _canon("https://www.example.com/a") == "https://example.com/a"
    assert _canon("https://notwww.example.com/a") == "https://notwww.example.com/a"
    # trailing slash only dropped after a non-slash char (idempotence
    # guard): a double slash is left alone
    assert _canon("https://example.com/a//") == "https://example.com/a//"
    assert _canon("//") == "//"
    # schemeless: rules 1/2/6 only
    assert _canon("no-scheme/path/?x=1#y") == "no-scheme/path"
    # non-http scheme: authority still lowercased, ports kept
    assert _canon("ftp://Host.Com:21/File") == "ftp://host.com:21/File"
    assert _canon("") == ""


def test_canonicalize_idempotent():
    urls = pl.Series(
        [
            "https://www.Example.COM:443/Path?q#f",
            "HTTP://A.B:80/",
            "relative/x/",
            "https://x.com/a/b/c",
        ]
    )
    once = canonicalize_urls(urls)
    twice = canonicalize_urls(once)
    assert once.to_list() == twice.to_list()


def test_canonicalize_batch_appends_column():
    t = pa.table({"url": ["https://WWW.X.com/A/", None]})
    out = canonicalize_batch(t)
    assert out["canonical_url"].to_pylist() == ["https://x.com/A", ""]


def test_url_dedup_groups_variants():
    # 3 surface variants of one canonical url + 1 distinct url
    t = pa.table(
        {
            "url": [
                "https://www.site.com/p?utm=1",
                "HTTPS://SITE.COM/p#frag",
                "https://site.com:443/p/",
                "https://other.com/q",
            ],
            "doc_id": [7, 3, 5, 9],
        }
    )
    out = url_dedup(ray.data.from_arrow(t), num_partitions=4).take_all()
    by_url = {r["canonical_url"]: r for r in out}
    assert set(by_url) == {"https://site.com/p", "https://other.com/q"}
    assert by_url["https://site.com/p"]["first_doc_id"] == 3
    assert by_url["https://site.com/p"]["n_dups"] == 3
    assert by_url["https://other.com/q"]["n_dups"] == 1


def test_extract_hosts_rules():
    def _host(u):
        return extract_hosts(pl.Series([u])).to_list()[0]

    assert _host("https://WWW.Site.COM:443/a?q#f") == "site.com"
    assert _host("http://user:pw@Example.com:8080/x") == "example.com"
    assert _host("https://host.com") == "host.com"
    # schemeless → no authority → empty host
    assert _host("relative/path") == ""
    assert _host("") == ""
    # www only as a leading label
    assert _host("https://notwww.example.com/a") == "notwww.example.com"


def test_domain_cap_keeps_k_lowest_ids_per_host():
    t = pa.table(
        {
            # host a: ids 5,1,9,3 → keep 1,3 at k=2; host b: ids 2,8 → both
            "url": [
                "https://a.com/1", "https://WWW.A.com/2",
                "https://a.com:443/3", "https://a.com/4",
                "https://b.com/1", "https://b.com/2",
            ],
            "doc_id": [5, 1, 9, 3, 2, 8],
        }
    )
    out = domain_cap(ray.data.from_arrow(t), k=2, num_partitions=4).take_all()
    kept = sorted((r["host"], r["doc_id"], r["host_rank"]) for r in out)
    assert kept == [("a.com", 1, 1), ("a.com", 3, 2),
                    ("b.com", 2, 1), ("b.com", 8, 2)]


def test_domain_cap_partition_invariant():
    t = pa.table(
        {
            "url": [f"https://h{i % 7}.com/p{i}" for i in range(300)],
            "doc_id": list(range(300)),
        }
    )
    a = domain_cap(ray.data.from_arrow(t), k=5, num_partitions=2).take_all()
    b = domain_cap(
        ray.data.from_arrow(t).repartition(11), k=5, num_partitions=16
    ).take_all()
    key = lambda r: (r["host"], r["host_rank"])
    assert sorted(a, key=key) == sorted(b, key=key)
    assert len(a) == 7 * 5


def test_url_dedup_partition_invariant():
    t = pa.table(
        {
            "url": [f"https://www.h{i % 5}.com/p{i % 11}/" for i in range(200)],
            "doc_id": list(range(200)),
        }
    )
    a = url_dedup(ray.data.from_arrow(t), num_partitions=2).take_all()
    b = url_dedup(ray.data.from_arrow(t).repartition(7), num_partitions=16).take_all()
    key = lambda r: r["canonical_url"]
    assert sorted(a, key=key) == sorted(b, key=key)


# ---------------------------------------------------------------------------
# url_pair_mine (CCAligned/STRAND URL-pattern document alignment)


def _mine(rows, **kw):
    import pyarrow as pa
    import ray.data

    from docling_translate_ray.functions.urltools import url_pair_mine

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string()),
    })
    out = url_pair_mine(ray.data.from_arrow(tbl), **kw).to_pandas()
    return sorted(map(tuple, out.values.tolist()))


def test_url_pair_mine_basic_pairing():
    rows = [
        (1, "https://a.example/en/page"),
        (2, "https://a.example/ko/page"),
        (3, "https://a.example/de/page"),
        (4, "https://b.example/ko/page"),   # no en rep -> no pair
        (5, "https://a.example/plain"),     # no lang segment -> ignored
    ]
    got = _mine(rows)
    assert got == [
        ("https://a.example/*/page", 1, 2, "ko"),
        ("https://a.example/*/page", 1, 3, "de"),
    ]


def test_url_pair_mine_min_id_representative():
    rows = [
        (9, "https://a.example/en/p"),
        (4, "https://a.example/en/p"),   # duplicate en -> rep = 4
        (7, "https://a.example/fr/p"),
        (6, "https://a.example/fr/p"),   # duplicate fr -> rep = 6
    ]
    assert _mine(rows) == [("https://a.example/*/p", 4, 6, "fr")]


def test_url_pair_mine_spec_edges_duckdb_lockstep():
    """Edge urls (consecutive lang segments, lang at end-of-path,
    zh-TW longest-first) — polars and DuckDB must star the SAME key."""
    import duckdb
    import polars as pl

    from docling_translate_ray.functions.urltools import URL_LANG_SEG_RE

    urls = [
        "https://a.example/en/ko/page",   # only first of the run starred
        "https://a.example/docs/en",      # segment at end
        "https://a.example/zh-TW/p",      # longest-first alternation
        "https://a.example/entry/p",      # 'en' not a whole segment
        "https://a.example/zh/p",
    ]
    got = pl.Series(urls).str.replace_all(
        URL_LANG_SEG_RE, "/*${2}").to_list()
    con = duckdb.connect()
    want = [con.execute(
        "SELECT regexp_replace(?, ?, '/*\\2', 'g')",
        [u, URL_LANG_SEG_RE]).fetchone()[0] for u in urls]
    assert got == want
    assert got[0] == "https://a.example/*/ko/page"
    assert got[1] == "https://a.example/docs/*"
    assert got[2] == "https://a.example/*/p"
    assert got[3] == "https://a.example/entry/p"


def test_url_pair_mine_partition_invariance():
    rows = [(i, f"https://s{i % 5}.example/"
                + ("en" if i % 3 == 0 else "fr") + f"/a{i % 7}")
            for i in range(60)]
    a = _mine(rows, num_partitions=1)
    b = _mine(rows, num_partitions=8)
    assert a == b and len(a) > 0
