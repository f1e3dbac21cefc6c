"""Redirect-chain resolution (functions/crawl.resolve_redirects):
chain walking, cycle/over-cap flagging, broadcast↔exchange parity,
and the hop-cap alignment with the recursive-CTE oracle.

Hop-cap alignment note (referenced from the module): the exchange
path blocks a composition whose summed hops would exceed ``max_hops``.
That never strands a resolvable chain — a probe's ``hops`` and a
build row's ``hops`` are both EXACT distances along the (functional)
chain, so their sum is the exact total distance; it exceeds the cap
iff the true distance does, which is exactly the case the recursive
CTE (``WHERE hops < max_hops``) also fails to resolve."""

import pyarrow as pa
import ray.data


def _edges(pairs):
    return ray.data.from_arrow(pa.table({
        "src_url": pa.array([a for a, _ in pairs], pa.string()),
        "dst_url": pa.array([b for _, b in pairs], pa.string()),
    }))


def _res(ds):
    rows = ds.take_all()
    return {r["src_url"]: (r["final_url"], r["hops"], r["is_cycle"])
            for r in rows}


CHAIN = [("a", "b"), ("b", "c"), ("c", "d")]          # d is terminal
CYCLE = [("x", "y"), ("y", "z"), ("z", "x")]


def test_broadcast_chain_and_cycle(ray_session):
    got = _res(resolve(CHAIN + CYCLE, strategy="broadcast"))
    assert got["a"] == ("d", 3, False)
    assert got["b"] == ("d", 2, False)
    assert got["c"] == ("d", 1, False)
    for s in ("x", "y", "z"):
        assert got[s] == (None, None, True)


def resolve(pairs, **kw):
    from docling_translate_ray.functions.crawl import resolve_redirects

    return resolve_redirects(_edges(pairs), **kw)


def test_exchange_matches_broadcast(ray_session):
    # a 17-deep chain (over a cap of 16), a 16-deep chain (exactly at
    # the cap), a short chain and a 2-cycle — the two physical paths
    # must agree row-for-row
    pairs = [(f"n{i}", f"n{i+1}") for i in range(17)]          # n0..n17
    pairs += [(f"m{i}", f"m{i+1}") for i in range(16)]         # m0..m16
    pairs += CHAIN + [("p", "q"), ("q", "p")]
    b = _res(resolve(pairs, strategy="broadcast", max_hops=16))
    e = _res(resolve(pairs, strategy="exchange", max_hops=16,
                     num_partitions=4))
    assert b == e
    assert b["n0"] == (None, None, True)      # 17 hops > cap
    assert b["m0"] == ("m16", 16, False)      # exactly at cap
    assert b["n1"] == ("n17", 16, False)
    assert b["p"] == (None, None, True) and b["q"] == (None, None, True)


def test_matches_duckdb_recursive_cte(ray_session):
    import duckdb

    pairs = [(f"n{i}", f"n{i+1}") for i in range(20)] + CYCLE + CHAIN
    got = _res(resolve(pairs, strategy="exchange", max_hops=16,
                       num_partitions=4))
    con = duckdb.connect()
    con.register("edges", pa.table({
        "src_url": pa.array([a for a, _ in pairs], pa.string()),
        "dst_url": pa.array([b for _, b in pairs], pa.string())}))
    want = con.execute("""
        WITH RECURSIVE walk(src, cur, hops) AS (
          SELECT src_url, dst_url, 1 FROM edges
          UNION ALL
          SELECT w.src, e.dst_url, w.hops + 1
          FROM walk w JOIN edges e ON e.src_url = w.cur
          WHERE w.hops < 16),
        last AS (
          SELECT src, cur, hops,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY hops DESC) AS rn
          FROM walk),
        t AS (SELECT DISTINCT src_url FROM edges)
        SELECT l.src AS src_url,
               CASE WHEN t.src_url IS NULL THEN l.cur END AS final_url,
               CASE WHEN t.src_url IS NULL THEN l.hops END AS hops,
               t.src_url IS NOT NULL AS is_cycle
        FROM last l LEFT JOIN t ON l.cur = t.src_url
        WHERE l.rn = 1
    """).fetch_arrow_table().to_pylist()
    want = {r["src_url"]: (r["final_url"], r["hops"], r["is_cycle"])
            for r in want}
    assert got == want


def test_empty_and_single_edge(ray_session):
    assert _res(resolve([])) == {}
    assert _res(resolve([("a", "b")])) == {"a": ("b", 1, False)}
