"""Local simulation of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf_dir, converts
the result to pandas, and — where an ``oracle_sql()`` entry exists — runs
the SQL in DuckDB over the same parquet tables and compares row count,
column-name set, and an order-insensitive value hash (columns sorted by
name, rows sorted by all columns, values stringified).

Usage: python tools/check_contract.py [sf_dir]
Owns its Ray session (the real driver inits Ray itself).
"""

from __future__ import annotations

import hashlib
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    df = df[sorted(df.columns)].copy()
    rows = df.astype(str).values.tolist()
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR",
                 runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                      "worker_process_setup_hook": "docling_translate_ray.util.warm_imports"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # 2 blocks/CPU read floor (vs Ray's 200): toy-scale inputs otherwise
    # split into few-hundred-row blocks whose task overhead dominates
    DataContext.get_current().read_op_min_num_blocks = 16

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = dict(entrymod.queries())
    n_primary = len(qs)
    # legacy entries: merged out of the 50-entry driver window (round 3)
    # but still contract-checked here so the retired paths never rot
    qs.update(entrymod.queries_legacy())
    print(f"checking {n_primary} driver entries + "
          f"{len(qs) - n_primary} legacy entries")
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only {len(got)} rows  [{dt:.1f}s]")
            continue
        want = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(problems)}  [{dt:.1f}s]")
            if "value hash mismatch" in problems:
                g = got[sorted(got.columns)].astype(str)
                w = want[sorted(want.columns)].astype(str)
                gs = set(map(tuple, g.values.tolist()))
                ws = set(map(tuple, w.values.tolist()))
                print("  only-in-got:", list(gs - ws)[:3])
                print("  only-in-want:", list(ws - gs)[:3])
        else:
            print(f"ok   {name}: {len(got)} rows match oracle  [{dt:.1f}s]")

    # entry smoke
    if only is None:
        t0 = time.perf_counter()
        res = to_pandas(entrymod.entry())
        print(f"ok   entry(): {len(res)} rows, cols={list(res.columns)}  "
              f"[{time.perf_counter() - t0:.1f}s]")
    ray.shutdown()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
