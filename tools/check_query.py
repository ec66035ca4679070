#!/usr/bin/env python3
"""Spot-check named registry queries against their DuckDB oracles with
the exact comparison tools/run_correctness.py uses (row count, sorted
column names, value hash) — the fast dev loop for a new operator.

Usage:  python tools/check_query.py name [name ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from run_correctness import TABLES, _canon_hash  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        print(__doc__)
        sys.exit(2)

    import duckdb
    import __spark_entry__ as entry
    from rust_vector_search_spark.session import get_spark

    spark = get_spark()
    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed = False
    for name in args:
        if name not in queries:
            print(f"{name}: NOT REGISTERED")
            failed = True
            continue
        t0 = time.time()
        sdf = queries[name](spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only — {len(s_rows)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        rel = con.sql(oracles[name])
        d_cols, d_rows = list(rel.columns), rel.fetchall()
        _, sh = _canon_hash(s_rows, s_cols)
        _, dh = _canon_hash(d_rows, d_cols)
        ok = (
            len(s_rows) == len(d_rows)
            and sorted(s_cols) == sorted(d_cols)
            and sh == dh
        )
        print(
            f"{name}: {'PASS' if ok else 'FAIL'} — spark {len(s_rows)} rows, "
            f"oracle {len(d_rows)} rows, schema "
            f"{'ok' if sorted(s_cols) == sorted(d_cols) else f'{sorted(s_cols)} vs {sorted(d_cols)}'}, "
            f"hash {'ok' if sh == dh else 'MISMATCH'} ({time.time() - t0:.1f}s)"
        )
        if not ok:
            failed = True
            if sorted(s_cols) == sorted(d_cols) and len(s_rows) == len(d_rows):
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sc = sorted(tuple(str(r[i]) for i in order) for r in s_rows)
                dc = sorted(tuple(str(r[i]) for i in dorder) for r in d_rows)
                shown = 0
                for a, b in zip(sc, dc):
                    if a != b and shown < 5:
                        print(f"  spark : {a}\n  oracle: {b}")
                        shown += 1
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
