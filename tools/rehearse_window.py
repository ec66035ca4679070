#!/usr/bin/env python3
"""Driver-window rehearsal: run the FIRST 50 registry queries in ONE
VANILLA session with a 1 GB driver heap at sf0.01 — the exact regime the
external driver uses for its correctness gate. Isolation tests miss
cumulative-state OOMs (observed r5/r6: rows passing solo but failing at
window slot 50 on a default heap); run this before every round end.

Usage: python tools/rehearse_window.py [sf_dir] [n_queries]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from run_correctness import TABLES, _canon_hash  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "1g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_ro = n_fail = 0
    t_all = time.time()
    for name in list(queries)[:cap]:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name in oracles:
                rel = con.sql(oracles[name])
                d_cols, d_rows = list(rel.columns), rel.fetchall()
                ok = (
                    len(s_rows) == len(d_rows)
                    and sorted(s_cols) == sorted(d_cols)
                    and _canon_hash(s_rows, s_cols)[1]
                    == _canon_hash(d_rows, d_cols)[1]
                )
                n_pass += ok
                n_fail += not ok
                print(
                    f"{name}: {'PASS' if ok else 'FAIL'} "
                    f"({time.time() - t0:.1f}s)",
                    flush=True,
                )
            else:
                n_ro += 1
                print(
                    f"{name}: rows-only {len(s_rows)} "
                    f"({time.time() - t0:.1f}s)",
                    flush=True,
                )
        except Exception as ex:  # noqa: BLE001 — record and continue
            n_fail += 1
            print(
                f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
    print(
        f"\nWINDOW: {n_pass} pass, {n_ro} rows-only, {n_fail} fail "
        f"in {time.time() - t_all:.0f}s"
    )
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
