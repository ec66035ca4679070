#!/usr/bin/env python3
"""Local replica of the driver's correctness gate over ALL registered
queries (the driver caps its run at 50; this artifact covers the rest —
and everything — with the same comparison: row count, sorted column
names, and a value hash over sorted stringified rows).

Usage:  python tools/run_correctness.py [sf_dir] [out_json]
Writes CORRECTNESS_LOCAL.json at the repo root by default.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _canon_hash(rows, cols) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return len(canon), h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "CORRECTNESS_LOCAL.json"
    )

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

    results: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in queries.items():
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "secs": None,
        }
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                rel = con.sql(oracles[name])
                d_cols = list(rel.columns)
                d_rows = rel.fetchall()
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                _, sh = _canon_hash(s_rows, s_cols)
                _, dh = _canon_hash(d_rows, d_cols)
                rec["hash_match"] = sh == dh
            else:
                rec["err"] = "no_oracle"
        except Exception as ex:  # noqa: BLE001 — record and continue
            rec["err"] = f"{type(ex).__name__}: {ex}"
        rec["secs"] = round(time.time() - t0, 2)
        results[name] = rec
        status = (
            "PASS"
            if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(f"{name}: {status} ({rec['secs']}s)", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_ro = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_pass - n_ro
    print(
        f"\n{len(results)} queries: {n_pass} hash-pass, {n_ro} rows-only, "
        f"{n_fail} FAIL in {time.time() - t_start:.0f}s -> {out_path}"
    )
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
