"""Replicates the driver's t2 correctness gate: every registered query
with an oracle runs on Spark AND DuckDB at the same sf; row count, sorted
column names, and exact values must match (the driver hashes values, so
the assertion here is bitwise-exact — no tolerance)."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.plans import ORACLES, QUERIES  # noqa: E402

from conftest import SF_ORACLE  # noqa: E402


def _norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    # Decimal, str, datetime, bytes → canonical string
    return ("s", str(v))


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


ORACLE_KEYS = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, duck_oracle, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck_oracle.sql(ORACLES[name])
    duck_cols = sorted(rel.columns)
    duck_rows = rel.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    a = _normalize(spark_rows, sdf.columns)
    b = _normalize(duck_rows, rel.columns)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without oracles must still execute and return a stable schema."""
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0
