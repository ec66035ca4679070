"""Registry plumbing + the engine-portability helpers that make Spark
results hash-identical to the DuckDB oracle.

Portability rules (derived empirically, see tests/test_oracle_parity.py):
  - vector math: double-cast elementwise, sequential fold → bit-identical
    to ``list_reduce(list_transform(list_zip(...)))``.
  - big-group SUM/AVG over doubles: order-dependent in IEEE — cast each
    addend to DECIMAL first (exact, associative), cast the exact sum back
    to DOUBLE. Per-row double expressions are bit-identical inputs, the
    double→decimal rounding is identical, so the group sums match bitwise.
  - every top-k / LIMIT has a full deterministic ORDER BY tie-break.
  - column names are aliased identically on both sides (the driver sorts
    columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle twin)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---- Spark-side exact-aggregation helpers ---------------------------------

def dsum(c: Column, scale: int = 2) -> Column:
    """Order-independent exact SUM: decimal-cast addends, double result."""
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def davg(c: Column, scale: int = 2) -> Column:
    """Order-independent AVG as exact-sum / count (double division)."""
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double") / F.count(F.lit(1))


# ---- DuckDB-side SQL fragment twins ---------------------------------------

def dd_sum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"


def dd_avg(expr: str, scale: int = 2) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE) / COUNT(*))"


def dd_sq_euc(a: str, b: str) -> str:
    """DuckDB twin of functions.vector.sq_euc_dist (bit-identical)."""
    d = "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> {d} * {d}), (x, y) -> x + y)"
    )


def dd_dot(a: str, b: str) -> str:
    """DuckDB twin of functions.vector.dot (bit-identical)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def dd_cosine(a: str, b: str) -> str:
    """DuckDB twin of functions.vector.cosine_sim (bit-identical)."""
    return f"({dd_dot(a, b)} / (sqrt({dd_dot(a, a)}) * sqrt({dd_dot(b, b)})))"
