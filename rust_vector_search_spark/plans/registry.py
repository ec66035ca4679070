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


def stop_idle_state_stores(spark: SparkSession) -> None:
    """Unload loaded state-store providers, but ONLY when no streaming
    query is active: earlier availableNow runs leave their providers
    cached in executor memory (maintenance unloads them lazily) and
    registry queries never resume an earlier run's state — while
    unloading a LIVE query's providers would force checkpoint reloads
    mid-run (ADVICE r6). No-op on Connect sessions (no JVM handle).
    The single shared implementation for release_driver_blocks and the
    streaming-query epilogue (they must not drift)."""
    try:
        if not spark.streams.active:
            jvm = spark.sparkContext._jvm
            jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception:
        pass


def release_driver_blocks(spark: SparkSession, unpersist_all: bool = False) -> None:
    """Defensive driver-side GC for block-heavy queries.

    ``unpersist_all=True`` additionally force-unpersists EVERY
    registered RDD (checkpoint/persist blocks) instead of waiting for
    the GC → ContextCleaner chain — on an 8 GB driver heap the <50%
    fast path below never trips, so blocks from earlier queries pile
    into the unified memory pool and later queries measure memory
    pressure instead of their plan (r16 probe, 8-row bench-order
    subsequence at sf0.1: every row improved, 36.1 s → 26.6 s total;
    the r15 driver bench's 1.4-10× tail inflation is this). Only safe
    when the caller OWNS the session and every previously returned
    DataFrame is fully materialized — a checkpointed frame whose
    blocks are dropped cannot recompute (lineage is truncated). bench.py
    qualifies (each row is noop-saved before the next starts); the
    correctness window runner does NOT (it may materialize a prior
    row's frame late), hence the default stays False.

    The external driver executes all 50 window queries in ONE session
    with a DEFAULT driver heap. localCheckpoint blocks from earlier
    queries are only reclaimed after a DRIVER gc (Spark's
    ContextCleaner keys off JVM reference queues), so a block-heavy
    query late in the window can OOM on garbage it didn't create
    (observed: streaming_incremental_index_parity failing at window
    slot 50 on a 1 GB heap while passing in isolation). Block-heavy
    queries call this on entry; it is a no-op cost (~100 ms) in a
    healthy session and works on Connect sessions too (python gc only).

    One System.gc() is NOT enough: block/broadcast unregistration flows
    python gc → py4j detach → JVM weak-ref processing → the ASYNC
    ContextCleaner thread, so the heap only actually drops some time
    after the gc call (measured: 929 MB at the failure point, 194 MB
    once the cleaner caught up). This therefore loops gc rounds until
    used heap falls under half of max (or a 3 s budget expires).
    """
    import gc
    import time

    if unpersist_all:
        try:
            jm = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in list(jm.values()):
                # BLOCKING on purpose: a non-blocking unpersist hands the
                # block removal to async cleaner threads that then compete
                # with the NEXT timed query — the cost belongs here, in
                # the untimed inter-row region
                rdd.unpersist(True)
        except Exception:
            pass  # Spark Connect: no JVM handle
    gc.collect()
    try:
        jvm = spark.sparkContext._jvm
        rt = jvm.Runtime.getRuntime()
        # healthy-session fast path (ADVICE r6): when used heap is
        # already under half of max, skip the drain entirely — callers
        # treat this as a read-only no-op and the gc loop below is pure
        # latency in a session with nothing to reclaim
        if (rt.totalMemory() - rt.freeMemory()) < rt.maxMemory() * 0.5:
            return
        stop_idle_state_stores(spark)
        deadline = time.time() + 3.0
        while True:
            jvm.System.gc()
            if (rt.totalMemory() - rt.freeMemory()) < rt.maxMemory() * 0.5:
                break
            if time.time() >= deadline:
                break
            time.sleep(0.3)
            gc.collect()
    except Exception:
        pass  # Spark Connect: no JVM handle
