"""Fixture-table sources (TESTDATA.md / FIXTURES.md).

The reference's only source is a fastText ``.vec`` text scan
(``/root/reference/src/main.rs:11-40``); the engine generalizes to
Parquet scans of the driver-generated star schema + vector tables.
Columnar Parquet + Catalyst gives predicate pushdown / column pruning
for free — critical at 100 TB: never read 64-float arrays when only
ids are needed (SURVEY §4).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# fixture parquets are single-row-group files — a scan can't split below
# row-group granularity, so without help every downstream computation runs
# in ONE task. Fact tables get spread across the cluster on load; dimension
# tables stay single-partition (they broadcast anyway). A real 100 TB
# deployment has many files/row groups and skips this entirely.
_FACT_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table; plain ``spark.read.parquet`` so filters and
    projections placed on the result push down into the scan."""
    if name not in TABLES:
        raise ValueError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Fixture timestamp columns have shipped in two physical forms across
    # driver regenerations: parquet TIMESTAMP(NANOS) (read as raw int64
    # nanos under spark.sql.legacy.parquet.nanosAsLong) and timestamp[us]
    # without timezone (read as TIMESTAMP_NTZ, which unix_micros /
    # withWatermark reject). Normalize both to TIMESTAMP here so every
    # downstream consumer sees one dtype. The session timezone is pinned
    # UTC (session.ensure_deterministic_session), so the NTZ cast is exact
    # and oracle-consistent.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — float division of int64 nanos (> 2^53) would
        # round the low microsecond digit
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    if name in _FACT_TABLES:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (mirrors the DuckDB
    oracle harness, which pre-registers the same names)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
