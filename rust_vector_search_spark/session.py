"""SparkSession factory with scale-conscious defaults.

The reference is single-machine, all-in-RAM (``/root/reference/src/lib.rs:15-19``);
this engine targets a multi-executor cluster, so the session defaults lean on
AQE (runtime coalescing + skew-join splitting — random hyperplanes through
duplicate-heavy regions create hot leaves, SURVEY §7.3.4), Arrow for the few
pandas-exchange paths, and a shuffle-partition count sized for local testing
that a real deployment would raise to ~2-3× total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "rust-vector-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned SparkSession.

    Settings chosen for scale-out behavior, not just local speed:
      - AQE on: runtime partition coalescing, skew-join handling.
      - Arrow on: vectorized exchange for the mapInPandas multimodal path.
      - UTC session timezone: deterministic timestamp semantics vs the
        DuckDB oracle regardless of cluster-node locale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # fixture events.parquet stores TIMESTAMP(NANOS); read as raw int64
        # nanos (converted to micros in sources.fixtures.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # node-table collects for the broadcast-map routing fast path can
        # exceed the 1g default on large leaf-5 indexes
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "2g"),
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_deterministic_session(spark: SparkSession) -> SparkSession:
    """Pin the runtime-settable SQL confs the oracle comparison relies on.

    The driver hands us ITS session; timestamp-bearing queries must not
    depend on the ambient JVM timezone, and ANSI off keeps permissive
    casts aligned with DuckDB's behavior on the fixture data.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; get_spark sets it at build time
    return spark
