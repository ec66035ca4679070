"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (O13 label-lookup kNN —
the reference's "visualize" path, ``/root/reference/src/main.rs:81-93``)
at sf0.001. ``queries()``/``oracle_sql()`` expose the full registry from
``rust_vector_search_spark.plans`` — one entry per implemented operator
of SURVEY.md §2, each SQL-expressible one paired with a DuckDB twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the sibling package importable regardless of the driver's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_vector_search_spark.plans import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: kNN with document-label lookup on sf0.001."""
    return QUERIES["knn_with_doc_labels"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
