"""Source/sink round-trips beyond parquet (SURVEY §2.2 scans/sinks):
csv and json keep the relational surface complete."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.sources import load_table  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


def test_csv_roundtrip(spark, tmp_path):
    cust = load_table(spark, SF_SMOKE, "customer")
    path = str(tmp_path / "cust_csv")
    cust.write.option("header", True).csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    assert back.count() == cust.count()
    assert set(back.columns) == set(cust.columns)


def test_json_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_json")
    orders.write.json(path)
    back = spark.read.json(path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


def test_parquet_sink_with_partitioning(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "li_part")
    li.write.partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    # partition pruning surfaces in the plan of a filtered read
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter("l_returnflag = 'R'").explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
