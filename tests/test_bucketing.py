"""Bucketed tables: pre-shuffled storage for co-located joins — the
100 TB answer to repeated fact-to-fact joins (shuffle once at write
time, never again at read time). Asserts the physical property: a join
of two tables bucketed on the join key runs WITHOUT a shuffle exchange."""

from __future__ import annotations

import contextlib
import io
import os
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.sources import load_table  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    # external tables with explicit paths (warehouse.dir is a static conf)
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = lineitem_b.join(
            orders_b, lineitem_b.l_orderkey == orders_b.o_orderkey
        ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        join_part = plan.split("HashAggregate")[0]
        # co-located: the join subtree reads bucketed files directly —
        # no Exchange below the join
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_part, f"unexpected shuffle:\n{join_part}"
        # and the result is right
        got = {r.o_orderstatus: r.n for r in j.collect()}
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders")
        exp = {
            r.o_orderstatus: r.n
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
