"""Bucketed co-located join: zero Exchange on either side."""

import contextlib
import io

from pyspark.sql import functions as F

from json_schema_lean_spark.sources.bucketing import colocated_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
                  .withColumnRenamed("l_orderkey", "o_orderkey")
        write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_by="o_orderkey")
        write_bucketed(li, "lineitem_b", "o_orderkey", 8, sort_by="o_orderkey")

        joined = colocated_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("simple")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # and the result is right
        n = joined.count()
        expected = (spark.table("orders_b")
                    .join(spark.table("lineitem_b").hint("shuffle_hash"),
                          "o_orderkey").count())
        assert n == expected > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
