"""Bucketing: pre-shuffled storage → shuffle-free co-located joins
(SURVEY.md §4 'co-locate joins via bucketing'). The plan assertion is
the point: both sides bucketed on the join key by the same bucket
count ⇒ SortMergeJoin with NO Exchange on either side."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    tag = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{tag}", f"b_cust_{tag}"

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        cust.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(t_cust)
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.table(t_orders)
            b = spark.table(t_cust)
            joined = a.join(b, a.o_custkey == b.c_custkey).select(
                "o_orderkey", "c_name", "o_totalprice"
            )
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
            # and the result is right
            assert joined.count() == orders.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
