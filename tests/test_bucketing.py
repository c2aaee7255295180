"""Bucketed co-located join: pre-shuffled storage makes the fact⨝dim
join shuffle-free — the 100 TB pattern for repeated joins on one key."""

from __future__ import annotations

import pytest

from realtimevotingdataengineer_spark.plans import formatted_plan, shuffle_count
from realtimevotingdataengineer_spark.sources.tables import Tables


@pytest.fixture()
def warehouse_spark(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_bucketed_join_is_shuffle_free(warehouse_spark, sf_dir):
    spark = warehouse_spark
    t = Tables(spark, sf_dir)
    (
        t.orders.write.mode("overwrite")
        .bucketBy(4, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_bkt")
    )
    (
        t.customer.write.mode("overwrite")
        .bucketBy(4, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_bkt")
    )
    joined = spark.table("orders_bkt").join(
        spark.table("customer_bkt"),
        spark.table("orders_bkt").o_custkey == spark.table("customer_bkt").c_custkey,
    )
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    # co-located buckets: neither side shuffles
    assert shuffle_count(joined) == 0, plan
    assert joined.count() == t.orders.count()  # every order has a customer
