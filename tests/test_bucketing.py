"""Bucketed tables: the co-located join writes no exchange."""

from __future__ import annotations

import pytest

from news_lakehouse_spark.plans.audit import audit_plan, formatted_plan
from news_lakehouse_spark.sources.readers import read_table
from news_lakehouse_spark.sources.writers import write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8, sort_by=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        n_buckets=8,
        sort_by=["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    bo, bl = bucketed_pair
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(bl).join(spark.table(bo), "o_orderkey")
        joined.collect()
        a = audit_plan(formatted_plan(joined))
        assert a["exchanges"] == 0  # co-located: zero shuffle on either side
        assert a["smj"] == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_plain(spark, sf_dir, bucketed_pair):
    bo, bl = bucketed_pair
    bucketed_n = spark.table(bl).join(spark.table(bo), "o_orderkey").count()
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    plain_n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert bucketed_n == plain_n
