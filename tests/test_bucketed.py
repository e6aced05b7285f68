"""Bucketed-table co-located join: plan-shape proof that bucketing removes
the join shuffle (plans/bucketing.py) — the at-rest co-location technique
for repeated fact-table joins at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.plans.bucketing import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(
        cust, "cust_b", ["c_custkey"], 4, path=str(d / "cust"), sort_cols=["c_custkey"]
    )
    write_bucketed(
        orders,
        "ord_b",
        ["o_custkey"],
        4,
        path=str(d / "ord"),
        sort_cols=["o_custkey"],
    )
    yield "cust_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS cust_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    """Both sides bucketed on the join key into the same bucket count ⇒
    SortMergeJoin with NO shuffle on either side (the shuffle was paid
    once at write time)."""
    cust_t, ord_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(cust_t)
            .join(spark.table(ord_t), F.col("c_custkey") == F.col("o_custkey"))
            .groupBy("c_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # the groupBy key equals the bucket key, so even the final aggregation
    # reuses the bucketed distribution: the whole plan is shuffle-free
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    cust_t, ord_t = bucketed_tables
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    want = sorted(
        (r["c_custkey"], r["n"])
        for r in cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = sorted(
        (r["c_custkey"], r["n"])
        for r in spark.table(cust_t)
        .join(spark.table(ord_t), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want
