"""Skew helpers: salted aggregation equivalence, salt determinism,
broadcast-join shuffle avoidance."""

from __future__ import annotations

from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.plans.skew import (
    salted_agg,
    salted_broadcast_join,
    with_salt,
)


def _skewed(spark):
    # one hot key (90%) + long tail — the shape AQE-less aggs choke on
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    got = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"total": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")},
            n_salts=8,
            salt_src=["v"],
        ).collect()
    }
    want = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1] and got[k][2] == want[k][2]
        assert abs(got[k][0] - want[k][0]) < 1e-6


def test_salt_deterministic_and_bounded(spark):
    df = _skewed(spark)
    a = with_salt(df, 8, cols=["k", "v"]).select("k", "v", "_salt")
    b = with_salt(df, 8, cols=["k", "v"]).select("k", "v", "_salt")
    assert a.exceptAll(b).count() == 0
    mn, mx = a.agg(F.min("_salt"), F.max("_salt")).head()
    assert mn >= 0 and mx < 8


def test_salted_broadcast_join_no_big_side_exchange(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("k3", 2)], "k string, tag int"
    )
    joined = salted_broadcast_join(big, small, ["k"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # big side never shuffles
    n_hot = joined.filter("k = 'hot'").count()
    assert n_hot == big.filter("k = 'hot'").count()
