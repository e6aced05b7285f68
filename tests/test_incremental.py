"""Mergeable rollups (operators/incremental.py): the merge identity,
order independence, and exactness of the decimal partials."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.incremental import (
    merge_rollups,
    mergeable_rollup,
    with_derived_avg,
)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [(i % 7, i % 3, float(i) * 0.1 + 0.01) for i in range(1000)]
    return spark.createDataFrame(rows, "k long, g long, v double").cache()


def _as_map(df):
    return {
        (r["k"], r["g"]): (r["n"], r["sum_v"]) for r in df.collect()
    }


def test_merge_identity(spark, facts):
    """rollup(a ∪ b ∪ c) == merge(rollup(a), rollup(b), rollup(c))"""
    parts = [
        facts.where(F.col("v") < 30),
        facts.where((F.col("v") >= 30) & (F.col("v") < 70)),
        facts.where(F.col("v") >= 70),
    ]
    direct = mergeable_rollup(facts, ["k", "g"], ["v"])
    merged = merge_rollups(
        [mergeable_rollup(p, ["k", "g"], ["v"]) for p in parts], ["k", "g"]
    )
    assert _as_map(direct) == _as_map(merged)


def test_merge_order_independent(spark, facts):
    a = mergeable_rollup(facts.where(F.col("k") < 3), ["g"], ["v"])
    b = mergeable_rollup(facts.where(F.col("k") >= 3), ["g"], ["v"])
    ab = merge_rollups([a, b], ["g"]).collect()
    ba = merge_rollups([b, a], ["g"]).collect()
    assert sorted(map(tuple, ab)) == sorted(map(tuple, ba))


def test_empty_delta_is_identity(spark, facts):
    base = mergeable_rollup(facts, ["g"], ["v"])
    empty = mergeable_rollup(facts.where(F.lit(False)), ["g"], ["v"])
    assert _as_map_g(merge_rollups([base, empty], ["g"])) == _as_map_g(base)


def _as_map_g(df):
    return {r["g"]: (r["n"], r["sum_v"]) for r in df.collect()}


def test_derived_avg(spark, facts):
    r = with_derived_avg(mergeable_rollup(facts, ["g"], ["v"]), "v").collect()
    for row in r:
        assert row["avg_v"] == pytest.approx(
            float(row["sum_v"]) / row["n"], abs=1e-6
        )
