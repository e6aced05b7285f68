"""Quality binning (operators/curriculum.py): bin balance, boundary
semantics, shuffle-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.curriculum import (
    quantile_boundaries,
    with_quality_bin,
)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [(i, float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, score double").cache()


def test_bins_are_balanced(spark, scored):
    out = with_quality_bin(scored, "score", 10)
    counts = {r["quality_bin"]: r["n"] for r in out.groupBy("quality_bin").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(range(10))
    assert all(abs(c - 100) <= 1 for c in counts.values()), counts


def test_monotone_in_score(spark, scored):
    rows = with_quality_bin(scored, "score", 4).orderBy("score").collect()
    bins = [r["quality_bin"] for r in rows]
    assert bins == sorted(bins)
    assert bins[0] == 0 and bins[-1] == 3


def test_precomputed_boundaries_skip_reduce_and_match(spark, scored):
    b = quantile_boundaries(scored, "score", 4)
    assert len(b) == 3
    a = {r["id"]: r["quality_bin"] for r in with_quality_bin(scored, "score", 4).collect()}
    c = {
        r["id"]: r["quality_bin"]
        for r in with_quality_bin(scored, "score", 4, boundaries=b).collect()
    }
    assert a == c


def test_binning_is_shuffle_free_with_boundaries(spark, scored):
    b = quantile_boundaries(scored, "score", 10)
    plan = (
        with_quality_bin(scored, "score", 10, boundaries=b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Window" not in plan
