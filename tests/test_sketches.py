"""Sketches (operators/sketches.py): HLL error bound, the exact merge
identity, and quantile rank-error bounds — the correctness gates for
operators that are legitimately rows-only at the driver oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.sketches import (
    approx_quantiles,
    distinct_sketches,
    estimate_distinct,
    merge_distinct_sketches,
)


@pytest.fixture(scope="module")
def facts(spark):
    # per group g: exactly 1000*(g+1) distinct users, values 0..N uniform
    rows = [
        (g, (i * 7 + g * 13) % (1000 * (g + 1)), float(i % 5000))
        for g in range(3)
        for i in range(20000)
    ]
    return spark.createDataFrame(rows, "g long, user_id long, v double").cache()


def test_hll_estimate_within_error(spark, facts):
    est = {
        r["g"]: r["approx_distinct"]
        for r in estimate_distinct(distinct_sketches(facts, ["g"], "user_id")).collect()
    }
    exact = {
        r["g"]: r["n"]
        for r in facts.groupBy("g")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for g in exact:
        # lgk=12 → rse ≈ 1.6%; allow 5 sigma
        assert abs(est[g] - exact[g]) / exact[g] < 0.08, (g, est[g], exact[g])


def test_hll_merge_identity_is_exact(spark, facts):
    """union(sketch(A), sketch(B)) must estimate IDENTICALLY to
    sketch(A ∪ B) — register-level equality, no drift."""
    a = facts.where(F.col("user_id") % 2 == 0)
    b = facts.where(F.col("user_id") % 2 == 1)
    merged = estimate_distinct(
        merge_distinct_sketches(
            [
                distinct_sketches(a, ["g"], "user_id"),
                distinct_sketches(b, ["g"], "user_id"),
            ],
            ["g"],
        )
    )
    direct = estimate_distinct(distinct_sketches(facts, ["g"], "user_id"))
    m = {r["g"]: r["approx_distinct"] for r in merged.collect()}
    d = {r["g"]: r["approx_distinct"] for r in direct.collect()}
    assert m == d


def test_approx_quantiles_rank_error(spark, facts):
    got = approx_quantiles(facts, ["g"], "v", [0.5, 0.9], accuracy=1000).collect()
    exact = {
        r["g"]: r["q"]
        for r in facts.groupBy("g")
        .agg(F.percentile("v", F.array(F.lit(0.5), F.lit(0.9))).alias("q"))
        .collect()
    }
    for r in got:
        n = 20000
        # rank error ≤ n/accuracy ⇒ value error bounded by the local density
        for approx, ex, p in ((r["q_50"], exact[r["g"]][0], 0.5), (r["q_90"], exact[r["g"]][1], 0.9)):
            # values are 0..4999 uniform: rank slack of n/1000 = 20 rows ≈ 5 units
            assert abs(approx - ex) <= 25, (r["g"], p, approx, ex)


@pytest.fixture(scope="module")
def token_df(spark):
    # skewed frequencies: token-i appears i+1 times
    rows = [(f"tok{i}",) for i in range(40) for _ in range(i + 1)]
    return spark.createDataFrame(rows, ["token"]).cache()


def test_cms_never_undercounts(spark, token_df):
    """The CMS guarantee: estimate >= exact for EVERY value, at a width
    small enough to force real collisions."""
    from acorn_hybrid_vector_search_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    sketch = cms_build(token_df, "token", depth=3, width=16)
    exact = token_df.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, exact.select("token"), "token", depth=3, width=16)
    joined = est.join(exact, "token").collect()
    assert len(joined) == 40
    assert all(r["cms_count"] >= r["n"] for r in joined)


def test_cms_exact_at_large_width(spark, token_df):
    """With width >> distinct values, collisions vanish and every
    estimate equals the exact count."""
    from acorn_hybrid_vector_search_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    sketch = cms_build(token_df, "token", depth=4, width=1 << 14)
    exact = token_df.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(sketch, exact.select("token"), "token", depth=4, width=1 << 14)
    joined = est.join(exact, "token").collect()
    assert all(r["cms_count"] == r["n"] for r in joined)


def test_cms_merge_identity_is_exact(spark, token_df):
    """Counters add: the sum-merge of per-split sketches equals the
    whole-input sketch counter-for-counter (the incremental-maintenance
    identity, same contract as the HLL register merge)."""
    from acorn_hybrid_vector_search_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    a = token_df.where(F.length("token") <= 4)  # tok0-tok9
    b = token_df.where(F.length("token") > 4)
    merged = cms_merge(
        [cms_build(a, "token", depth=3, width=64),
         cms_build(b, "token", depth=3, width=64)]
    )
    whole = cms_build(token_df, "token", depth=3, width=64)
    key = lambda r: (r["d"], r["bucket"], r["cnt"])
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))


def test_cms_rejects_bad_params(spark, token_df):
    from acorn_hybrid_vector_search_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    with pytest.raises(ValueError):
        cms_build(token_df, "token", depth=0)
    with pytest.raises(ValueError):
        cms_build(token_df, "token", width=0)
    with pytest.raises(ValueError):
        cms_merge([])
