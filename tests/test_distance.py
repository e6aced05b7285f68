import math
import random

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.distance import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_sq_distance,
)


@pytest.fixture(scope="module")
def pairs(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(8)], [rng.uniform(-2, 2) for _ in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    return rows, df


def test_l2_sq_matches_python(pairs):
    rows, df = pairs
    got = {r["id"]: r["d"] for r in df.select("id", l2_sq_distance("a", "b").alias("d")).collect()}
    for i, a, b in rows:
        exp = sum((x - y) ** 2 for x, y in zip(a, b))
        assert got[i] == pytest.approx(exp, rel=1e-12)


def test_cosine_matches_python(pairs):
    rows, df = pairs
    got = {
        r["id"]: r["s"] for r in df.select("id", cosine_similarity("a", "b").alias("s")).collect()
    }
    for i, a, b in rows:
        dot = sum(x * y for x, y in zip(a, b))
        exp = dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
        assert got[i] == pytest.approx(exp, rel=1e-12)


def test_vector_literal_and_norms(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "v"])
    row = df.select(
        l2_norm("v").alias("n"),
        dot_product("v", [1.0, 1.0]).alias("d"),
        l2_sq_distance("v", [0.0, 0.0]).alias("sq"),
    ).head()
    assert row["n"] == pytest.approx(5.0)
    assert row["d"] == pytest.approx(7.0)
    assert row["sq"] == pytest.approx(25.0)


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0], [1.0, 2.0])], ["id", "a", "b"])
    assert df.select(cosine_similarity("a", "b").alias("s")).head()["s"] is None
