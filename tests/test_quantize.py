"""Int8 quantization (operators/quantize.py): bit-parity with the Python
reference, bounds, scale cancellation, recall vs exact cosine, and the
no-shuffle plan shape."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.distance import cosine_similarity
from acorn_hybrid_vector_search_spark.operators.quantize import (
    quantize_vec,
    quantize_vec_py,
    quantized_cosine,
    quantized_topk,
    with_quantized,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(11)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(32)]) for i in range(300)
    ]
    rows.append((300, [0.0] * 32))  # zero vector edge case
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_quantize_matches_python_reference(spark, emb):
    got = emb.select("vec_id", "embedding", quantize_vec("embedding").alias("qs")).collect()
    for r in got:
        q, scale = quantize_vec_py(r["embedding"])
        assert r["qs"]["q"] == q, r["vec_id"]
        assert r["qs"]["scale"] == pytest.approx(scale, abs=0.0)


def test_quantized_values_bounded(spark, emb):
    mx = emb.select(
        F.array_max(F.transform(quantize_vec("embedding")["q"], F.abs)).alias("m")
    ).agg(F.max("m")).head()[0]
    assert mx <= 127


def test_quantized_cosine_close_to_exact_and_scale_free(spark, emb):
    """Per-pair quantized cosine ≈ exact cosine (8-bit error), and scaling
    a vector by any constant leaves the quantized cosine unchanged."""
    q = [0.5] * 16 + [-0.5] * 16
    rows = (
        emb.where(F.col("vec_id") < 50)
        .select(
            "vec_id",
            cosine_similarity("embedding", q).alias("exact"),
            quantized_cosine(
                quantize_vec("embedding"), quantize_vec(q)
            ).alias("qsim"),
            quantized_cosine(
                quantize_vec("embedding"),
                quantize_vec([x * 37.5 for x in q]),
            ).alias("qsim_scaled"),
        )
        .collect()
    )
    for r in rows:
        assert r["qsim"] == pytest.approx(r["exact"], abs=0.02)
        assert r["qsim_scaled"] == r["qsim"]


def test_zero_vector_null_sim(spark, emb):
    r = (
        emb.where(F.col("vec_id") == 300)
        .select(
            quantized_cosine(
                quantize_vec("embedding"), quantize_vec([1.0] * 32)
            ).alias("s")
        )
        .head()
    )
    assert r["s"] is None


def test_topk_recall_vs_exact(spark, emb):
    rng = random.Random(3)
    q = [rng.uniform(-1, 1) for _ in range(32)]
    exact = [
        r["vec_id"]
        for r in emb.select("vec_id", cosine_similarity("embedding", q).alias("s"))
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    approx = [r["vec_id"] for r in quantized_topk(emb, q, 10).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.8, (exact, approx)


def test_materialized_qvec_same_results(spark, emb):
    rng = random.Random(5)
    q = [rng.uniform(-1, 1) for _ in range(32)]
    on_the_fly = quantized_topk(emb, q, 10).collect()
    mat = with_quantized(emb).select("vec_id", "qvec").cache()
    pre = quantized_topk(mat, q, 10, qvec_col="qvec").collect()
    assert [(r["vec_id"], r["qsim"]) for r in on_the_fly] == [
        (r["vec_id"], r["qsim"]) for r in pre
    ]


def test_topk_plan_no_shuffle(spark, emb):
    q = [0.1] * 32
    plan = quantized_topk(emb, q, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
