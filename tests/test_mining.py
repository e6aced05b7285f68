"""Hard-negative mining (operators/mining.py): python-reference parity
and the label-exclusion invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.mining import (
    hard_negatives,
    mined_pairs,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(9)
    rows = [
        (i, i % 4, [round(rng.uniform(-1, 1), 4) for _ in range(8)])
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    ).cache()


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return (
        corpus.where(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("query_vec"),
        )
        .cache()
    )


def _py_reference(corpus_rows, q_rows, k):
    out = {}
    for q in q_rows:
        cands = []
        for r in corpus_rows:
            if r["label"] == q["query_label"]:
                continue
            d = sum((a - b) ** 2 for a, b in zip(r["embedding"], q["query_vec"]))
            cands.append((d, r["vec_id"]))
        cands.sort()
        out[q["query_id"]] = [v for _, v in cands[:k]]
    return out

def test_matches_python_reference(spark, corpus, queries):
    got: dict[int, list[int]] = {}
    for r in hard_negatives(corpus, queries, 5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    want = _py_reference(corpus.collect(), queries.collect(), 5)
    for qid, pairs in got.items():
        assert [v for _, v in sorted(pairs)] == want[qid]


def test_no_same_label_leaks(spark, corpus, queries):
    out = hard_negatives(corpus, queries, 10)
    assert out.where(F.col("label") == F.col("query_label")).count() == 0


def test_mined_pairs_tags_and_excludes_self(spark, corpus, queries):
    out = mined_pairs(corpus, queries, 3).cache()
    # positives share the label, negatives differ
    assert (
        out.where((F.col("pair_type") == "pos") & (F.col("label") != F.col("query_label"))).count()
        == 0
    )
    assert (
        out.where((F.col("pair_type") == "neg") & (F.col("label") == F.col("query_label"))).count()
        == 0
    )
    # the query row itself is never its own positive
    assert out.where((F.col("pair_type") == "pos") & (F.col("vec_id") == F.col("query_id"))).count() == 0
    # 4 queries × 3 pos + 4 × 3 neg
    assert out.count() == 24


def test_mined_pairs_external_ids_exclude_cond(spark, corpus, queries):
    """With EXTERNAL query ids the default id==query_id exclusion is
    meaningless (docstring contract): an explicit exclude_cond must
    control which positives are dropped."""
    ext = queries.select(
        (F.col("query_id") + 1000).alias("query_id"),
        "query_label",
        "query_vec",
        F.col("query_id").alias("source_vec_id"),  # provenance column
    )
    got = mined_pairs(
        corpus,
        ext,
        3,
        exclude_cond=F.col("vec_id") != F.col("source_vec_id"),
    )
    pos = got.where(F.col("pair_type") == "pos").collect()
    assert pos, "no positives mined"
    for r in pos:
        # the query's own corpus row never appears as its positive
        assert r["vec_id"] != r["query_id"] - 1000
