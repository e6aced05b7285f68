"""BM25 + reciprocal-rank fusion (operators/retrieval.py): parity with a
hand-rolled Python reference on a small corpus, determinism, and the
no-full-explode plan shape."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)

CORPUS = [
    (0, "spark shuffles data between stages during wide transformations"),
    (1, "catalyst optimizes the logical plan before execution"),
    (2, "spark spark spark repeated term density test spark"),
    (3, "completely unrelated text about cooking pasta at home"),
    (4, "wide transformations in spark require a shuffle of data"),
    (5, "the shuffle service stores shuffle data for executors"),
]
QUERY = ["spark", "shuffle", "data"]
K1, B = 1.2, 0.75


def _py_bm25():
    toks = {
        d: re.sub(r"\s+", " ", t.lower()).strip().split(" ") for d, t in CORPUS
    }
    n = len(CORPUS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in QUERY
    }
    idf = {q: math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1) for q in QUERY}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for q in QUERY:
            tf = v.count(q)
            if tf == 0:
                continue
            s += idf[q] * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(v) / avgdl))
        if s > 0:
            out[d] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


def test_bm25_matches_python_reference(spark, docs):
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, QUERY).collect()}
    want = _py_bm25()
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_bm25_topk_rank_and_determinism(spark, docs):
    want = _py_bm25()
    order = sorted(want, key=lambda d: (-want[d], d))
    got = bm25_topk(docs, QUERY, 3).collect()
    assert [r["doc_id"] for r in got] == order[:3]
    assert [r["rank"] for r in got] == [1, 2, 3]
    # duplicate query terms must not double-score
    dup = {r["doc_id"]: r["score"] for r in bm25_scores(docs, QUERY + QUERY).collect()}
    base = {r["doc_id"]: r["score"] for r in bm25_scores(docs, QUERY).collect()}
    assert dup == base


def test_bm25_no_explode_no_wide_shuffle(spark, docs):
    """BM25's plan must not explode the token stream at all, and the only
    Exchange allowed is the 1-row stats broadcast + its single-partition
    global reduce — never a corpus-keyed hash shuffle."""
    plan = bm25_scores(docs, QUERY)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan
    assert "hashpartitioning" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_rrf_matches_formula(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    c = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank long")
    got = {r["doc_id"]: r for r in rrf_fuse([a, c], k=60).collect()}
    assert got[2]["rrf_score"] == pytest.approx(round(1 / 61 + 1 / 62, 6))
    assert got[1]["rrf_score"] == pytest.approx(round(1 / 61, 6))
    assert got[2]["n_lists"] == 2 and got[1]["n_lists"] == 1
    # doc 2 (in both lists) outranks everything
    assert got[2]["fused_rank"] == 1
    # tie between doc 1 (rank 1 in a) and doc 4's 1/62 < 1/61: order by score then id
    ranks = {d: r["fused_rank"] for d, r in got.items()}
    assert ranks[1] < ranks[4]


def test_rrf_top_filter(spark):
    a = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc_id long, rank long")
    out = rrf_fuse([a], top=3).collect()
    assert len(out) == 3
    assert [r["fused_rank"] for r in sorted(out, key=lambda r: r["fused_rank"])] == [1, 2, 3]
