"""Benchmark decontamination (operators/decontam.py).

Python-reference parity: the operator's flag/drop decisions must equal a
hand-rolled shingle-overlap computation over the same normalization
(lowercase, whitespace-collapse, word n-grams, distinct within doc).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.decontam import (
    benchmark_ngrams,
    contaminated_ids,
    contamination_stats,
    decontaminate,
)

BENCH = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "To be or not to be that is the question"),
]

DOCS = [
    # exact copy of a benchmark doc → heavily contaminated
    (10, "The quick brown fox jumps over the lazy dog"),
    # shares exactly one 3-gram ("quick brown fox") with the benchmark
    (11, "a very quick brown fox sat still"),
    # same words, different order → no shared 3-gram
    (12, "fox brown quick the dog lazy the over jumps"),
    # disjoint vocabulary → clean
    (13, "completely unrelated text about spark catalyst plans"),
    # shorter than n tokens → zero grams, never flagged
    (14, "tiny doc"),
    # case/whitespace variants must still match (normalization)
    (15, "THE   Quick\tBROWN fox JUMPS over nothing else"),
]


def _grams(text: str, n: int = 3) -> set[str]:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_hits(doc_text: str, n: int = 3) -> int:
    bench = set().union(*(_grams(t, n) for _, t in BENCH))
    return len(_grams(doc_text, n) & bench)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string").cache()
    bench = spark.createDataFrame(BENCH, "bench_id long, text string").cache()
    return docs, bench


def test_stats_match_python_reference(spark, frames):
    docs, bench = frames
    got = {
        r["doc_id"]: r
        for r in contamination_stats(docs, bench, n=3).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        r = got[doc_id]
        assert r["n_hits"] == _py_hits(text), (doc_id, text)
        assert r["n_grams"] == len(_grams(text))
        assert r["contaminated"] == (r["n_hits"] >= 1)


def test_min_overlap_threshold(spark, frames):
    docs, bench = frames
    # doc 11 has exactly one shared gram: flagged at 1, clean at 2
    at1 = {r["doc_id"] for r in contaminated_ids(docs, bench, min_overlap=1).collect()}
    at2 = {r["doc_id"] for r in contaminated_ids(docs, bench, min_overlap=2).collect()}
    assert 11 in at1 and 11 not in at2
    assert 10 in at2  # the exact copy stays flagged
    assert at2 <= at1


def test_decontaminate_is_anti_join_of_flagged(spark, frames):
    docs, bench = frames
    flagged = {r["doc_id"] for r in contaminated_ids(docs, bench).collect()}
    kept = {r["doc_id"] for r in decontaminate(docs, bench).collect()}
    assert kept == {d for d, _ in DOCS} - flagged
    # schema-preserving
    assert decontaminate(docs, bench).columns == docs.columns


def test_clean_and_short_docs_survive(spark, frames):
    docs, bench = frames
    kept = {r["doc_id"] for r in decontaminate(docs, bench).collect()}
    assert 13 in kept  # disjoint vocab
    assert 14 in kept  # < n tokens ⇒ zero grams
    assert 12 in kept  # word-order scramble shares no 3-gram
    assert 10 not in kept  # exact benchmark copy dropped
    assert 15 not in kept  # normalization makes the case variant match


def test_benchmark_grams_distinct(spark, frames):
    _, bench = frames
    g = benchmark_ngrams(bench, n=3)
    assert g.count() == g.distinct().count()
    vals = {r["gram"] for r in g.collect()}
    assert "the quick brown" in vals


def test_no_shuffle_of_corpus_by_gram(spark, frames):
    """The contamination probe must broadcast the benchmark gram set — an
    Exchange hashpartitioning(gram) of the exploded corpus would shuffle
    corpus-scale data."""
    docs, bench = frames
    plan = contaminated_ids(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # exactly one gram-keyed Exchange is legitimate: the benchmark side's
    # distinct() before its BroadcastExchange. A second one would mean the
    # exploded CORPUS grams are being shuffled.
    assert plan.count("hashpartitioning(gram") <= 1


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """The expression-level Bloom filter: every inserted member passes
    (no false negatives, by construction), and the FP rate on 2000
    disjoint non-members stays within ~3x the designed bound
    (m=2^14, k=5, n=500 → fp ≈ (1-e^(-kn/m))^k ≈ 0.48%)."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        bloom_build,
        bloom_might_contain,
    )

    m_bits, k = 1 << 14, 5
    members = spark.range(500).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    bloom = bloom_build(members, "v", m_bits=m_bits, k=k)
    probe = lambda df: (
        df.crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain(F.col("words"), F.col("v"), m_bits=m_bits, k=k))
        .count()
    )
    assert probe(members) == 500  # zero false negatives
    others = spark.range(2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("v")
    )
    fp = probe(others) / 2000.0
    assert fp <= 0.015, fp


def test_bloom_stats_equal_exact_stats(spark, frames):
    """contamination_stats_bloom must return the IDENTICAL relation as
    the broadcast-exact path — the verify join removes every Bloom
    false positive, which is the whole two-phase contract."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        contamination_stats_bloom,
    )

    docs, bench = frames
    key = lambda r: (r["doc_id"], r["n_grams"], r["n_hits"],
                     r["contaminated"], r["overlap_frac"])
    exact = sorted(map(key, contamination_stats(docs, bench, n=3).collect()))
    bloom = sorted(
        map(key, contamination_stats_bloom(docs, bench, n=3).collect())
    )
    assert bloom == exact


def test_bloom_screen_is_maps_side_before_verify_join(spark, frames):
    """Plan shape: the bitset rides a broadcast (BroadcastNestedLoopJoin
    over the 1-row scalar), and the gram screen sits in a Filter BEFORE
    the verify equi-join — i.e. the corpus never shuffles unscreened."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        contamination_stats_bloom,
    )

    docs, bench = frames
    plan = (
        contamination_stats_bloom(docs, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "xxhash64" in plan  # the probe is a JVM expression, no UDF
    assert "pythonUDF" not in plan.lower()


def test_route_decontam_matrix():
    """Routing matrix: broadcast below the budget, bloom above, with
    fp-sized bitset; both routes produce identical output by contract
    (test_bloom_stats_equal_exact_stats is that pin)."""
    from acorn_hybrid_vector_search_spark.plans.router import route_decontam

    small = route_decontam(100_000)
    assert small.strategy == "broadcast"
    mid = route_decontam(10_000_000)
    assert mid.strategy == "bloom"
    # ~9.6 bits/item at 1% fp, rounded to a power of two
    assert mid.params["m_bits"] >= 9 * 10_000_000
    assert mid.params["m_bits"] & (mid.params["m_bits"] - 1) == 0
    assert 4 <= mid.params["k"] <= 10
    # a billion-gram blocklist hits the single-row bitset assembly
    # ceiling (bloom_build collects the dense word array into ONE
    # aggregate row): m_bits is CAPPED at 2^30 (128 MB), k re-optimized
    # for the effective bits/item, and the degraded fp disclosed —
    # output stays exact, the screen just filters less
    big = route_decontam(1_000_000_000)
    assert big.strategy == "bloom"
    assert big.params["m_bits"] == 1 << 30
    assert big.params["k"] >= 1
    assert "CAPPED" in big.rationale
    with pytest.raises(ValueError):
        route_decontam(-1)
