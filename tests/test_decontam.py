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
