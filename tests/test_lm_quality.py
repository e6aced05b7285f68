"""Unigram-LM quality scoring (operators/lm_quality.py): python-reference
parity, junk ranks below typical text, empty docs omitted."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from acorn_hybrid_vector_search_spark.operators.lm_quality import (
    unigram_logprob_scores,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat and the dog"),
    (3, "zxqv jklw qwpt"),  # junk: every token is a hapax
    (4, "   "),  # blank after normalization → omitted
    (5, "THE  Cat\tSAT"),  # normalization: case + whitespace runs
]


def _py_reference(alpha=0.5):
    toks = {
        i: " ".join(t.lower().split()).split(" ")
        for i, t in DOCS
        if t.strip()
    }
    counts = Counter(tok for ts in toks.values() for tok in ts)
    total, vocab = sum(counts.values()), len(counts)
    out = {}
    for i, ts in toks.items():
        s = sum(
            round(math.log10((counts[t] + alpha) / (total + alpha * vocab)), 12)
            for t in ts
        )
        out[i] = (len(ts), round(s / len(ts), 6))
    return out


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
        for r in unigram_logprob_scores(df).collect()
    }


def test_matches_python_reference(scored):
    assert scored == _py_reference()


def test_junk_scores_below_typical(scored):
    junk = scored[3][1]
    for i in (0, 1, 2):
        assert junk < scored[i][1]


def test_blank_doc_omitted_and_normalization_applied(scored):
    assert 4 not in scored
    assert scored[5][0] == 3  # "the cat sat"


def _py_bigram_reference(alpha=0.5, lam=0.7):
    toks = {
        i: " ".join(t.lower().split()).split(" ")
        for i, t in DOCS
        if t.strip()
    }
    ucounts = Counter(tok for ts in toks.values() for tok in ts)
    total, vocab = sum(ucounts.values()), len(ucounts)
    bcounts = Counter(
        (ts[j], ts[j + 1])
        for ts in toks.values()
        if len(ts) >= 2
        for j in range(len(ts) - 1)
    )
    out = {}
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        s = 0
        for j in range(len(ts) - 1):
            p_bi = (bcounts[(ts[j], ts[j + 1])] + alpha) / (
                ucounts[ts[j]] + alpha * vocab
            )
            p_uni = (ucounts[ts[j + 1]] + alpha) / (total + alpha * vocab)
            s += round(math.log10(lam * p_bi + (1.0 - lam) * p_uni), 12)
        out[i] = (len(ts) - 1, round(s / (len(ts) - 1), 6))
    return out


@pytest.fixture(scope="module")
def bigram_scored(spark):
    from acorn_hybrid_vector_search_spark.operators.lm_quality import (
        bigram_logprob_scores,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_transitions"], r["mean_logprob"])
        for r in bigram_logprob_scores(df).collect()
    }


def test_bigram_matches_python_reference(bigram_scored):
    assert bigram_scored == _py_bigram_reference()


def test_bigram_ranks_shuffled_below_natural(spark):
    """The word-order signal: a token-shuffled copy of a natural corpus
    sentence scores LOWER under the bigram LM even though its unigram
    distribution is identical."""
    from acorn_hybrid_vector_search_spark.operators.lm_quality import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the mat"),
        (2, "the cat sat on the log"),
        (3, "mat the on sat cat the"),  # shuffled copy of doc 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uni = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob_scores(df).collect()}
    bi = {r["doc_id"]: r["mean_logprob"] for r in bigram_logprob_scores(df).collect()}
    assert uni[3] == uni[0]  # unigram is blind to order
    assert bi[3] < bi[0]  # bigram is not
