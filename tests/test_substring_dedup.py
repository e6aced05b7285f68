"""Substring-level dedup: duplicated k-gram span marking + removal
against hand-computed and independently-recomputed expectations."""

from __future__ import annotations

import hashlib

import pytest

from acorn_hybrid_vector_search_spark.operators.substring_dedup import (
    duplicate_ngram_spans,
    remove_duplicate_ngrams,
)


def _py_remove(docs: dict[int, str], k: int) -> dict[int, tuple[int, int, str]]:
    """Independent reference implementation (pure Python)."""
    toks = {i: t.lower().split() for i, t in docs.items()}
    counts: dict[str, int] = {}
    for t in toks.values():
        for i in range(len(t) - k + 1):
            g = " ".join(t[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for did, t in toks.items():
        removed = set()
        for i in range(len(t) - k + 1):
            if counts[" ".join(t[i : i + k])] >= 2:
                removed.update(range(i, i + k))
        kept = [tok for p, tok in enumerate(t) if p not in removed]
        out[did] = (len(t), len(removed), " ".join(kept))
    return out


DOCS = {
    1: "x a b c d e f g h y",           # shares the 8-gram with doc 2
    2: "z a b c d e f g h w",
    3: "too short to have grams",       # < 8 tokens → untouched
    4: "p q r s t u v w p q r s t u v w",  # intra-doc repeat → fully cut
    5: "entirely unique words only here nothing repeats at all",
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], ["doc_id", "text"]
    )


def test_spans_mark_expected_positions(docs_df):
    occ = duplicate_ngram_spans(docs_df, k=8).collect()
    got = {(r["doc_id"], r["pos"]) for r in occ}
    # docs 1/2: the shared gram starts at token 1; doc 4: positions 0 and 8
    assert got == {(1, 1), (2, 1), (4, 0), (4, 8)}
    # the hash is the md5 of the space-joined gram (portable oracle key)
    g = " ".join("a b c d e f g h".split())
    h = hashlib.md5(g.encode()).hexdigest()
    assert {r["h"] for r in occ if r["doc_id"] == 1} == {h}


def test_removal_matches_reference_impl(docs_df):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned"])
        for r in remove_duplicate_ngrams(docs_df, k=8).collect()
    }
    assert got == _py_remove(DOCS, 8)
    # spot-checks of the scenarios the fixture encodes
    assert got[1] == (10, 8, "x y")
    assert got[3] == (5, 0, DOCS[3])
    assert got[4] == (16, 16, "")


def test_short_docs_and_min_count(docs_df):
    # raising min_count above any occurrence count removes nothing
    res = remove_duplicate_ngrams(docs_df, k=8, min_count=99).collect()
    assert all(r["n_removed"] == 0 for r in res)
    assert {r["doc_id"] for r in res} == set(DOCS)


def test_testdata_corpus_has_duplicates(spark):
    """At sf0.001 the synthetic corpus contains cross-doc duplicated
    8-grams; removal counts are consistent (0 ≤ removed ≤ tokens)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    res = remove_duplicate_ngrams(docs, k=8)
    rows = res.collect()
    assert len(rows) == docs.count()
    assert all(0 <= r["n_removed"] <= r["n_tokens"] for r in rows)
    assert any(r["n_removed"] > 0 for r in rows)


def test_random_corpora_match_reference_impl(spark):
    """Randomized corpora (small vocab → organic cross-doc repeats)
    against the independent Python implementation, over several k."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        k = rng.choice([2, 3, 5])
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for i in range(rng.randint(2, 12))
        }
        df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned"])
            for r in remove_duplicate_ngrams(df, k=k).collect()
        }
        assert got == _py_remove(docs, k), (trial, k)
