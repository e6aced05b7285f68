"""Sliding-window chunking (operators/chunking.py): python parity,
coverage/overlap invariants, and the no-shuffle plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.chunking import sliding_chunks

DOCS = [
    (0, " ".join(f"t{i}" for i in range(100))),  # 100 tokens → several windows
    (1, " ".join(f"w{i}" for i in range(64))),  # exactly one window
    (2, " ".join(f"u{i}" for i in range(65))),  # one token over → 2 windows
    (3, "short doc"),  # far under the window
    (4, " ".join(f"x{i}" for i in range(49))),  # stride+1 tokens
]
CHUNK, STRIDE = 64, 48


def _py_chunks(text: str):
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    n = len(toks)
    n_chunks = 1 + max(0, -(-(n - CHUNK) // STRIDE)) if n > CHUNK else 1
    out = []
    for i in range(n_chunks):
        w = toks[i * STRIDE : i * STRIDE + CHUNK]
        out.append((i, len(w), " ".join(w)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_matches_python_reference(spark, docs):
    got: dict[int, list] = {}
    for r in sliding_chunks(docs, chunk_tokens=CHUNK, stride=STRIDE).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        )
    for doc_id, text in DOCS:
        assert sorted(got[doc_id]) == _py_chunks(text), doc_id


def test_every_token_covered_and_overlap(spark, docs):
    rows = sliding_chunks(docs, chunk_tokens=CHUNK, stride=STRIDE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in DOCS:
        toks = text.lower().split()
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        covered = set()
        for r in chunks:
            start = r["chunk_id"] * STRIDE
            covered.update(range(start, start + r["n_tokens"]))
        assert covered == set(range(len(toks))), doc_id
        for a, b in zip(chunks, chunks[1:]):
            # consecutive windows overlap by CHUNK − STRIDE tokens
            assert a["chunk_id"] * STRIDE + a["n_tokens"] - b["chunk_id"] * STRIDE in (
                CHUNK - STRIDE,
                a["n_tokens"] - STRIDE,
            )


def test_stride_equals_chunk_partitions_tokens(spark, docs):
    rows = sliding_chunks(docs, chunk_tokens=10, stride=10).collect()
    for doc_id, text in DOCS:
        toks = text.lower().split()
        mine = sorted(
            (r["chunk_id"], r["chunk_text"])
            for r in rows
            if r["doc_id"] == doc_id
        )
        rebuilt = " ".join(t for _, t in mine)
        assert rebuilt == " ".join(toks), doc_id


def test_rejects_lossy_stride(spark, docs):
    with pytest.raises(ValueError):
        sliding_chunks(docs, chunk_tokens=10, stride=11)


def test_no_shuffle(spark, docs):
    plan = (
        sliding_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
