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
    # a billion-gram blocklist exceeds the single-row bitset assembly
    # bound (bloom_build collects the dense word array into ONE
    # aggregate row, ~2^30 bits): route to the prefix-SHARDED bitset —
    # independent per-shard filters whose (shard, words) relation still
    # broadcasts whole, restoring the target fp
    big = route_decontam(1_000_000_000)
    assert big.strategy == "bloom_sharded"
    assert big.params == {"n_shards": 16, "m_bits": 1 << 30, "k": 7}
    assert "restored" in big.rationale
    # past even the 64-shard / 8 GB broadcast ceiling: k re-optimized
    # for the effective bits/item, degraded fp disclosed — output stays
    # exact either way (false positives die in the verify join)
    ultra = route_decontam(100_000_000_000)
    assert ultra.strategy == "bloom_sharded"
    assert ultra.params["n_shards"] == 64
    assert "CAPPED" in ultra.rationale
    with pytest.raises(ValueError):
        route_decontam(-1)


def test_sharded_bloom_stats_equal_exact_stats(spark, frames):
    """contamination_stats_bloom_sharded must return the IDENTICAL
    relation as the broadcast-exact path — same two-phase contract as
    the 1-row bitset, past the single-row assembly bound."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        contamination_stats_bloom_sharded,
    )

    docs, bench = frames
    key = lambda r: (r["doc_id"], r["n_grams"], r["n_hits"],
                     r["contaminated"], r["overlap_frac"])
    exact = sorted(map(key, contamination_stats(docs, bench, n=3).collect()))
    for n_shards in (1, 4):  # degenerate single shard and a real split
        sharded = sorted(
            map(
                key,
                contamination_stats_bloom_sharded(
                    docs, bench, n=3, n_shards=n_shards, m_bits=1 << 12
                ).collect(),
            )
        )
        assert sharded == exact, n_shards


def test_sharded_bloom_layout_and_no_false_negatives(spark):
    """Every shard row exists (even empty ones — the probe join must
    never drop a shard), each row carries exactly m_bits/64 words, and
    every inserted member passes its own shard's filter."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        bloom_build_sharded,
        bloom_might_contain,
        bloom_shard,
    )

    m_bits, k, n_shards = 1 << 12, 5, 8
    members = spark.range(300).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    blooms = bloom_build_sharded(members, "v", n_shards=n_shards, m_bits=m_bits, k=k)
    rows = blooms.collect()
    assert sorted(r["shard"] for r in rows) == list(range(n_shards))
    assert all(len(r["words"]) == m_bits // 64 for r in rows)
    passed = (
        members.withColumn("shard", bloom_shard(F.col("v"), n_shards))
        .join(F.broadcast(blooms), "shard")
        .where(bloom_might_contain(F.col("words"), F.col("v"), m_bits=m_bits, k=k))
        .count()
    )
    assert passed == 300  # zero false negatives

    with pytest.raises(ValueError):
        bloom_build_sharded(members, "v", n_shards=0)


def test_sharded_bloom_screen_is_map_side(spark, frames):
    """Plan shape: the (shard, words) relation rides a BroadcastExchange
    (broadcast hash join on the shard key — map-side screen), the probe
    is pure JVM expression, and no corpus shuffle precedes the screen."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        contamination_stats_bloom_sharded,
    )

    docs, bench = frames
    plan = (
        contamination_stats_bloom_sharded(docs, bench, n=3, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "xxhash64" in plan
    assert "pythonUDF" not in plan.lower()


def test_bloom_rejects_non_word_aligned_m_bits(spark):
    """m_bits that is not a positive multiple of 64 would silently drop
    probe bits past the last full word (F.get returns NULL past the
    array end -> the screen filters out genuinely contaminated grams —
    a FALSE NEGATIVE). Both builders must reject it."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        bloom_build,
        bloom_build_sharded,
    )

    members = spark.range(10).select(F.concat(F.lit("m-"), F.col("id")).alias("v"))
    for bad in (100, 63, 0, -64):
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(members, "v", m_bits=bad)
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build_sharded(members, "v", m_bits=bad)


def test_bloom_might_contain_rejects_bad_m_bits(spark):
    """bloom_might_contain validates m_bits like the builders (ADVICE
    r6): a non-multiple-of-64 would probe past the last word -> NULL ->
    silent false negative."""
    from acorn_hybrid_vector_search_spark.operators.decontam import bloom_might_contain

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_might_contain(F.col("w"), F.col("v"), m_bits=100, k=3)


def test_stream_decontaminate_equals_batch(spark, tmp_path):
    """stream==batch parity (VERDICT r6 ask #4): the accumulated
    micro-batch stats from the ingestion gate equal contamination_stats
    over the union of all batches, row for row — including docs split
    across different micro-batches."""
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        contamination_stats,
    )
    from acorn_hybrid_vector_search_spark.sources.testdata import load_table
    from acorn_hybrid_vector_search_spark.streaming.pipeline import (
        stream_decontaminate,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = d.filter(F.col("doc_id") % 11 == 0)
    corpus = d.filter(F.col("doc_id") % 11 != 0)
    src = str(tmp_path / "stream_src")
    corpus.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    corpus.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q, current = stream_decontaminate(stream, bench, n=3, min_overlap=1)
    q.awaitTermination()
    got = sorted(map(tuple, current().collect()))
    want = sorted(map(tuple, contamination_stats(corpus, bench, n=3, min_overlap=1).collect()))
    assert got == want and len(got) == corpus.count()
    # the stream really ran as >1 micro-batch
    assert q.lastProgress is not None
