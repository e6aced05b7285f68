"""Round-2 pipeline operators: range join, sequence packing, deterministic
sampling, TF-IDF, centroids, sliding rollup.

Each operator gets (a) a semantics check against an independent
computation (naive join / hand-rolled Python), and (b) where relevant a
plan-shape assertion that the scale-safe physical strategy was actually
used (no cartesian, no shuffle in narrow paths)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.centroids import (
    assign_nearest,
    centroid_confusion,
    label_centroids,
)
from acorn_hybrid_vector_search_spark.operators.packing import (
    chunked_packing,
    greedy_pack,
    pack_stats,
)
from acorn_hybrid_vector_search_spark.operators.rangejoin import (
    events_in_windows,
    interval_join,
)
from acorn_hybrid_vector_search_spark.operators.sampling import (
    hash_sample,
    sample_rates_for_mixture,
    stratified_sample,
)
from acorn_hybrid_vector_search_spark.operators.tfidf import tfidf, top_terms_per_doc
from acorn_hybrid_vector_search_spark.sources.testdata import load_table
from acorn_hybrid_vector_search_spark.streaming.pipeline import sliding_rollup

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# range / interval join


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def _naive_interval_join(points, intervals):
    """Cross-join + filter reference semantics (half-open)."""
    out = []
    for p in points:
        for iv in intervals:
            if iv["start"] <= p["ts"] < iv["end"]:
                out.append((p["pid"], iv["ivid"]))
    return sorted(out)


def test_interval_join_matches_naive(spark):
    t0 = datetime(2024, 1, 1)
    points = [
        {"pid": i, "ts": t0 + timedelta(minutes=7 * i + (i % 3))} for i in range(40)
    ]
    # spans from 1 minute to 4 hours — some intervals cross many chunks
    intervals = [
        {
            "ivid": j,
            "start": t0 + timedelta(minutes=11 * j),
            "end": t0 + timedelta(minutes=11 * j + (1 + 17 * (j % 4)) * (j % 5 + 1)),
        }
        for j in range(25)
    ]
    pdf = spark.createDataFrame(points)
    ivdf = spark.createDataFrame(intervals)
    got = interval_join(
        pdf, ivdf, point_ts="ts", start_col="start", end_col="end", chunk="10 minutes"
    )
    pairs = sorted((r["pid"], r["ivid"]) for r in got.collect())
    assert pairs == _naive_interval_join(points, intervals)


def test_interval_join_end_exclusive_and_inclusive(spark):
    t0 = datetime(2024, 1, 1)
    pdf = spark.createDataFrame([{"pid": 0, "ts": t0 + timedelta(minutes=5)}])
    ivdf = spark.createDataFrame(
        [{"ivid": 0, "start": t0, "end": t0 + timedelta(minutes=5)}]
    )
    half_open = interval_join(pdf, ivdf, start_col="start", end_col="end")
    assert half_open.count() == 0
    closed = interval_join(pdf, ivdf, start_col="start", end_col="end", end_inclusive=True)
    assert closed.count() == 1


def test_interval_join_equi_keys_and_no_cartesian(spark, events):
    errors = events.where(F.col("event_type") == "error")
    views = events.where(F.col("event_type") == "view")
    joined = events_in_windows(
        views, errors, ts_col="ts", window="10 minutes", on=("user_id",)
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # per-user windows: every matched view shares the user with its anchor
    rows = joined.select("user_id", "ts", "w_start", "w_end").collect()
    for r in rows:
        assert r["w_start"] <= r["ts"] < r["w_end"]


# ---------------------------------------------------------------------------
# sequence packing


@pytest.fixture(scope="module")
def docs_tokens(spark):
    rows = [
        {"doc_id": i, "source": f"s{i % 3}", "n_tokens": (i * 37) % 190 + 10}
        for i in range(60)
    ]
    return spark.createDataFrame(rows).cache(), rows


def test_chunked_packing_matches_python(docs_tokens):
    df, rows = docs_tokens
    budget = 256
    got = {
        r["doc_id"]: r
        for r in chunked_packing(
            df, token_col="n_tokens", shard_col="source", order_cols=("doc_id",),
            budget=budget,
        ).collect()
    }
    for shard in {r["source"] for r in rows}:
        cum = 0
        for r in sorted((x for x in rows if x["source"] == shard), key=lambda x: x["doc_id"]):
            g = got[r["doc_id"]]
            assert g["pack_id"] == cum // budget
            assert g["pack_offset"] == cum % budget
            assert g["straddles"] == (cum % budget + r["n_tokens"] > budget)
            cum += r["n_tokens"]


def test_greedy_pack_respects_budget_and_order(docs_tokens):
    df, rows = docs_tokens
    budget = 256
    out = greedy_pack(
        df, token_col="n_tokens", shard_col="source", order_cols=("doc_id",),
        budget=budget,
    ).collect()
    assert len(out) == len(rows)
    by_shard: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["source"], r["pack_id"], r["pack_offset"])):
        by_shard.setdefault(r["source"], []).append(r)
    for shard, rs in by_shard.items():
        # no pack overflows (all docs here are < budget)
        fills: dict[int, int] = {}
        for r in rs:
            assert r["pack_offset"] + r["n_tokens"] <= budget
            fills[r["pack_id"]] = max(
                fills.get(r["pack_id"], 0), r["pack_offset"] + r["n_tokens"]
            )
        # doc order within shard is preserved across (pack, offset) order
        ids = [r["doc_id"] for r in rs]
        assert ids == sorted(ids)
        # packs are densely numbered
        assert sorted(fills) == list(range(len(fills)))
    stats = pack_stats(
        greedy_pack(
            df, token_col="n_tokens", shard_col="source", order_cols=("doc_id",),
            budget=budget,
        ),
        shard_col="source",
        budget=budget,
    ).collect()
    assert all(s["n_tokens"] <= budget for s in stats)


# ---------------------------------------------------------------------------
# deterministic sampling


def test_hash_sample_deterministic_and_nested(spark):
    docs = load_table(spark, SF, "documents")
    a1 = {r["doc_id"] for r in hash_sample(docs, 0.3, key_col="doc_id").collect()}
    a2 = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), 0.3, key_col="doc_id").collect()
    }
    assert a1 == a2  # partitioning-independent
    b = {r["doc_id"] for r in hash_sample(docs, 0.6, key_col="doc_id").collect()}
    assert a1 <= b  # same salt ⇒ nested samples
    n = docs.count()
    assert 0.1 * n <= len(a1) <= 0.5 * n  # loose rate sanity at tiny n


def test_stratified_sample_rates_and_plan(spark):
    docs = load_table(spark, SF, "documents")
    out = stratified_sample(
        docs, {"src0": 1.0, "src1": 0.0}, stratum_col="source", key_col="doc_id",
        default_rate=0.5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow filter
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts.get("src0") == full["src0"]  # rate 1.0 keeps everything
    assert "src1" not in counts  # rate 0.0 drops everything


def test_cap_per_group(spark):
    from acorn_hybrid_vector_search_spark.operators.sampling import cap_per_group

    docs = load_table(spark, SF, "documents")
    out = cap_per_group(docs, 7, group_col="source", key_col="doc_id")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts and all(n <= 7 for n in counts.values())
    full = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # every source had >7 docs, so each is capped exactly
    assert all(counts[s] == 7 for s in full if full[s] > 7)
    # survivors are a pure function of the data, not the partitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in cap_per_group(
            docs.repartition(13), 7, group_col="source", key_col="doc_id"
        ).collect()
    }
    assert a == b
    # groups under the cap pass through whole
    big = cap_per_group(docs, 10**6, group_col="source", key_col="doc_id")
    assert big.count() == docs.count()


def test_sample_rates_for_mixture():
    rates = sample_rates_for_mixture(
        {"a": 1000, "b": 100, "c": 0},
        {"a": 0.5, "b": 0.5, "c": 0.1},
        total_out=200,
    )
    assert rates["a"] == pytest.approx(0.1)
    assert rates["b"] == 1.0  # capped
    assert rates["c"] == 0.0  # empty stratum


# ---------------------------------------------------------------------------
# tf-idf


def test_tfidf_hand_computed(spark):
    corpus = [
        {"doc_id": 0, "text": "apple banana apple"},
        {"doc_id": 1, "text": "banana cherry"},
        {"doc_id": 2, "text": "cherry cherry durian"},
    ]
    df = spark.createDataFrame(corpus)
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["score"])
        for r in tfidf(df).collect()
    }
    # apple: tf=2 in doc0, df=1 → 2·ln(3)
    tf, dfq, score = got[(0, "apple")]
    assert (tf, dfq) == (2, 1)
    assert score == pytest.approx(2 * math.log(3.0))
    # banana in doc1: tf=1, df=2 → ln(1.5)
    assert got[(1, "banana")][2] == pytest.approx(math.log(1.5))
    top = top_terms_per_doc(df, k=1).collect()
    best = {r["doc_id"]: r["term"] for r in top}
    # doc2: durian (1·ln3 ≈ 1.10) beats cherry (2·ln1.5 ≈ 0.81)
    assert best[0] == "apple" and best[2] == "durian"


# ---------------------------------------------------------------------------
# centroids


def test_label_centroids_exact_mean(spark):
    rows = [
        {"vec_id": 0, "label": 0, "embedding": [0.0, 0.0]},
        {"vec_id": 1, "label": 0, "embedding": [2.0, 4.0]},
        {"vec_id": 2, "label": 1, "embedding": [10.0, 10.0]},
    ]
    df = spark.createDataFrame(rows)
    cents = {r["label"]: (r["centroid"], r["n"]) for r in label_centroids(df).collect()}
    assert cents[0][0] == [1.0, 2.0] and cents[0][1] == 2
    assert cents[1][0] == [10.0, 10.0]


def test_assign_nearest_shuffle_free_and_tiebreak(spark):
    data = spark.createDataFrame(
        [{"vec_id": 0, "embedding": [1.0, 1.0]}, {"vec_id": 1, "embedding": [9.0, 9.0]}]
    )
    cents = spark.createDataFrame(
        [
            {"label": 2, "centroid": [1.0, 1.0]},
            {"label": 1, "centroid": [1.0, 1.0]},  # exact tie with label 2
            {"label": 5, "centroid": [10.0, 10.0]},
        ]
    )
    out = assign_nearest(data, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan  # literal fold, narrow
    got = {r["vec_id"]: r["assigned"] for r in out.collect()}
    assert got[0] == 1  # tie broken to smallest label
    assert got[1] == 5


def test_centroid_confusion_separated_blobs(spark):
    rows = []
    for i in range(30):
        lbl = i % 3
        base = [0.0, 0.0] if lbl == 0 else ([100.0, 0.0] if lbl == 1 else [0.0, 100.0])
        rows.append(
            {
                "vec_id": i,
                "label": lbl,
                "embedding": [base[0] + (i % 5) * 0.1, base[1] + (i % 7) * 0.1],
            }
        )
    conf = centroid_confusion(spark.createDataFrame(rows)).collect()
    # perfectly separated blobs → diagonal confusion
    assert all(r["label"] == r["assigned"] for r in conf)
    assert sum(r["cnt"] for r in conf) == 30


# ---------------------------------------------------------------------------
# sliding rollup


def test_sliding_rollup_double_counts_each_event(spark, events):
    out = sliding_rollup(events)
    assert out.agg(F.sum("n_events")).head()[0] == 2 * events.count()
    # every window is width 1h and starts on the 30-min grid
    for r in out.select("window_start", "window_end").limit(20).collect():
        assert (r["window_end"] - r["window_start"]) == timedelta(hours=1)
        assert r["window_start"].minute in (0, 30)
        assert r["window_start"].second == 0


def test_sliding_rollup_stream_equals_batch(spark, events, tmp_path):
    d = tmp_path / "ev"
    events.coalesce(2).write.parquet(str(d))
    stream = spark.readStream.schema(events.schema).parquet(str(d))
    q = (
        sliding_rollup(stream)
        .writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("slide_test")
    batch = sliding_rollup(events)
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_cap_per_group_null_group_kept(spark):
    """Rows whose group key is NULL form a real group and survive capped
    (ADVICE r6: the de-skew rewrite's equi-join on the group key silently
    dropped them; eqNullSafe keeps the old window plan's semantics)."""
    from acorn_hybrid_vector_search_spark.operators.sampling import cap_per_group

    rows = [(i, None if i < 10 else "d") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = cap_per_group(df, 3, group_col="domain", key_col="doc_id").collect()
    by_g: dict = {}
    for r in out:
        by_g.setdefault(r["domain"], []).append(r["doc_id"])
    assert len(by_g.get(None, [])) == 3      # over cap -> capped, not dropped
    assert len(by_g.get("d", [])) == 2       # under cap -> whole group
    # deterministic across partitionings
    again = cap_per_group(
        df.repartition(7), 3, group_col="domain", key_col="doc_id"
    ).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)
