"""SCD-1 upsert (operators/upsert.py): merge semantics, last-wins
dedupe, broadcast plan shape, and partition-scoped in-place rewrite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.upsert import (
    last_wins,
    merge_upsert,
    upsert_partitioned,
)


@pytest.fixture()
def base(spark):
    rows = [(k, f"v{k}", k % 3) for k in range(30)]
    return spark.createDataFrame(rows, "k long, v string, p long")


def test_merge_updates_win_and_inserts_append(spark, base):
    updates = spark.createDataFrame(
        [(3, "NEW3", 0), (7, "NEW7", 1), (100, "INS", 2)], "k long, v string, p long"
    )
    got = {r["k"]: r["v"] for r in merge_upsert(base, updates, ["k"]).collect()}
    assert len(got) == 31
    assert got[3] == "NEW3" and got[7] == "NEW7" and got[100] == "INS"
    assert got[4] == "v4"  # untouched


def test_last_wins_dedupe(spark):
    updates = spark.createDataFrame(
        [(1, "old", 10), (1, "new", 20), (2, "only", 5)], "k long, v string, ver long"
    )
    got = {r["k"]: r["v"] for r in last_wins(updates, ["k"], "ver").collect()}
    assert got == {1: "new", 2: "only"}


def test_merge_broadcasts_update_keys(spark, base):
    updates = spark.createDataFrame([(1, "x", 0)], "k long, v string, p long")
    plan = (
        merge_upsert(base, updates, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_upsert_partitioned_rewrites_only_affected(spark, base, tmp_path):
    path = str(tmp_path / "tbl")
    base.write.partitionBy("p").parquet(path)
    untouched = sorted(
        f for f in os.listdir(os.path.join(path, "p=2")) if f.endswith(".parquet")
    )
    mtimes = {
        f: os.path.getmtime(os.path.join(path, "p=2", f)) for f in untouched
    }

    # updates touch partitions 0 and 1 only
    updates = spark.createDataFrame(
        [(3, "NEW3", 0), (7, "NEW7", 1), (90, "INS", 0)], "k long, v string, p long"
    )
    upsert_partitioned(spark, path, updates, ["k"], "p")

    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    want = {k: f"v{k}" for k in range(30)} | {3: "NEW3", 7: "NEW7", 90: "INS"}
    assert got == want

    # partition p=2's files are byte-untouched
    after = sorted(
        f for f in os.listdir(os.path.join(path, "p=2")) if f.endswith(".parquet")
    )
    assert after == untouched
    for f in after:
        assert os.path.getmtime(os.path.join(path, "p=2", f)) == mtimes[f]


def test_upsert_partitioned_equals_full_merge(spark, base, tmp_path):
    path = str(tmp_path / "tbl2")
    base.write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(0, "A", 0), (29, "B", 2), (500, "C", 1)], "k long, v string, p long"
    )
    upsert_partitioned(spark, path, updates, ["k"], "p")
    got = sorted(
        (r["k"], r["v"], r["p"]) for r in spark.read.parquet(path).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["p"])
        for r in merge_upsert(base, updates, ["k"]).collect()
    )
    assert got == want


def test_cross_partition_move_guard(spark, base, tmp_path):
    from acorn_hybrid_vector_search_spark.operators.upsert import (
        cross_partition_moves,
    )

    path = str(tmp_path / "tbl3")
    base.write.partitionBy("p").parquet(path)
    # k=4 lives in p=1 (4 % 3); this update claims p=0 — a move
    moving = spark.createDataFrame([(4, "MOVED", 0)], "k long, v string, p long")
    flagged = cross_partition_moves(spark, path, moving, ["k"], "p").collect()
    assert [(r["k"], r["p"]) for r in flagged] == [(4, 1)]
    with pytest.raises(ValueError, match="cross-partition"):
        upsert_partitioned(spark, path, moving, ["k"], "p", check_moves=True)

    # same-partition update passes the guard and merges normally
    ok = spark.createDataFrame([(4, "NEW4", 1)], "k long, v string, p long")
    assert cross_partition_moves(spark, path, ok, ["k"], "p").count() == 0
    upsert_partitioned(spark, path, ok, ["k"], "p", check_moves=True)
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got[4] == "NEW4" and len(got) == 30
