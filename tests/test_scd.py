"""SCD-2 history merge semantics: version closing, no-op suppression
(idempotency), new-key opens, point-in-time snapshots."""

from __future__ import annotations

import pytest

from acorn_hybrid_vector_search_spark.operators.scd import (
    scd2_apply,
    scd2_snapshot,
)

KEYS = ["k"]
ATTRS = ["status", "price"]


@pytest.fixture()
def history(spark):
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [
            (1, "A", 10.0, "2024-01-01 00:00:00", None),
            (2, "A", 20.0, "2024-01-01 00:00:00", None),
            (3, "B", 30.0, "2024-01-01 00:00:00", None),
            # key 4 already has history: one closed + one open version
            (4, "A", 40.0, "2023-01-01 00:00:00", "2024-01-01 00:00:00"),
            (4, "B", 44.0, "2024-01-01 00:00:00", None),
        ],
        "k long, status string, price double, valid_from string, valid_to string",
    )
    return raw.withColumns(
        {c: F.col(c).cast("timestamp") for c in ("valid_from", "valid_to")}
    )


@pytest.fixture()
def batch(spark):
    return spark.createDataFrame(
        [
            (1, "C", 11.0),   # changed → close + open
            (2, "A", 20.0),   # no-op → nothing
            (5, "N", 50.0),   # new key → open
        ],
        "k long, status string, price double",
    )


EFF = "2024-06-01 00:00:00"


def _rows(df):
    return sorted(
        (r["k"], r["status"], r["price"], str(r["valid_from"]), str(r["valid_to"]))
        for r in df.collect()
    )


def test_scd2_apply_semantics(spark, history, batch):
    out = scd2_apply(history, batch, KEYS, ATTRS, EFF)
    rows = _rows(out)
    assert rows == sorted([
        (1, "A", 10.0, "2024-01-01 00:00:00", "2024-06-01 00:00:00"),  # closed
        (1, "C", 11.0, "2024-06-01 00:00:00", "None"),                 # new open
        (2, "A", 20.0, "2024-01-01 00:00:00", "None"),                 # no-op kept
        (3, "B", 30.0, "2024-01-01 00:00:00", "None"),                 # untouched
        (4, "A", 40.0, "2023-01-01 00:00:00", "2024-01-01 00:00:00"),  # old closed
        (4, "B", 44.0, "2024-01-01 00:00:00", "None"),                 # untouched open
        (5, "N", 50.0, "2024-06-01 00:00:00", "None"),                 # new key
    ])


def test_scd2_idempotent_reapply(spark, history, batch):
    """Re-applying the SAME batch at a later timestamp is a no-op: the
    post-merge current versions already equal the batch attributes."""
    once = scd2_apply(history, batch, KEYS, ATTRS, EFF)
    twice = scd2_apply(once, batch, KEYS, ATTRS, "2024-07-01 00:00:00")
    assert _rows(once) == _rows(twice)


def test_scd2_null_safe_change_detection(spark):
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(1, None, 1.0, "2024-01-01 00:00:00", None),
         (2, "A", None, "2024-01-01 00:00:00", None)],
        "k long, status string, price double, valid_from string, valid_to string",
    ).withColumns(
        {c: F.col(c).cast("timestamp") for c in ("valid_from", "valid_to")}
    )
    batch = spark.createDataFrame(
        [(1, None, 1.0), (2, "A", 2.0)], "k long, status string, price double"
    )
    out = scd2_apply(hist, batch, KEYS, ATTRS, EFF)
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key[1]) == 1  # NULL == NULL: no-op
    assert len(by_key[2]) == 2  # NULL -> 2.0 IS a change


def test_scd2_last_wins_within_batch(spark, history):
    batch = spark.createDataFrame(
        [(1, "C", 11.0, 1), (1, "D", 12.0, 2)],
        "k long, status string, price double, seq long",
    )
    out = scd2_apply(history, batch, KEYS, ATTRS, EFF, order_col="seq")
    open_1 = [r for r in out.collect() if r["k"] == 1 and r["valid_to"] is None]
    assert len(open_1) == 1 and open_1[0]["status"] == "D"


def test_scd2_snapshot(spark, history, batch):
    merged = scd2_apply(history, batch, KEYS, ATTRS, EFF)
    before = scd2_snapshot(merged, "2024-05-31 00:00:00")
    # pre-batch world: the original current versions, no key 5
    assert sorted((r["k"], r["status"]) for r in before.collect()) == [
        (1, "A"), (2, "A"), (3, "B"), (4, "B"),
    ]
    after = scd2_snapshot(merged, "2024-06-02 00:00:00")
    assert sorted((r["k"], r["status"]) for r in after.collect()) == [
        (1, "C"), (2, "A"), (3, "B"), (4, "B"), (5, "N"),
    ]
    # time travel to before key 4's first close
    early = scd2_snapshot(merged, "2023-06-01 00:00:00")
    assert sorted((r["k"], r["status"]) for r in early.collect()) == [(4, "A")]


def test_scd2_plan_has_no_rowscaled_window_and_broadcasts(spark, history, batch):
    """Scale contract: the merge must broadcast the batch side and must
    not run any Window over the history relation (the small-batch
    last_wins window only appears when order_col is passed)."""
    out = scd2_apply(history, batch, KEYS, ATTRS, EFF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_scd2_stream_multibatch_equals_sequential_batch(spark, tmp_path, history):
    """Two CDC files processed as TWO micro-batches (maxFilesPerTrigger=1,
    per-batch event-time stamping) produce exactly scd2_apply(scd2_apply(
    h, b1), b2) — the streaming fold is the batch fold."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from acorn_hybrid_vector_search_spark.streaming.pipeline import (
        scd2_stream_apply,
    )

    b1 = spark.createDataFrame(
        [(1, "C", 11.0, "2024-06-01 00:00:00")],
        "k long, status string, price double, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    b2 = spark.createDataFrame(
        [(1, "D", 12.0, "2024-07-01 00:00:00"),
         (6, "E", 60.0, "2024-07-01 00:00:00")],
        "k long, status string, price double, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))

    d = tmp_path / "cdc"
    b1.coalesce(1).write.parquet(str(d / "f1"))
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(str(d / "f2"))
    # flatten into one dir with ordered mtimes for the file source
    flat = tmp_path / "flat"
    flat.mkdir()
    seq = 0
    for sub in ("f1", "f2"):
        for f in sorted(os.listdir(d / sub)):
            if f.endswith(".parquet"):
                src = d / sub / f
                dst = flat / f"{seq}_{f}"
                dst.write_bytes(src.read_bytes())
                os.utime(dst, (1700000000 + seq, 1700000000 + seq))
                seq += 1

    cdc = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q, current = scd2_stream_apply(
        history, cdc, KEYS, ATTRS, eff_from_col="eff", order_col="eff"
    )
    q.awaitTermination()
    got = _rows(current())

    expected = scd2_apply(
        scd2_apply(history, b1.select(*KEYS, *ATTRS), KEYS, ATTRS,
                   "2024-06-01 00:00:00"),
        b2.select(*KEYS, *ATTRS), KEYS, ATTRS, "2024-07-01 00:00:00",
    )
    assert got == _rows(expected)
    # and key 1 carries the full 3-version paper trail
    hist_1 = [r for r in got if r[0] == 1]
    assert len(hist_1) == 3


def test_scd2_out_of_order_batch_raises(spark, history, batch):
    """ADVICE r5: an effective_ts that predates a changed key's current
    valid_from would close it with valid_to < valid_from (an inverted
    interval silently corrupting snapshots) — the plan must raise at
    execution instead. A no-op/new-key-only late batch stays legal
    (nothing closes)."""
    import pyspark.errors

    out = scd2_apply(history, batch, KEYS, ATTRS, "2020-01-01 00:00:00")
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "out-of-order" in str(ei.value)

    # same late timestamp but only no-op + brand-new keys: no close
    # happens, so nothing raises
    ok_batch = spark.createDataFrame(
        [(2, "A", 20.0), (9, "Z", 90.0)], "k long, status string, price double"
    )
    res = scd2_apply(history, ok_batch, KEYS, ATTRS, "2020-01-01 00:00:00")
    assert res.filter("k = 9").count() == 1
