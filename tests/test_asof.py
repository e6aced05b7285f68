"""As-of join semantics: ≤ matching, equal-timestamp visibility, misses
stay NULL, per-key isolation, tolerance."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00")),
            (2, 10, _ts("2024-01-01T12:00")),
            (3, 10, _ts("2024-01-01T09:00")),  # before any right row
            (4, 20, _ts("2024-01-01T12:00")),  # equal-ts visibility
            (5, 30, _ts("2024-01-01T12:00")),  # key with no right rows
        ],
        "id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T09:30"), "a"),
            (10, _ts("2024-01-01T11:00"), "b"),
            (20, _ts("2024-01-01T12:00"), "c"),
        ],
        "rk long, rt timestamp, v string",
    )
    return left, right


def _run(left, right, **kw):
    res = asof_join(
        left, right, left_on="t", right_on="rt", left_by="k", right_by="rk",
        value_cols=["v"], **kw,
    )
    return {r["id"]: (r["v"], r["_asof_ts"]) for r in res.collect()}


def test_asof_basic(frames):
    left, right = frames
    got = _run(left, right)
    assert got[1] == ("a", _ts("2024-01-01T09:30"))  # latest ≤ 10:00
    assert got[2] == ("b", _ts("2024-01-01T11:00"))
    assert got[3] == (None, None)  # nothing before 09:00
    assert got[4] == ("c", _ts("2024-01-01T12:00"))  # ties match
    assert got[5] == (None, None)  # unseen key
    assert len(got) == left.count()  # left-join row preservation


def test_asof_tolerance(frames):
    left, right = frames
    got = _run(
        left,
        right,
        tolerance_expr=F.col("_match._asof_ts") >= F.col("t") - F.expr("INTERVAL 1 HOUR"),
    )
    assert got[1] == ("a", _ts("2024-01-01T09:30"))  # 30 min back: ok
    assert got[2] == ("b", _ts("2024-01-01T11:00"))  # 1 h back exactly: ok
    assert got[4] == ("c", _ts("2024-01-01T12:00"))
    assert got[3] == (None, None)


def test_asof_right_dupes_prefer_later_window_row(spark):
    """Duplicate (key, ts) right rows: the operator is deterministic given
    a deterministic right-side order only — callers dedupe (as the driver
    query does). This documents the contract: SOME matching row is chosen
    and its rt equals the duplicated timestamp."""
    left = spark.createDataFrame([(1, 1, _ts("2024-01-02T00:00"))], "id long, k long, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00"), "x"), (1, _ts("2024-01-01T00:00"), "y")],
        "rk long, rt timestamp, v string",
    )
    got = _run(left, right)
    v, ts = got[1]
    assert v in {"x", "y"} and ts == _ts("2024-01-01T00:00")


def test_asof_chunked_equals_plain(spark):
    """The skew-safe chunked as-of must return EXACTLY the plain
    union+window result on the driver tables (events × deduped orders)."""
    from pyspark.sql import functions as F

    from acorn_hybrid_vector_search_spark.operators.asof import (
        asof_join,
        asof_join_chunked,
    )
    from acorn_hybrid_vector_search_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    kw = dict(
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        value_cols=["o_orderkey"],
    )
    plain = {
        r["event_id"]: (r["_asof_ts"], r["o_orderkey"])
        for r in asof_join(ev, orders, **kw).collect()
    }
    chunked = {
        r["event_id"]: (r["_asof_ts"], r["o_orderkey"])
        for r in asof_join_chunked(ev, orders, chunk="7 days", **kw).collect()
    }
    assert chunked == plain


def test_asof_chunked_hot_key_spreads_partitions(spark):
    """One user owning 2000 events across 20 days must spread over many
    (key, chunk) window partitions — and still match the plain result."""
    from pyspark.sql import functions as F

    from acorn_hybrid_vector_search_spark.operators.asof import (
        asof_join,
        asof_join_chunked,
    )

    left = spark.range(2000).select(
        F.col("id").alias("event_id"),
        F.lit(7).alias("user_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.col("id") * 864_000_000).cast("long")
        ).alias("ts"),
    )
    right = spark.range(40).select(
        F.lit(7).alias("r_user"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.col("id") * 43_200_000_000).cast("long")
        ).alias("r_ts"),
        (F.col("id") * 100).alias("payload"),
    )
    kw = dict(
        left_on="ts", right_on="r_ts", left_by="user_id", right_by="r_user",
        value_cols=["payload"],
    )
    plain = {
        r["event_id"]: (r["_asof_ts"], r["payload"])
        for r in asof_join(left, right, **kw).collect()
    }
    chunked = {
        r["event_id"]: (r["_asof_ts"], r["payload"])
        for r in asof_join_chunked(left, right, chunk="1 day", **kw).collect()
    }
    assert chunked == plain


def test_asof_directions_match_pandas_merge_asof(spark):
    """backward / forward / nearest against pandas.merge_asof on a
    randomized keyed series — the API-parity oracle."""
    import random

    import pandas as pd

    from acorn_hybrid_vector_search_spark.operators.asof import asof_join

    rng = random.Random(4)
    left = [(k, rng.randint(0, 1000)) for k in (1, 2, 3) for _ in range(40)]
    right = [
        (k, rng.randint(0, 1000), f"v{k}_{i}")
        for k in (1, 2, 3)
        for i in range(25)
    ]
    # merge_asof requires unique right timestamps per key for a clean
    # comparison of the payload (our op takes the later-sorted row on
    # exact dupes); dedupe right times per key
    seen = set()
    right = [r for r in right if not (r[:2] in seen or seen.add(r[:2]))]

    ldf = spark.createDataFrame(left, "k long, t long")
    rdf = spark.createDataFrame(right, "k long, rt long, val string")

    lpd = pd.DataFrame(left, columns=["k", "t"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(right, columns=["k", "rt", "val"]).sort_values(
        "rt", kind="stable"
    )

    for direction in ("backward", "forward", "nearest"):
        got = asof_join(
            ldf, rdf, left_on="t", right_on="rt", left_by="k", right_by="k",
            value_cols=["val"], direction=direction,
        )
        got_set = sorted(
            (r["k"], r["t"], r["val"]) for r in got.collect()
        )
        want = pd.merge_asof(
            lpd, rpd, left_on="t", right_on="rt", by="k", direction=direction
        )
        want_set = sorted(
            (int(r.k), int(r.t), None if pd.isna(r.val) else r.val)
            for r in want.itertuples()
        )
        assert got_set == want_set, direction


def test_asof_forward_inclusive_and_nearest_tie(spark):
    from acorn_hybrid_vector_search_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([(1, 10), (1, 15)], "k long, t long")
    rdf = spark.createDataFrame(
        [(1, 10, "at10"), (1, 20, "at20")], "k long, rt long, val string"
    )
    fwd = {
        r["t"]: r["val"]
        for r in asof_join(
            ldf, rdf, left_on="t", right_on="rt", left_by="k", right_by="k",
            value_cols=["val"], direction="forward",
        ).collect()
    }
    assert fwd == {10: "at10", 15: "at20"}  # inclusive at equal ts
    near = {
        r["t"]: r["val"]
        for r in asof_join(
            ldf, rdf, left_on="t", right_on="rt", left_by="k", right_by="k",
            value_cols=["val"], direction="nearest",
        ).collect()
    }
    assert near == {10: "at10", 15: "at10"}  # tie at 15 → backward


def test_asof_nearest_microsecond_ties_modern_epoch(spark):
    """ADVICE r5: nearest-gap arithmetic must be exact integers, not
    cast('double') — at modern epochs (~1.8e9 s) a double's ulp is
    ~0.24 µs, so µs-granularity ties (and 1 µs differences) can
    mis-resolve vs the documented tie-to-backward convention. Sweep a
    range of epoch bases so at least some would round under doubles."""
    from datetime import datetime, timedelta, timezone

    base = datetime(2027, 5, 11, 3, 4, 5, tzinfo=timezone.utc)
    rows_l, rows_r, expect = [], [], {}
    i = 0
    for off_s in range(0, 40):  # 40 distinct anchor instants
        t = base + timedelta(seconds=off_s * 977, microseconds=off_s * 7)
        # exact tie at ±3 µs → backward; and a 1 µs-closer-forward case
        for gap_b_us, gap_f_us, want in ((3, 3, "b"), (4, 3, "f"), (3, 4, "b")):
            i += 1
            rows_l.append((i, i, t))
            rows_r.append((i, t - timedelta(microseconds=gap_b_us), "b"))
            rows_r.append((i, t + timedelta(microseconds=gap_f_us), "f"))
            expect[i] = want
    left = spark.createDataFrame(rows_l, "id long, k long, t timestamp")
    right = spark.createDataFrame(rows_r, "rk long, rt timestamp, v string")
    got = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, left_on="t", right_on="rt", left_by="k",
            right_by="rk", direction="nearest",
        ).collect()
    }
    assert got == expect


def test_asof_nearest_mixed_date_left_timestamp_right(spark):
    """A DATE left_on joined to a TIMESTAMP right_on: the union promotes
    the time axis to timestamp, so the nearest-gap ordinal must be exact
    micros over the PROMOTED type — a day-granular datediff ordinal
    would truncate the right side's time-of-day and pick the farther
    candidate."""
    from datetime import date, datetime, timezone

    left = spark.createDataFrame(
        [(1, 1, date(2024, 1, 2))], "id long, k long, t date"
    )
    # backward candidate 1h before midnight (closer); forward 20h after
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 23, 0, tzinfo=timezone.utc), "b"),
            (1, datetime(2024, 1, 2, 20, 0, tzinfo=timezone.utc), "f"),
        ],
        "rk long, rt timestamp, v string",
    )
    got = asof_join(
        left, right, left_on="t", right_on="rt", left_by="k",
        right_by="rk", direction="nearest",
    ).collect()
    assert len(got) == 1 and got[0]["v"] == "b"


def test_asof_nearest_ntz_dst_independent(spark):
    """TIMESTAMP_NTZ nearest-gap ordinal must NOT route through the
    session timezone (ADVICE r6): under a DST-observing zone the
    wall-clock->instant cast is non-injective at fall-back and gapped at
    spring-forward, skewing nearest/tie resolution by up to an hour.
    Pin: identical results under UTC and America/Los_Angeles across the
    2024-11-03 fall-back and 2024-03-10 spring-forward walls."""
    from datetime import datetime

    left = spark.createDataFrame(
        [
            (1, 1, datetime(2024, 11, 3, 1, 30)),   # inside the repeated hour
            (2, 1, datetime(2024, 3, 10, 2, 30)),   # inside the skipped hour
        ],
        "id long, k long, t timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 11, 3, 1, 0), "b1"),
            (1, datetime(2024, 11, 3, 2, 15), "f1"),   # 45m after -> farther than 30m before
            (1, datetime(2024, 3, 10, 2, 0), "b2"),
            (1, datetime(2024, 3, 10, 3, 15), "f2"),   # 45m after -> farther than 30m before
        ],
        "rk long, rt timestamp_ntz, v string",
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            results[tz] = {
                r["id"]: r["v"]
                for r in asof_join(
                    left, right, left_on="t", right_on="rt", left_by="k",
                    right_by="rk", direction="nearest",
                ).collect()
            }
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert results["UTC"] == {1: "b1", 2: "b2"}
    assert results["America/Los_Angeles"] == results["UTC"]
