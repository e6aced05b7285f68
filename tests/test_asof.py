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
