"""Data validation (operators/validate.py): report correctness,
NULL-as-violation semantics, dead-letter split, single-scan plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.validate import enforce, validate


@pytest.fixture(scope="module")
def rows(spark):
    data = [
        (0, 10.0, "a"),
        (1, -5.0, "b"),   # negative value
        (2, 3.0, None),   # null name
        (3, None, "d"),   # null value → NULL predicate → violation
        (4, 99.0, "e"),
    ]
    return spark.createDataFrame(data, "id long, v double, name string")


RULES = lambda: {  # noqa: E731
    "v_non_negative": F.col("v") >= 0,
    "name_present": F.col("name").isNotNull(),
    "id_unique_range": F.col("id").between(0, 100),
}


def test_report_counts(spark, rows):
    rep = {r["rule"]: r for r in validate(rows, RULES()).collect()}
    assert rep["v_non_negative"]["n_violations"] == 2  # -5 and NULL
    assert rep["name_present"]["n_violations"] == 1
    assert rep["id_unique_range"]["n_violations"] == 0
    assert rep["id_unique_range"]["pass"] is True
    assert all(r["n_checked"] == 5 for r in rep.values())


def test_enforce_split_and_bitmap(spark, rows):
    valid, quar = enforce(rows, RULES())
    assert {r["id"] for r in valid.collect()} == {0, 4}
    q = {r["id"]: set(r["_failed_rules"]) for r in quar.collect()}
    assert q[1] == {"v_non_negative"}
    assert q[2] == {"name_present"}
    assert q[3] == {"v_non_negative"}
    # split is a partition of the input
    assert valid.count() + quar.count() == rows.count()
    assert valid.columns == rows.columns


def test_single_scan_no_shuffle(spark, rows):
    plan = validate(rows, RULES())._jdf.queryExecution().executedPlan().toString()
    # one global reduce per branch, never a hashpartitioning of row data
    assert "Exchange hashpartitioning" not in plan


def test_empty_rules_rejected(spark, rows):
    with pytest.raises(ValueError):
        validate(rows, {})
