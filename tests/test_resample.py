"""Gap-filling resample (operators/resample.py): dense spine bounds,
zero/custom fill, per-key independence."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.resample import (
    dense_time_grid,
    resample_fill,
)


@pytest.fixture(scope="module")
def rolled(spark):
    rows = [
        # key "a": hours 0, 3 observed → grid 0,1,2,3
        ("a", datetime(2024, 1, 1, 0), 5, 10.0),
        ("a", datetime(2024, 1, 1, 3), 2, 4.0),
        # key "b": single hour → grid is just that hour
        ("b", datetime(2024, 1, 2, 7), 1, 1.5),
    ]
    return spark.createDataFrame(
        rows, "k string, window_start timestamp, n long, total double"
    )


def test_grid_spans_min_to_max_per_key(spark, rolled):
    grid = dense_time_grid(rolled, ["k"], "window_start").collect()
    a_hours = sorted(r["window_start"].hour for r in grid if r["k"] == "a")
    assert a_hours == [0, 1, 2, 3]
    assert sum(1 for r in grid if r["k"] == "b") == 1


def test_fill_values_and_observed_rows_kept(spark, rolled):
    out = {
        (r["k"], r["window_start"].hour): (r["n"], r["total"])
        for r in resample_fill(
            rolled, ["k"], "window_start", fill={"total": -1.0}
        ).collect()
    }
    assert out[("a", 0)] == (5, 10.0) and out[("a", 3)] == (2, 4.0)
    # gaps: n defaults to 0, total takes the explicit fill
    assert out[("a", 1)] == (0, -1.0) and out[("a", 2)] == (0, -1.0)
    assert out[("b", 7)] == (1, 1.5)
    assert len(out) == 5


def test_custom_step(spark, rolled):
    grid = dense_time_grid(
        rolled.where("k = 'a'"), ["k"], "window_start", step="3 hours"
    ).collect()
    assert sorted(r["window_start"].hour for r in grid) == [0, 3]
