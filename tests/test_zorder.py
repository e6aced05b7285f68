"""Z-order layout (plans/zorder.py): bit-parity with a Python Morton
reference, locality, and the partition-pruning payoff of zorder_write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.plans.zorder import (
    morton_py as _py_morton,
    z_box_bucket_filter,
    z_value,
    zorder_write,
)


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(x, y) for x in range(64) for y in range(64)]
    return spark.createDataFrame(rows, "x long, y long").cache()


def test_bit_parity_with_python(spark, grid):
    got = grid.select("x", "y", z_value("x", "y", bits=8).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x"], r["y"], 8), (r["x"], r["y"])


def test_z_locality_beats_linear(spark, grid):
    """Split the z-sorted grid into 16 equal chunks: the per-chunk
    bounding boxes must be bounded in BOTH dims (each side ≤ half the
    domain), which a linear (x, y) sort cannot achieve for y."""
    rows = sorted(
        grid.select("x", "y", z_value("x", "y", bits=8).alias("z")).collect(),
        key=lambda r: r["z"],
    )
    n = len(rows) // 16
    for c in range(16):
        chunk = rows[c * n : (c + 1) * n]
        xs = [r["x"] for r in chunk]
        ys = [r["y"] for r in chunk]
        assert max(xs) - min(xs) <= 32 and max(ys) - min(ys) <= 32

    lin = sorted(rows, key=lambda r: (r["x"], r["y"]))
    worst_y = 0
    for c in range(16):
        chunk = lin[c * n : (c + 1) * n]
        ys = [r["y"] for r in chunk]
        worst_y = max(worst_y, max(ys) - min(ys))
    assert worst_y == 63  # linear layout spans the full y domain


def test_zorder_write_prunes_partitions_for_box_query(spark, grid, tmp_path):
    path = str(tmp_path / "ztab")
    zorder_write(grid, path, "x", "y", bits=8, bucket_shift=8)
    t = spark.read.parquet(path)
    assert t.count() == 64 * 64

    n_parts = t.select("z_bucket").distinct().count()
    assert n_parts >= 4  # layout actually produced multiple prunable buckets

    bucket_pred = z_box_bucket_filter(0, 7, 0, 7, bits=8, bucket_shift=8)
    box = t.where(bucket_pred & (F.col("x") < 8) & (F.col("y") < 8))
    assert box.count() == 64  # pruning is conservative: no rows lost
    plan = box._jdf.queryExecution().executedPlan().toString()
    # directory-level pruning engages on the partition column…
    import re

    m = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert m and "z_bucket" in m.group(1), plan[:400]
    # …and the box's corner-bounded z-range touches ONE bucket here
    assert (
        box.select("z_bucket").distinct().count()
        < n_parts
    )
