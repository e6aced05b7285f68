"""Small-file compaction (plans/compact.py): fragmentation detection,
row preservation, file-count reduction, untouched-partition bytes."""

from __future__ import annotations

import os

import pytest

from acorn_hybrid_vector_search_spark.plans.compact import (
    compact_partitioned,
    fragmented_partitions,
    list_partition_files,
)


@pytest.fixture()
def table(spark, tmp_path):
    """p=0 and p=1 fragmented (8 files each), p=2 healthy (1 file)."""
    path = str(tmp_path / "tbl")
    rows = [(k, f"v{k}", k % 3) for k in range(3000)]
    df = spark.createDataFrame(rows, "k long, v string, p long")
    for p in (0, 1):
        df.where(f"p = {p}").repartition(8).write.mode("append").partitionBy(
            "p"
        ).parquet(path)
    df.where("p = 2").coalesce(1).write.mode("append").partitionBy("p").parquet(path)
    return path, df


def _files(path, part):
    d = os.path.join(path, part)
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def test_listing_and_fragmentation_detection(spark, table):
    path, _ = table
    listing = list_partition_files(spark, path, "p")
    assert listing["0"][0] == 8 and listing["1"][0] == 8 and listing["2"][0] == 1
    # huge target ⇒ every fragmented partition should become 1 file
    frag = fragmented_partitions(spark, path, "p", target_bytes=1 << 30)
    assert frag == {"0": 1, "1": 1}


def test_compact_preserves_rows_and_reduces_files(spark, table):
    path, df = table
    before = sorted((r["k"], r["v"], r["p"]) for r in spark.read.parquet(path).collect())
    healthy = _files(path, "p=2")
    mtimes = {f: os.path.getmtime(os.path.join(path, "p=2", f)) for f in healthy}

    done = compact_partitioned(spark, path, "p", target_bytes=1 << 30)
    assert done == {"0": 1, "1": 1}

    after = sorted((r["k"], r["v"], r["p"]) for r in spark.read.parquet(path).collect())
    assert after == before  # pure re-bucketing of bytes
    assert len(_files(path, "p=0")) == 1 and len(_files(path, "p=1")) == 1
    # healthy partition byte-untouched
    assert _files(path, "p=2") == healthy
    for f in healthy:
        assert os.path.getmtime(os.path.join(path, "p=2", f)) == mtimes[f]
    # second pass: nothing left to do (idempotent)
    assert compact_partitioned(spark, path, "p", target_bytes=1 << 30) == {}


def test_compact_escaped_partition_values(spark, tmp_path):
    """Regression (round-3 advisor): a partition value needing Hive
    dir-name escaping (here ':' → %3A) was read back escaped, matched 0
    rows against the unescaped column, and compact silently rewrote
    nothing while reporting the partition compacted. It must now be
    listed unescaped, actually compacted, and row-preserved."""
    path = str(tmp_path / "tbl")
    rows = [(k, f"a:b{k % 2}") for k in range(400)]
    df = spark.createDataFrame(rows, "k long, p string")
    df.repartition(6).write.mode("append").partitionBy("p").parquet(path)

    listing = list_partition_files(spark, path, "p")
    assert set(listing) == {"a:b0", "a:b1"}  # unescaped values

    before = sorted((r["k"], r["p"]) for r in spark.read.parquet(path).collect())
    done = compact_partitioned(spark, path, "p", target_bytes=1 << 30)
    assert set(done) == {"a:b0", "a:b1"}
    after_listing = list_partition_files(spark, path, "p")
    assert all(n == 1 for n, _ in after_listing.values())  # really rewritten
    after = sorted((r["k"], r["p"]) for r in spark.read.parquet(path).collect())
    assert after == before


def test_compact_respects_target_file_count(spark, table):
    path, _ = table
    # pick a target that wants ~2 files for p=0
    total = list_partition_files(spark, path, "p")["0"][1]
    frag = fragmented_partitions(spark, path, "p", target_bytes=total // 2 + 1)
    assert frag["0"] == 2
    compact_partitioned(spark, path, "p", target_bytes=total // 2 + 1)
    assert len(_files(path, "p=0")) == 2
