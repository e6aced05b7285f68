"""Loaders for the driver-generated parquet testdata (TESTDATA.md).

Replaces the reference's .npy load path (S4,
/root/reference/pre-filter.py:17-21) with Parquet scans — columnar,
splittable, predicate-pushdown-capable, the format the engine persists
everything in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Opt-in hot-input mode (SPARK_GRAFT_CACHE_INPUTS=1): memoize + cache each
# base table per (session, sf_dir). bench.py enables it so query timings
# measure compute over resident data — the reference's own numbers are
# taken over in-memory NumPy arrays after load (BASELINE.md), so this is
# the comparable setting. Correctness runs (driver, selfcheck, tests)
# leave it off: plans there keep their parquet scans + pushdown.
_HOT_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_hot_cache() -> None:
    """Unpersist and drop every hot-cached base table (r15, VERDICT r14
    item 1: the bench's uncached first-execution probe resets every
    session cache so the probed run computes from the parquet inputs)."""
    for df in _HOT_CACHE.values():
        try:
            df.unpersist()
        except Exception:  # owning session already stopped
            pass
    _HOT_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if os.environ.get("SPARK_GRAFT_CACHE_INPUTS") == "1":
        key = (spark.sparkContext.applicationId, sf_dir, name)
        if key not in _HOT_CACHE:
            raw = _load_table(spark, sf_dir, name)
            # local parquet arrives in row-group-sized splits (e.g. 600k
            # rows in 3 partitions) — cache at cluster parallelism so hot
            # queries use every core, but never shatter tiny dims into
            # empty partitions. The floor is 256 rows/partition, NOT tens
            # of thousands: per-row cost varies 100× across queries (a
            # regex-tokenization pass over 5k documents is ~2.5 s on one
            # core), and a few hundred rows per task already amortizes
            # task overhead (~ms) while letting expensive expressions use
            # the whole machine.
            n = raw.count()
            target = max(1, min(spark.sparkContext.defaultParallelism, n // 256))
            df = raw.repartition(target).cache()
            df.count()  # materialize outside the timed region
            _HOT_CACHE[key] = df
        return _HOT_CACHE[key]
    return _load_table(spark, sf_dir, name)


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown testdata table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS) (rejected without this
        # runtime-settable legacy conf) and as naive TIMESTAMP(MICROS);
        # handle both regardless of who built the session (the driver
        # harness uses its own). Pin UTC so every normalization below is
        # wall-clock-preserving and host-timezone-independent.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Normalize ts to a microsecond TIMESTAMP (ltz) so downstream
    # windowing/watermark/unix_millis code sees the one timestamp type they
    # all accept (watermarks reject TIMESTAMP_NTZ outright). DuckDB reads
    # the same column as naive TIMESTAMP; under the UTC session both
    # engines see identical wall-clock values.
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            # TIMESTAMP(NANOS) via nanosAsLong: integer div, not `/1000` +
            # cast — epoch-nanos (~1.7e18) exceed double's 2^53 integer
            # range, so float division is off by ±1 µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            # naive micros: NTZ→LTZ cast interprets the wall clock in the
            # session timezone (pinned UTC above) — value-preserving
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
