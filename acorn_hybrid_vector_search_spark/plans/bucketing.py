"""Bucketed-table co-located joins: the at-rest answer to repeated
shuffles on the same key.

Not in the reference (its one join is J1, computed once); this is the
standard warehouse technique the engine exposes for 100 TB fact tables
that are joined on the same key query after query: persist both sides
bucketed (and sorted) BY that key into the same bucket count, and every
subsequent equi-join on it is planned as a SortMergeJoin with NO Exchange
on either side — the shuffle was paid once at write time, never at read
time. Bucket pruning additionally skips files for per-key point lookups.

Bucketing requires the table catalog (``saveAsTable``): bucket metadata
lives in the catalog, not in the parquet files. Pass ``path`` to keep the
data external at a location you control.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) catalog table.

    Joins between two tables bucketed on the same columns into the same
    ``n_buckets`` are Exchange-free; sorting within buckets additionally
    removes the Sort from the merge join. At 100 TB pick ``n_buckets`` so
    each bucket file stays in the hundreds-of-MB range per partition of
    the writing job (`n_files = n_buckets × write_tasks` — repartition by
    the bucket columns first to get one file per bucket).
    """
    w = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .mode("overwrite")
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
