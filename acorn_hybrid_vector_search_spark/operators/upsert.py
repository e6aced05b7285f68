"""SCD-1 upsert (merge): updates win on key collision, inserts append —
the mutation primitive a parquet-based warehouse needs without a
transactional table format.

Two layers:

- ``merge_upsert``: the pure dataflow — ``base ANTI-JOIN update-keys ∪
  updates``. A CDC/update batch is normally tiny next to the base table,
  so the update-key set is BROADCAST and the anti-join is map-side: the
  base table never shuffles. With multiple updates per key in one batch,
  ``last_wins`` picks the winner by an ordering column first (one
  window over the small updates side only).
- ``upsert_partitioned``: the storage pattern — dynamic partition
  overwrite. Only partitions that actually contain updated keys are
  read, merged, and atomically replaced
  (``spark.sql.sources.partitionOverwriteMode=dynamic``); the other
  99.9% of a 100 TB table is untouched. This is the idiomatic
  no-Delta/Iceberg upsert: rewrite granularity = partition, not table.

Determinism: merge output is a pure function of (base, updates); no
timestamps, no surrogate state. Fully SQL-expressible → DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "cross_partition_moves",
    "last_wins",
    "merge_upsert",
    "upsert_partitioned",
]


def last_wins(
    updates: DataFrame, key_cols: Sequence[str], order_col: str
) -> DataFrame:
    """One row per key from an update batch: highest ``order_col`` wins,
    ties broken arbitrarily-but-deterministically by the remaining sort.
    Window partitions by key over the (small) updates side only."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    *,
    broadcast_updates: bool = True,
) -> DataFrame:
    """SCD-1 merge: every base row whose key appears in ``updates`` is
    replaced by the update row; new keys are appended. Columns must
    match by name (``unionByName``).

    ``broadcast_updates`` (default): broadcast the distinct update-key
    projection so the anti-join never shuffles the base table — the
    right plan whenever the update batch ≪ base. Disable for
    base-scale updates and let AQE pick a shuffle join."""
    keys = updates.select(*key_cols).distinct()
    if broadcast_updates:
        keys = F.broadcast(keys)
    kept = base.join(keys, list(key_cols), "left_anti")
    return kept.unionByName(updates)


def cross_partition_moves(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
) -> DataFrame:
    """Update keys that ALREADY exist in a partition the update batch
    does not touch — the rows ``upsert_partitioned`` would silently
    leave stale (duplicate keys after the merge). Empty ⇔ safe.

    Cost: one scan of the NON-affected partitions projected to
    (key, partition) with the update-key set broadcast into the join —
    map-side, no base shuffle, but still a read of the rest of the
    table; that is why ``upsert_partitioned`` gates it behind
    ``check_moves`` instead of always paying it."""
    affected = [r[0] for r in updates.select(partition_col).distinct().collect()]
    other = (
        spark.read.parquet(base_path)
        .filter(~F.col(partition_col).isin(affected))
        .select(*key_cols, partition_col)
    )
    keys = F.broadcast(updates.select(*key_cols).distinct())
    return other.join(keys, list(key_cols), "left_semi")


def upsert_partitioned(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
    *,
    check_moves: bool = False,
) -> None:
    """Merge ``updates`` into a partitioned parquet table IN PLACE,
    rewriting only the partitions that contain updated keys.

    The updates' distinct partition values prune the base read (partition
    pruning at the scan), and dynamic partition overwrite replaces
    exactly the partitions present in the written result — untouched
    partitions keep their files byte-for-byte. ``updates`` must carry
    ``partition_col``.

    CONTRACT: an update may move a key only within its partition. A
    cross-partition update would leave the stale row in the old
    partition (duplicate keys) — cross-partition moves need a
    delete-vector step this parquet-only primitive does not have.
    Pass ``check_moves=True`` to enforce the contract (raises
    ``ValueError`` with the offending keys; costs one projected scan of
    the non-affected partitions), or call ``cross_partition_moves``
    yourself where the batch's provenance already guarantees it."""
    if check_moves:
        moved = cross_partition_moves(
            spark, base_path, updates, key_cols, partition_col
        ).limit(5).collect()
        if moved:
            raise ValueError(
                "cross-partition key moves would leave stale duplicates: "
                + ", ".join(str(tuple(r)) for r in moved)
            )
    affected = [r[0] for r in updates.select(partition_col).distinct().collect()]
    base = spark.read.parquet(base_path).filter(
        F.col(partition_col).isin(affected)
    )
    merged = merge_upsert(base, updates, key_cols)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(base_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
