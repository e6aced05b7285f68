"""Small-file compaction — the OPTIMIZE-style maintenance primitive a
parquet warehouse needs under streaming ingest.

Append-mode streaming sinks (streaming/pipeline.py::ingest_to_parquet)
and frequent upserts (operators/upsert.py) accumulate many small files
per partition; at 100 TB that decays scan performance (per-file open
cost, tiny row groups defeat columnar encoding + pushdown) and bloats
the file index. Compaction rewrites ONLY fragmented partitions into
~``target_bytes`` files, leaving healthy partitions byte-untouched —
the same partition-scoped rewrite discipline as ``upsert_partitioned``.

Not in the reference (it has no storage maintenance at all — it rebuilds
its index per run, SURVEY.md §4 "Index persistence"); this is a charter
extension for the training-data warehouse.

Scale notes: partition discovery is a driver-side METADATA listing
(Hadoop FileSystem API — O(files) names/sizes, no data read); each
fragmented partition is rewritten by its own partition-pruned job
(read one partition → coalesce → dynamic-overwrite that partition), so
a compaction pass is incremental, restartable per partition, and never
holds more than one partition's data in flight. Shard the partition
list across maintenance runs for very large tables.
"""

from __future__ import annotations

import math
import urllib.parse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["list_partition_files", "fragmented_partitions", "compact_partitioned"]


def list_partition_files(
    spark: SparkSession, path: str, partition_col: str
) -> dict[str, tuple[int, int]]:
    """Hive-style partition dirs under ``path`` → (n_files, total_bytes).
    Metadata-only (FileSystem.listStatus); works on any Hadoop FS."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out: dict[str, tuple[int, int]] = {}
    prefix = f"{partition_col}="
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith(prefix):
            continue
        n, total = 0, 0
        for f in fs.listStatus(st.getPath()):
            if f.isFile() and f.getPath().getName().endswith(".parquet"):
                n += 1
                total += f.getLen()
        # Hive escapes special path chars (':', ' ', '/', '%', …) as %XX
        # in partition dir names (ExternalCatalogUtils.escapePathName);
        # unquote is its inverse, so the value compares equal to the
        # column's cast-to-string rendering (e.g. timestamps).
        out[urllib.parse.unquote(name[len(prefix):])] = (n, total)
    return out


def fragmented_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    *,
    target_bytes: int = 128 << 20,
    min_files: int = 2,
) -> dict[str, int]:
    """Partition values worth compacting → their target file count.

    A partition is fragmented when it holds ≥ ``min_files`` files AND
    more files than ``ceil(total_bytes / target_bytes)`` (i.e. its files
    are materially smaller than the target). NULL partitions
    (``__HIVE_DEFAULT_PARTITION__``) are skipped — their value can't be
    round-tripped through a filter comparison."""
    out: dict[str, int] = {}
    for value, (n, total) in list_partition_files(spark, path, partition_col).items():
        if value == "__HIVE_DEFAULT_PARTITION__":
            continue
        want = max(1, math.ceil(total / target_bytes))
        if n >= min_files and n > want:
            out[value] = want
    return out


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_col: str,
    *,
    target_bytes: int = 128 << 20,
    min_files: int = 2,
) -> dict[str, int]:
    """Rewrite each fragmented partition of a Hive-partitioned parquet
    table into its target file count. Returns {partition value: files
    written}. Rows are preserved exactly (pure re-bucketing of bytes);
    untouched partitions keep their files byte-for-byte.

    One partition-pruned job per fragmented partition: the scan reads
    only that partition (PartitionFilters), the rows are MATERIALIZED
    (localCheckpoint) before the write — never overwrite a directory a
    lazy plan still reads from, and the dynamic-overwrite mid-commit
    window no longer races the scan — then ``coalesce`` (no shuffle —
    narrow merge of splits) packs them into the target file count and
    dynamic partition overwrite replaces just that partition dir.

    Two guards make a silent no-op impossible (a value that failed to
    round-trip through dir-name escaping used to match 0 rows and
    "compact" nothing): the pruned read must return rows, and the
    post-compaction file listing must show ≤ the target count."""
    todo = fragmented_partitions(
        spark, path, partition_col, target_bytes=target_bytes, min_files=min_files
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for value, n_files in todo.items():
            part = (
                spark.read.parquet(path)
                .where(F.col(partition_col).cast("string") == value)
                .localCheckpoint(eager=True)
            )
            if not part.take(1):
                raise RuntimeError(
                    f"compact_partitioned: {partition_col}={value!r} matched "
                    "0 rows — the partition value did not round-trip from "
                    "its directory name; refusing a silent no-op rewrite"
                )
            (
                part.coalesce(n_files)
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = list_partition_files(spark, path, partition_col)
    for value, want in todo.items():
        now = after.get(value, (0, 0))[0]
        if now > want:
            raise RuntimeError(
                f"compact_partitioned: {partition_col}={value!r} still has "
                f"{now} files (target {want}) — rewrite did not take effect"
            )
    return todo
