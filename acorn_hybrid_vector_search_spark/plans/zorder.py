"""Z-order (Morton) layout: interleave the bits of two columns so ONE
sort/partition key preserves locality in BOTH dimensions — the classic
data-skipping layout for 2-D range queries (user × time, tenant × date).

Why it matters at 100 TB: parquet prunes row groups / partitions by
min-max stats on the SORT key. A linear sort on (a, b) gives perfect
pruning on ``a`` and none on ``b``; the Morton curve bounds the span of
BOTH coordinates inside each partition, so a box predicate
``a BETWEEN … AND b BETWEEN …`` skips most of the table on either
dimension. All pure bit arithmetic in whole-stage codegen, and fully
portable to a SQL oracle (shift/and/or are engine-exact).

``z_value`` interleaves the low ``bits`` of two non-negative ints
(caller maps domains onto ints first — ids, hour indexes, quantile
ranks). ``zorder_write`` materializes the layout: coarse z-bucket as a
PARTITION column (directory-level pruning via PartitionFilters) and a
range-partitioned sort on the full z inside (row-group-level min-max).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "zorder_write", "morton_py", "z_box_bucket_filter"]


def z_value(a: Column | str, b: Column | str, *, bits: int = 16) -> Column:
    """Morton code of the low ``bits`` of two non-negative ints: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1. 2·bits ≤ 62."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError("bits must be in [1, 31]")
    a = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    b = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def morton_py(a: int, b: int, bits: int = 16) -> int:
    """Python reference of ``z_value`` (query planning + tests)."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def z_box_bucket_filter(
    a_min: int,
    a_max: int,
    b_min: int,
    b_max: int,
    *,
    bits: int = 16,
    bucket_shift: int = 24,
    bucket_col: str = "z_bucket",
) -> Column:
    """Conservative z-bucket predicate for an axis-aligned box: Morton
    codes are monotone under the componentwise partial order, so every
    point in the box has z between the codes of the (min, min) and
    (max, max) corners. The interval may admit false-positive buckets
    (curve excursions) — pruning stays correct, just not tight; the
    residual row filter removes the excursions."""
    lo = morton_py(a_min, b_min, bits) >> bucket_shift
    hi = morton_py(a_max, b_max, bits) >> bucket_shift
    return F.col(bucket_col).between(lo, hi)


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    bits: int = 16,
    bucket_shift: int = 24,
    z_col: str = "_z",
) -> None:
    """Persist ``df`` in Z-order on (col_a, col_b):

    - ``z-bucket`` (= z >> bucket_shift) becomes a PARTITION directory —
      a 2-D box predicate on (col_a, col_b) implies a z-range, which
      prunes whole directories via PartitionFilters;
    - rows are range-partitioned and sorted by the full z inside, so
      parquet row-group min-max stats on col_a/col_b stay tight for
      finer skipping.
    """
    z = z_value(col_a, col_b, bits=bits)
    out = df.withColumn(z_col, z).withColumn(
        "z_bucket", F.shiftright(F.col(z_col), bucket_shift)
    )
    (
        out.repartitionByRange("z_bucket", z_col)
        .sortWithinPartitions(z_col)
        .drop(z_col)
        .write.mode("overwrite")
        .partitionBy("z_bucket")
        .parquet(path)
    )
