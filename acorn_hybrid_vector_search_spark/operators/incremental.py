"""Incremental aggregate maintenance: mergeable rollups.

A 100 TB fact table's daily rollup should never be recomputed from
scratch — keep the aggregate in MERGEABLE form (per-key decimal SUMs and
COUNTs, the classic commutative-monoid partials) and fold each new batch
in:

    rollup(base ∪ delta) == merge(rollup(base), rollup(delta))

That identity is the whole design: ``mergeable_rollup`` produces the
partial form (decimal-exact sums so merge order can never drift the
result), ``merge_rollups`` folds any number of partials with one
groupBy, and derived, non-mergeable measures (avg) are computed at READ
time from the partials. The merge's shuffle is keyed on the rollup key —
aggregate-cardinality data, not fact-table data; the delta batch is the
only fact-scale scan each maintenance cycle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mergeable_rollup", "merge_rollups", "with_derived_avg"]


def mergeable_rollup(
    df: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Per-key partial aggregate: ``n`` (count) plus ``sum_<c>`` for each
    measure, summed as DECIMAL(24,6) so the partials are exact and any
    merge order reproduces identical bytes."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.col(c).cast("decimal(24,6)")).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    partials: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Fold partial rollups (same schema) into one: union + one groupBy
    summing counts and decimal sums. Associative and commutative — batch
    order is irrelevant."""
    if not partials:
        raise ValueError("partials must be non-empty")
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    sum_cols = [c for c in u.columns if c.startswith("sum_")]
    aggs = [F.sum("n").alias("n")] + [
        F.sum(c).cast("decimal(24,6)").alias(c) for c in sum_cols
    ]
    return u.groupBy(*keys).agg(*aggs)


def with_derived_avg(rollup: DataFrame, measure: str) -> DataFrame:
    """Read-time derived mean for one measure: avg is NOT mergeable, so
    it is never stored — always derived from (sum, n)."""
    return rollup.withColumn(
        f"avg_{measure}",
        F.round((F.col(f"sum_{measure}") / F.col("n")).cast("double"), 6),
    )
