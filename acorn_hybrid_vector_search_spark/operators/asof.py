"""As-of join — "for each left row, the latest right row at or before it".

Not in the reference (SURVEY.md §2.1 — no general joins beyond its J1
correlation join); this is the charter's canonical example of an operator
Spark lacks as a primitive, expressed as a composition of built-ins:

    tag both sides → union → window(partition key ORDER BY ts, side)
    → last(right cols, ignoreNulls) → keep left rows

One shuffle on the join key (the window's partitioning), no range
explosion, no per-row probing: the classic distributed merge-asof shape.
Skew caveat: a hot key serializes its window partition — pre-split hot
keys (salt + per-salt asof + min) if a key's row count exceeds a task.

DuckDB's native ``ASOF JOIN`` provides the oracle for the driver check.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    value_cols: Sequence[str] | None = None,
    tolerance_expr=None,
) -> DataFrame:
    """For each ``left`` row, attach the columns of the ``right`` row with
    the greatest ``right_on`` ≤ ``left_on`` within the same ``by`` group
    (ties on the timestamp: the right row sorts first, so it IS visible to
    an equal-timestamp left row — the pandas ``merge_asof`` convention).

    value_cols: right columns to carry (default: all but key/time).
    tolerance_expr: optional Column over the joined row, evaluated while
    the match is still nested in the ``_match`` struct (e.g.
    ``F.col("_match._asof_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")``)
    applied AFTER the match; misses become NULLs, rows are kept.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (right_on, right_by)]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        F.col(right_by).alias(left_by),
        F.col(right_on).alias(left_on),
        F.struct(
            F.col(right_on).alias("_asof_ts"), *[F.col(c) for c in value_cols]
        ).alias("_rpay"),
    ).withColumn("_side", F.lit(0))

    merged = lt.select(
        *[F.col(c) for c in left.columns], F.lit(None).cast(rt.schema["_rpay"].dataType).alias("_rpay"), "_side"
    ).unionByName(
        rt.select(
            *[
                F.col(c) if c in (left_by, left_on) else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
            ],
            "_rpay",
            "_side",
        )
    )

    w = (
        Window.partitionBy(left_by)
        .orderBy(F.col(left_on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance_expr is not None:
        out = out.withColumn(
            "_match", F.when(tolerance_expr, F.col("_match"))
        )
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"_match.{c}").alias(c) for c in ["_asof_ts", *value_cols]]
    )
