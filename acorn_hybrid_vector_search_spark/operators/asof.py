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

from pyspark.sql import Column, DataFrame
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
    direction: str = "backward",
) -> DataFrame:
    """For each ``left`` row, attach the columns of the matching
    ``right`` row within the same ``by`` group:

    - ``backward`` (default): greatest ``right_on`` ≤ ``left_on``
      (ties on the timestamp: the right row sorts first, so it IS
      visible to an equal-timestamp left row — the pandas
      ``merge_asof`` convention);
    - ``forward``: smallest ``right_on`` ≥ ``left_on`` (inclusive,
      pandas convention) — one union + ONE window scanning the
      following frame, the mirror plan;
    - ``nearest``: whichever of the two is closer in absolute time
      (ties → backward, the pandas convention). Both candidate windows
      run over the SAME merged relation — one shuffle on the key,
      two window passes, no extra join.

    value_cols: right columns to carry (default: all but key/time).
    tolerance_expr: optional Column over the joined row, evaluated while
    the match is still nested in the ``_match`` struct (e.g.
    ``F.col("_match._asof_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")``)
    applied AFTER the match; misses become NULLs, rows are kept.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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

    # backward: right rows sort BEFORE equal-ts left rows (side 0 < 1
    # asc) so last() over the preceding frame sees them; forward: right
    # rows sort AFTER equal-ts left rows (side desc) so first() over
    # the following frame sees them — inclusive semantics both ways.
    w_back = (
        Window.partitionBy(left_by)
        .orderBy(F.col(left_on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(left_by)
        .orderBy(F.col(left_on).asc(), F.col("_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        out = merged.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w_back))
    elif direction == "forward":
        out = merged.withColumn("_match", F.first("_rpay", ignorenulls=True).over(w_fwd))
    else:
        bwd = F.last("_rpay", ignorenulls=True).over(w_back)
        fwd = F.first("_rpay", ignorenulls=True).over(w_fwd)
        # exact gap arithmetic (ADVICE r5): a double's ulp at modern
        # epochs (~1.8e9 s) is ~0.24 µs, so cast('double') can
        # mis-resolve microsecond ties against the documented
        # tie-to-backward convention. Timestamps → epoch micros
        # (exact long), dates → epoch days; numeric on-columns
        # subtract in their own type.
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        # resolve the ordinal from the UNION-promoted type, not the left
        # frame's declared type: a DATE left_on against a TIMESTAMP
        # right_on promotes to timestamp in the merged frame, and a
        # day-granular datediff ordinal would truncate the right side's
        # time-of-day (nearest could then pick the farther candidate)
        on_type = merged.schema[left_on].dataType
        if isinstance(on_type, TimestampNTZType):
            # NTZ ordinal WITHOUT a session-timezone cast (ADVICE r6):
            # cast(ntz as timestamp) maps wall-clock→instant through the
            # session zone, which in a DST zone is non-injective
            # (fall-back) and gapped (spring-forward) — nearest/tie
            # resolution could be off by an hour near transitions.
            # Derive epoch micros from the NTZ fields directly: NTZ is a
            # zoneless linear wall clock, so days*86400e6 + time-of-day
            # micros IS its exact ordinal (date_part SECOND is
            # DECIMAL(8,6) — microsecond-exact after *1e6).
            def _ord(c: Column) -> Column:
                days = F.datediff(
                    F.to_date(c), F.to_date(F.lit("1970-01-01"))
                ).cast("long")
                micros = (
                    F.hour(c).cast("long") * F.lit(3600000000).cast("long")
                    + F.minute(c).cast("long") * F.lit(60000000).cast("long")
                    + (F.date_part(F.lit("SECOND"), c) * 1000000).cast("long")
                )
                return days * F.lit(86400000000).cast("long") + micros
        elif isinstance(on_type, TimestampType):
            def _ord(c: Column) -> Column:
                return F.unix_micros(c)
        elif isinstance(on_type, DateType):
            def _ord(c: Column) -> Column:
                return F.datediff(c, F.to_date(F.lit("1970-01-01")))
        else:
            def _ord(c: Column) -> Column:
                return c
        gap_b = _ord(F.col(left_on)) - _ord(F.col("_b._asof_ts"))
        gap_f = _ord(F.col("_f._asof_ts")) - _ord(F.col(left_on))
        out = (
            merged.withColumn("_b", bwd)
            .withColumn("_f", fwd)
            .withColumn(
                "_match",
                F.when(F.col("_b").isNull(), F.col("_f"))
                .when(F.col("_f").isNull(), F.col("_b"))
                # tie → backward (pandas convention)
                .when(gap_b <= gap_f, F.col("_b"))
                .otherwise(F.col("_f")),
            )
            .drop("_b", "_f")
        )
    out = out.filter(F.col("_side") == 1)
    if tolerance_expr is not None:
        out = out.withColumn(
            "_match", F.when(tolerance_expr, F.col("_match"))
        )
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"_match.{c}").alias(c) for c in ["_asof_ts", *value_cols]]
    )


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    value_cols: Sequence[str] | None = None,
    chunk: str = "1 day",
) -> DataFrame:
    """``asof_join`` for SKEWED keys: same semantics, but the per-key
    serial work drops from O(rows of the hottest key) to O(time chunks).

    The plain union+window shape serializes each key's entire history in
    one task — the documented hot-key caveat. Here time is cut into
    ``chunk``-wide buckets and the window partitions on (key, chunk), so
    a hot key's rows spread over as many tasks as it spans chunks. Rows
    in earlier chunks are made visible through a CARRY-IN: per (key,
    chunk) the last right payload is aggregated (map-side partial
    max_by), a chunk-granular running-last per key computes what each
    left chunk inherits from strictly-earlier chunks (that window's
    partition holds only #chunks rows per key — the whole point), and
    the carry is injected as a pseudo-row ordered before everything in
    its chunk.

    Requires unique (key, ts) pairs on the right (same caveat as
    ``asof_join``, where duplicate timestamps make "latest" ambiguous).
    Choose ``chunk`` so a hot key's densest chunk fits a task.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (right_on, right_by)]

    rt = right.select(
        F.col(right_by).alias(left_by),
        F.col(right_on).alias(left_on),
        F.struct(
            F.col(right_on).alias("_asof_ts"), *[F.col(c) for c in value_cols]
        ).alias("_rpay"),
    )
    pay_t = rt.schema["_rpay"].dataType
    ck = F.window(F.col(left_on).cast("timestamp"), chunk)["start"]

    # phase 1 — chunk-granular carry: last right payload per (key, chunk),
    # then "last strictly-earlier chunk" for every left chunk. Rights sort
    # AFTER lefts within the same chunk (side 1 vs 0) so a left chunk
    # never inherits its own chunk's rights (those join in phase 2).
    r_chunk = (
        rt.withColumn("_ck", ck)
        .groupBy(left_by, "_ck")
        .agg(F.max_by("_rpay", F.col("_rpay._asof_ts")).alias("_pay"))
        .withColumn("_cside", F.lit(1))
    )
    l_chunk = (
        left.select(left_by, ck.alias("_ck"))
        .distinct()
        .withColumn("_pay", F.lit(None).cast(pay_t))
        .withColumn("_cside", F.lit(0))
    )
    wc = (
        Window.partitionBy(left_by)
        .orderBy(F.col("_ck").asc(), F.col("_cside").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        r_chunk.unionByName(l_chunk)
        .withColumn("_carry", F.last("_pay", ignorenulls=True).over(wc))
        .filter((F.col("_cside") == 0) & F.col("_carry").isNotNull())
        .select(left_by, "_ck", "_carry")
    )

    # phase 2 — per-(key, chunk) merge: carry pseudo-row (_side −1, chunk
    # start) < rights (0) < lefts (1) at equal order key.
    def _pad(df: DataFrame, pay: Column, side: int, ots: Column) -> DataFrame:
        return df.select(
            *[
                F.col(c) if c in (left_by,) else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
            ],
            pay.alias("_rpay"),
            F.lit(side).alias("_side"),
            ots.alias("_ots"),
            "_ck",
        )

    lt = left.withColumn("_ck", ck).select(
        *left.columns,
        F.lit(None).cast(pay_t).alias("_rpay"),
        F.lit(1).alias("_side"),
        F.col(left_on).cast("timestamp").alias("_ots"),
        "_ck",
    )
    rrows = _pad(
        rt.withColumn("_ck", ck),
        F.col("_rpay"),
        0,
        F.col(left_on).cast("timestamp"),
    )
    crows = _pad(carry, F.col("_carry"), -1, F.col("_ck"))

    w2 = (
        Window.partitionBy(left_by, "_ck")
        .orderBy(F.col("_ots").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        lt.unionByName(rrows)
        .unionByName(crows)
        .withColumn("_match", F.last("_rpay", ignorenulls=True).over(w2))
        .filter(F.col("_side") == 1)
    )
    return out.select(
        *left.columns,
        *[F.col(f"_match.{c}").alias(c) for c in ["_asof_ts", *value_cols]],
    )
