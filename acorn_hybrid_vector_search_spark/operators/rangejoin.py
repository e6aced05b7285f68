"""Range (interval) join: match point rows to interval rows with
``start <= point_ts < end`` — without a cartesian product.

The naive plan for a pure inequality join is BroadcastNestedLoopJoin
(O(|points| x |intervals|)), which is the classic 100 TB scale-killer for
time-range correlation (events-in-incident-windows, sensor-in-maintenance-
window, trade-in-quote-validity). The scale-safe shape used here is
time-chunk bucketing, the same trick engines with native range joins
(e.g. interval-join implementations in stream processors) use:

1. pick a chunk width W (ideally ~ the typical interval span);
2. each point maps to exactly one chunk: floor(epoch(ts) / W);
3. each interval is replicated to every chunk it overlaps
   (``sequence(chunk(start), chunk(end))`` + ``explode`` — replication
   factor is span/W + 1, bounded and chosen by the caller);
4. equi-join on the chunk id (plus any optional equi-keys), then apply
   the exact containment predicate as a post-join filter.

The join is now a plain shuffle/broadcast hash join on a high-cardinality
key, Catalyst picks the physical strategy, and AQE's skew-join splitting
handles bursty chunks. Cost is O(|points| + |intervals| * repl + |output|).

The reference has no temporal operators at all (SURVEY.md §2.1); this is
a charter extension (range join is named alongside as-of join as an
operator a training-data/analytics pipeline needs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: Sequence[str] = (),
    chunk: str = "5 minutes",
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` where the point timestamp
    falls inside the interval (half-open ``[start, end)`` by default).

    ``on``: optional additional equi-key columns present on both sides
    (e.g. a tenant id) — they tighten the join key and cut the pair
    stream before the containment filter.

    ``chunk``: bucket width as a Spark interval string. Intervals longer
    than the chunk are replicated to each overlapped chunk; pick a width
    near the typical interval span so the replication factor stays ~2.

    Output: all point columns plus the interval's columns; ambiguous
    names on the interval side are prefixed ``iv_``.
    """
    width = _chunk_seconds(chunk)
    chunk_of = lambda c: F.floor(F.unix_timestamp(c) / width)  # noqa: E731

    pt = points.withColumn("_chunk", chunk_of(F.col(point_ts)))

    overlap = set(points.columns) & (set(intervals.columns) - set(on))
    iv = intervals
    renames = {}
    for c in overlap:
        renames[c] = f"iv_{c}"
        iv = iv.withColumnRenamed(c, f"iv_{c}")
    s_col = renames.get(start_col, start_col)
    e_col = renames.get(end_col, end_col)

    iv = iv.withColumn(
        "_chunk",
        F.explode(F.sequence(chunk_of(F.col(s_col)), chunk_of(F.col(e_col)))),
    )

    contain: Column = F.col(point_ts) >= F.col(s_col)
    if end_inclusive:
        contain = contain & (F.col(point_ts) <= F.col(e_col))
    else:
        contain = contain & (F.col(point_ts) < F.col(e_col))

    return pt.join(iv, ["_chunk", *on]).where(contain).drop("_chunk")


def _chunk_seconds(chunk: str) -> int:
    """Parse a simple '<n> <unit>' interval string to seconds (the subset
    needed for bucketing; sub-second chunks are not meaningful here)."""
    n_s, unit = chunk.split(None, 1)
    n = int(n_s)
    unit = unit.rstrip("s").lower()
    secs = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    if unit not in secs:
        raise ValueError(f"unsupported chunk unit {unit!r}")
    return n * secs[unit]


def events_in_windows(
    points: DataFrame,
    anchors: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "5 minutes",
    chunk: str | None = None,
    on: Sequence[str] = (),
) -> DataFrame:
    """Convenience: correlate ``points`` to fixed-width windows opened at
    each ``anchors`` row's timestamp — the common incident/trigger
    correlation query. Window is ``[anchor.ts, anchor.ts + window)``."""
    iv = anchors.select(
        *on,
        F.col(ts_col).alias("w_start"),
        (F.col(ts_col) + F.expr(f"INTERVAL {window}")).alias("w_end"),
        *[c for c in anchors.columns if c not in (ts_col, *on)],
    )
    return interval_join(
        points,
        iv,
        point_ts=ts_col,
        start_col="w_start",
        end_col="w_end",
        on=on,
        chunk=chunk or window,
    )
