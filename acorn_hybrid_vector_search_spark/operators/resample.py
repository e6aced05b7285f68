"""Time-series resampling with gap filling — dense per-key time grids.

Rollups (streaming/pipeline.py::hourly_rollup) emit a row only for
buckets that HAVE events; downstream consumers (dashboards, forecasting
feature frames, rate-of-change windows) need the DENSE grid — every
bucket between a key's first and last activity, zero-filled where
nothing happened. The classic hypertable `time_bucket_gapfill`.

Plan shape at scale: the rolled relation is aggregate-sized (keys ×
active buckets). The grid is generated from a per-key (min, max) bucket
aggregate — one tiny shuffle — then ``sequence()`` EXPLODES driver-free
inside the executors (rows ∝ keys × buckets, never touching the raw
event table again), and a left join on (key, bucket) against the rolled
relation fills observed values. Both sides are aggregate-sized, so the
join is broadcastable or a cheap shuffle regardless of raw data volume.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dense_time_grid", "resample_fill"]


def dense_time_grid(
    rolled: DataFrame,
    keys: Sequence[str],
    bucket_col: str,
    *,
    step: str = "1 hour",
) -> DataFrame:
    """Per key: one row for EVERY ``step``-spaced bucket between that
    key's min and max observed bucket (inclusive) — the join spine."""
    bounds = rolled.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
        ).alias(bucket_col),
    )


def resample_fill(
    rolled: DataFrame,
    keys: Sequence[str],
    bucket_col: str,
    *,
    step: str = "1 hour",
    fill: Mapping[str, Column | float | int] | None = None,
) -> DataFrame:
    """Left-join ``rolled`` onto its dense grid; absent buckets take the
    ``fill`` value per column (default: 0 for every non-key, non-bucket
    column). Output row count = Σ_key (buckets spanned by that key)."""
    value_cols = [c for c in rolled.columns if c not in (*keys, bucket_col)]
    fill = dict(fill or {})
    grid = dense_time_grid(rolled, keys, bucket_col, step=step)
    out = grid.join(rolled, [*keys, bucket_col], "left")

    def _filled(c: str) -> Column:
        v = fill.get(c, 0)
        if not isinstance(v, Column):
            v = F.lit(v)
        return F.coalesce(F.col(c), v).alias(c)

    return out.select(*keys, bucket_col, *[_filled(c) for c in value_cols])
