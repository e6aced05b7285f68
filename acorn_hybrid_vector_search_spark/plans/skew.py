"""Skew mitigation helpers: salted aggregation and salted broadcast join.

AQE (enabled in session.py) handles skewed SORT-MERGE joins by splitting
oversized partitions, but two shapes still serialize on a hot key:

1. **high-cardinality aggregation states under one group key** — a single
   reducer owns the whole key. ``salted_agg`` does the classic two-stage
   tree: group on (key, salt) map-side-partial → re-aggregate on key.
   Works for any algebraic aggregate (sum/count/min/max and compositions).
2. **pair generation inside one bucket** (our near-dup operators): a hot
   bucket's O(|bucket|²) probe runs in one task. ``explode_salt`` assigns
   each row a deterministic salt so the caller can split the probe side
   (dedup._probe_parallelism already round-robins; this helper is for
   key-aligned splitting where round-robin would break bucket locality).

Deterministic salts (hash-based, not rand()) keep retries/speculative
tasks consistent — non-deterministic salting can duplicate or lose rows
when a stage retries.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, n_salts: int, *, cols: Sequence[str], salt_col: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the row's identifying
    columns — stable across retries, unlike rand()-based salting."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    salt_src: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    aggs: output_name → (input_col, fn) with fn in {sum, count, min, max}.
    Stage 1 groups on (keys…, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 merges the per-salt partials on the real
    keys (n_salts rows per key — trivial). count re-aggregates as SUM of
    partial counts.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": lambda c: F.count(c), "min": F.min, "max": F.max}
    for name, (_c, fn) in aggs.items():
        if fn not in mergers:
            raise ValueError(f"{name}: non-algebraic aggregate {fn!r} cannot be salted")

    salted = with_salt(df, n_salts, cols=list(salt_src or df.columns))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[firsts[fn](c).alias(name) for name, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[mergers[fn](name).alias(name) for name, (c, fn) in aggs.items()]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big table to a small one with NO shuffle of the big
    side at all: broadcast the small side. (The degenerate-but-common skew
    fix — when the small side fits, a broadcast join is immune to key skew
    because the big side never repartitions by key.)"""
    return big.join(F.broadcast(small), list(on), how)
