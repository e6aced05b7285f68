"""Approximate sketches: mergeable distinct-count (HLL) and quantile
summaries — the constant-memory answers for questions whose exact forms
need a corpus-sized shuffle.

At 100 TB, ``COUNT(DISTINCT user_id)`` per group is a full shuffle of
every distinct pair, and exact percentiles need a global sort. The
sketch forms bound state to KBs per group:

- ``distinct_sketches`` / ``merge_distinct_sketches``: Apache
  DataSketches HLL via Spark's ``hll_sketch_agg`` — each partition folds
  rows into registers map-side, the shuffle moves sketches (KB), and
  sketches MERGE exactly: ``union(sketch(A), sketch(B)) ==
  sketch(A ∪ B)`` register-for-register, so incremental maintenance
  (operators/incremental.py's pattern) extends to distinct counts.
- ``approx_quantiles``: Greenwald-Khanna summaries via
  ``percentile_approx`` with a rank-error accuracy knob.

Estimates are deterministic for a given input SET (insertion order is
irrelevant to HLL registers), but NOT portable across engines — these
operators are rows-only at the driver gate, with pytest pinning the
error bounds and the exact merge identity instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "distinct_sketches",
    "merge_distinct_sketches",
    "estimate_distinct",
    "approx_quantiles",
]


def distinct_sketches(
    df: DataFrame, keys: Sequence[str], col: str, *, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of ``col`` (binary column ``sketch``).
    ``lgk``: log2 of register count — 12 ⇒ 4 KB/group, ~1.6% relative
    standard error."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch")
    )


def merge_distinct_sketches(
    partials: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Union per-key sketches across partial tables — exact on the
    register level, so a maintained sketch never drifts from a recomputed
    one."""
    if not partials:
        raise ValueError("partials must be non-empty")
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(F.hll_union_agg("sketch").alias("sketch"))


def estimate_distinct(sketches: DataFrame) -> DataFrame:
    """Materialize the cardinality estimate (bigint ``approx_distinct``)
    from a sketch table."""
    return sketches.withColumn(
        "approx_distinct", F.hll_sketch_estimate("sketch")
    ).drop("sketch")


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probabilities: Sequence[float],
    *,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-key approximate quantiles (``q_<pct>`` columns). ``accuracy``
    bounds the rank error at 1/accuracy of the group size."""
    pa = F.percentile_approx(
        F.col(col),
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(accuracy),
    )
    out = df.groupBy(*keys).agg(pa.alias("_q"))
    for i, p in enumerate(probabilities):
        out = out.withColumn(f"q_{int(p * 100)}", F.col("_q").getItem(i))
    return out.drop("_q")


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter counting.


def cms_build(
    df: DataFrame, col: str, *, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over ``df[col]``:
    a (d, bucket, cnt) counter relation of at most depth×width rows —
    the constant-memory frequency summary for heavy-hitter questions
    whose exact form needs a corpus-sized shuffle of distinct values.

    Guarantees: estimates NEVER undercount; overcount ≤ e/width · N
    with probability 1 − e^(−depth) (pairwise-independent rows stand in
    via distinct hash salts). Counters ADD, so sketches merge exactly:
    ``cms_merge([cms(A), cms(B)]) == cms_build(A ∪ B)`` counter-for-
    counter (the incremental-maintenance identity, same contract as the
    HLL register merge above).

    Unlike the HLL/GK sketches (engine-specific binaries, rows-only at
    the driver gate), every counter here is exact integer arithmetic
    over the portable md5 hash — the DuckDB oracle replays the full
    sketch bit-for-bit.

    Plan shape: one narrow projection explodes each value to ``depth``
    (d, bucket) rows, then ONE partial-agg groupBy — map-side combine
    collapses to ≤ depth×width rows per task regardless of input size.
    """
    from acorn_hybrid_vector_search_spark.functions.text import _hash64

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    _hash64(F.concat(F.lit(f"cms{d}:"), F.col(col))), F.lit(width)
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(partials: Sequence[DataFrame]) -> DataFrame:
    """Sum-merge partial sketches — exact: counters add."""
    if not partials:
        raise ValueError("partials must be non-empty")
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    return u.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch for every ``items[col]`` row: the CMS
    estimate is the MIN over the depth counters the value hashes to
    (a missing counter row means 0). Must use the build's (depth,
    width). The sketch is ≤ depth×width rows, so the probe join
    broadcasts — a map-side lookup per item."""
    from acorn_hybrid_vector_search_spark.functions.text import _hash64

    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    _hash64(F.concat(F.lit(f"cms{d}:"), F.col(col))), F.lit(width)
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    it = items.select(F.col(col), F.explode(probes).alias("r")).select(
        col, F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket")
    )
    return (
        it.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("cms_count"))
    )
