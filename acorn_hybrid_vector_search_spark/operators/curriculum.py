"""Curriculum / quality binning: assign every document a quality
quantile bin — the prep step for quality-weighted sampling and
curriculum ordering of training data.

The naive shape (global ``ntile``) funnels the corpus through one
window partition. The scale shape used here: compute the bin BOUNDARIES
with one scalar aggregate (exact interpolated percentiles — a single
global reduce, KB of state), then bin rows by comparison against the
broadcast thresholds — a shuffle-free map over the corpus. Boundary
computation is the only reduce; binning adds zero exchanges.

Convention: bin b ∈ [0, n_bins) with upper boundary at percentile
(b+1)/n_bins; a score lands in the FIRST bin whose boundary is ≥ score
(ties at a boundary go to the lower bin, matching ``quantile_cont``
replay in SQL oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantile_boundaries", "with_quality_bin"]


def quantile_boundaries(
    df: DataFrame, score_col: str, n_bins: int
) -> list[float]:
    """The n_bins−1 interior boundaries (exact interpolated
    percentiles) — one scalar reduce, independent of corpus size."""
    probs = [i / n_bins for i in range(1, n_bins)]
    row = df.agg(
        F.percentile(score_col, F.array(*[F.lit(p) for p in probs])).alias("q")
    ).head()
    return [float(x) for x in row["q"]]


def with_quality_bin(
    df: DataFrame,
    score_col: str,
    n_bins: int = 10,
    *,
    bin_col: str = "quality_bin",
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Add ``bin_col`` ∈ [0, n_bins): comparison against the (broadcast)
    boundaries — no shuffle, no window. Pass precomputed ``boundaries``
    (a catalog stat) to skip the reduce entirely."""
    if boundaries is None:
        boundaries = quantile_boundaries(df, score_col, n_bins)
    expr: Column = F.lit(n_bins - 1)
    for b in range(n_bins - 2, -1, -1):
        expr = F.when(F.col(score_col) <= boundaries[b], F.lit(b)).otherwise(expr)
    return df.withColumn(bin_col, expr.cast("long"))
