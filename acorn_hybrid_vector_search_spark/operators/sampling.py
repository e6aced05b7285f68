"""Deterministic hash-based sampling — corpus mixing for training data.

``df.sample()`` is seed-dependent on partitioning (a repartition changes
which rows survive), which makes pipelines unreproducible. The operators
here decide per ROW from a portable md5-based hash of a stable key:

    keep  <=>  hash64(salt || key) mod 1e6  <  rate * 1e6

so the same row makes the same decision on any cluster, any partitioning,
any engine (the DuckDB oracle replays the identical arithmetic). This is
how production corpus-mixture pipelines pin their sampling.

- ``hash_sample``      — uniform Bernoulli(rate) over the whole table
- ``stratified_sample`` — per-stratum rates (e.g. downweight a crawl
  source, upweight curated text): the mixture-reweighting step of an
  LLM data pipeline.

Both are pure narrow transformations: no shuffle, no driver round-trip,
filter pushes down to the scan. Cost is one md5 per row.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import _hash64

_DENOM = 1_000_000


def _uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, 1) from (salt, key) — first 15
    md5 hex chars as a bigint (functions.text._hash64), mod 1e6."""
    h = _hash64(F.concat_ws(":", F.lit(salt), key.cast("string")))
    return F.pmod(h, F.lit(_DENOM)).cast("double") / _DENOM


def hash_sample(
    df: DataFrame,
    rate: float,
    *,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with probability ``rate``, decided by the row's key —
    reproducible across runs, partitionings, and engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(_uniform(F.col(key_col), salt) < rate)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    *,
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum Bernoulli sampling: ``rates[stratum]`` is the keep
    probability for rows of that stratum; unlisted strata use
    ``default_rate``. The literal rate map lives in the plan (a
    broadcast-free map lookup), so the filter is a narrow op that
    Catalyst can push toward the scan.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    rate_map = F.create_map(
        *[F.lit(x) for s, r in sorted(rates.items()) for x in (s, float(r))]
    )
    rate = F.coalesce(rate_map[F.col(stratum_col)], F.lit(float(default_rate)))
    return df.where(_uniform(F.col(key_col), salt) < rate)


def sample_rates_for_mixture(
    counts: Mapping[str, int], target_share: Mapping[str, float], total_out: int
) -> dict[str, float]:
    """Turn desired mixture shares into per-stratum sampling rates:
    rate_s = (share_s * total_out) / count_s, capped at 1.0 (a stratum
    can't be upsampled by Bernoulli thinning — callers repeat epochs for
    that). Driver-side arithmetic over tiny per-stratum counts."""
    rates: dict[str, float] = {}
    for s, share in target_share.items():
        n = counts.get(s, 0)
        rates[s] = min(1.0, (share * total_out) / n) if n else 0.0
    return rates

def cap_per_group(
    df: DataFrame,
    cap: int,
    *,
    group_col: str,
    key_col: str,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by the deterministic
    per-row hash (NOT arrival order) — the per-domain cap of a crawl
    pipeline: no domain may contribute more than N documents, and which
    N survive is reproducible on any partitioning/engine.

    One window shuffle on the group key. The rank orders by
    (uniform-hash, key) so ties are impossible and the survivor set is a
    pure function of the data. Groups under the cap pass through whole.
    At 100 TB this is the same single hash-partitioned exchange any
    per-key top-N costs; skewed mega-domains stay one partition's work —
    cap them upstream with stratified_sample if a single domain
    dominates the corpus.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        _uniform(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )
