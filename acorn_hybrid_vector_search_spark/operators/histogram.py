"""A1 — value histogram (group-by count over a metadata attribute).

The reference walks the metadata dict with a Python Counter-style loop
(/root/reference/survey_metadata.py:22-76) — and has an off-by-one (counter
initialized to 0 on first sighting, so reported counts are true−1). We do
NOT replicate the bug (SURVEY.md §2 A1): this is a plain hash aggregate
with map-side partial aggregation, the canonical shuffle-light Spark op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def value_histogram(df: DataFrame, value_expr: Column | str, alias: str = "value") -> DataFrame:
    """Count occurrences of each distinct value of ``value_expr``.

    NULLs (absent attributes) are excluded, matching the reference's
    behavior of only counting rows that have the key
    (/root/reference/survey_metadata.py:42-48).
    """
    col = F.col(value_expr) if isinstance(value_expr, str) else value_expr
    return (
        df.select(col.alias(alias))
        .filter(F.col(alias).isNotNull())
        .groupBy(alias)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
