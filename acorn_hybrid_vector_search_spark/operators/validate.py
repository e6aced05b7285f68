"""Expectations-style data validation: declarative rules → one-pass
violation report.

A 100 TB ingest needs its contract checked WITHOUT one job per rule:
every rule here compiles to a conditional-count aggregate, so the whole
rule set evaluates in a single scan (one global reduce, no shuffle of
row data). Rules are plain Column predicates — the full expression
surface of the engine is the assertion language.

``validate`` returns the per-rule report (violations, checked, pass);
``enforce`` splits the input into (valid, quarantine) DataFrames with a
rule-bitmap on the quarantined rows, the standard dead-letter pattern —
both sides are column-pruned projections of the same scan.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate", "enforce"]


def validate(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One row per rule: ``(rule, n_checked, n_violations, pass)``.
    A rule's Column is the predicate rows MUST satisfy; NULL predicate
    results count as violations (three-valued logic is a data bug, not a
    pass). Single aggregate — one scan for the whole rule set."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(f"_v_{i}")
        for i, (_name, cond) in enumerate(rules.items())
    ]
    row = df.agg(*aggs)
    reports = []
    for i, name in enumerate(rules):
        reports.append(
            row.select(
                F.lit(name).alias("rule"),
                F.col("_n").alias("n_checked"),
                F.col(f"_v_{i}").alias("n_violations"),
                (F.col(f"_v_{i}") == 0).alias("pass"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def enforce(
    df: DataFrame, rules: Mapping[str, Column], *, bitmap_col: str = "_failed_rules"
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): rows failing ANY rule land in quarantine with
    ``bitmap_col`` listing the violated rule names — the dead-letter
    side keeps enough evidence to triage without re-running checks."""
    if not rules:
        raise ValueError("rules must be non-empty")
    failed = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn(bitmap_col, failed)
    valid = tagged.where(F.size(bitmap_col) == 0).drop(bitmap_col)
    quarantine = tagged.where(F.size(bitmap_col) > 0)
    return valid, quarantine
