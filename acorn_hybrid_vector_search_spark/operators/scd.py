"""SCD-2 history merge: the versioned sibling of operators/upsert.py's
SCD-1. Instead of replacing a changed row, the current version is
CLOSED (``valid_to`` set to the batch's effective timestamp) and a new
open version appended — the standard slowly-changing-dimension type-2
contract every warehouse needs for "what did this row look like at
time T" queries (dimension history, feature-store point-in-time joins,
as-of training-data reconstruction).

Plan shape (and why it scales):

- the CDC batch is deduped per key (``last_wins`` — window over the
  SMALL side only) and compared against ONLY the current versions:
  ``history`` splits into closed rows (never touched again — at rest
  they live in closed partitions and aren't even scanned when the
  storage layer partitions on ``is_current``) and current rows;
- change detection is a broadcast equi-join of current × batch on the
  key (batch ≪ base ⇒ map-side; disable to let AQE shuffle+skew-split);
  a NO-OP row (attributes equal) produces no new version — idempotent
  re-application of the same batch is a no-op, the property that makes
  retried CDC pipelines safe;
- output = closed ∪ unchanged-current ∪ newly-closed (valid_to :=
  effective_ts) ∪ new-versions (valid_from := effective_ts, open).
  The base relation is scanned once, shuffles only for the broadcast
  hash join probe (i.e. not at all), and no window ever runs over the
  row-scaled history.

Determinism: output is a pure function of (history, batch,
effective_ts) — fully SQL-expressible, DuckDB oracle replays the whole
merge (__spark_entry__.py ``scd2_orders_history``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.operators.upsert import last_wins

__all__ = ["scd2_apply", "scd2_snapshot"]


def _null_safe_any_change(attrs: Sequence[str]) -> Column:
    """True when any tracked attribute differs (NULL-safe: NULL→value
    and value→NULL are changes, NULL→NULL is not)."""
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
    return cond


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    effective_ts,
    *,
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    order_col: str | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Apply one CDC batch to an SCD-2 history relation.

    ``history`` columns: key_cols + attr_cols + ``ts_col`` +
    ``end_col`` (open versions have NULL ``end_col``). ``batch``
    columns: key_cols + attr_cols (+ ``order_col`` when a batch may
    carry several rows per key — highest wins).

    Semantics per batch key:
    - unknown key → new open version (valid_from = effective_ts);
    - known key, attributes differ → current version closed at
      effective_ts + new open version;
    - known key, attributes equal → NOTHING (idempotent re-apply).
    Keys absent from the batch are untouched.

    **Precondition — monotonic effective_ts** (ADVICE r5): batches must
    be applied in effective-time order. A late batch whose
    ``effective_ts`` predates a changed key's current ``valid_from``
    would close that version with valid_to < valid_from — an inverted
    interval that silently corrupts every later ``scd2_snapshot``. Since
    retried/replayed CDC pipelines are exactly where late batches occur,
    this is VALIDATED in the plan, not just documented: such a row
    raises at execution time (``raise_error`` inside the close branch —
    zero cost on the happy path, no extra action/scan)."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    eff = F.lit(effective_ts).cast(history.schema[ts_col].dataType)

    if order_col is not None:
        batch = last_wins(batch, keys, order_col)
    upd = batch.select(*keys, *attrs)
    if broadcast_batch:
        upd = F.broadcast(upd)

    closed = history.filter(F.col(end_col).isNotNull())
    current = history.filter(F.col(end_col).isNull())

    cur = current.alias("cur")
    # presence flag that survives all-NULL attribute rows: join hit ⇔
    # the key exists in the batch
    b = upd.withColumn("_hit", F.lit(True)).alias("upd")
    joined = cur.join(b, keys, "left")
    is_changed = F.col("_hit").isNotNull() & _null_safe_any_change(attrs)

    # current rows: unchanged stay open; changed get closed at eff.
    # Out-of-order guard: closing a version opened AFTER eff would
    # produce an inverted validity interval — raise instead (per-row
    # branch, only evaluated for changed keys; no extra scan).
    close_at = F.when(
        eff < F.col(f"cur.{ts_col}"),
        F.raise_error(
            F.concat(
                F.lit("scd2_apply: out-of-order batch - effective_ts "),
                eff.cast("string"),
                F.lit(" predates current valid_from "),
                F.col(f"cur.{ts_col}").cast("string"),
                F.lit(" for key "),
                F.concat_ws("|", *[F.col(f"cur.{k}").cast("string") for k in keys]),
            )
        ).cast(history.schema[end_col].dataType),
    ).otherwise(eff)
    kept_current = joined.select(
        *keys,
        *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col(f"cur.{ts_col}").alias(ts_col),
        F.when(is_changed, close_at).otherwise(F.lit(None).cast(
            history.schema[end_col].dataType
        )).alias(end_col),
    )

    # new open versions: changed keys (batch attrs) + brand-new keys
    cur_keys = current.select(*keys)
    new_keys = upd.join(cur_keys, keys, "left_anti")
    changed_new = (
        joined.filter(is_changed)
        .select(*keys, *[F.col(f"upd.{a}").alias(a) for a in attrs])
    )
    new_versions = changed_new.unionByName(new_keys.select(*keys, *attrs)).select(
        "*",
        eff.alias(ts_col),
        F.lit(None).cast(history.schema[end_col].dataType).alias(end_col),
    )

    out_cols = [*keys, *attrs, ts_col, end_col]
    return (
        closed.select(*out_cols)
        .unionByName(kept_current.select(*out_cols))
        .unionByName(new_versions.select(*out_cols))
    )


def scd2_snapshot(
    history: DataFrame,
    as_of,
    *,
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time view: the version of each key valid AT ``as_of``
    (valid_from ≤ as_of < valid_to, open = +∞). A pure filter — no
    window, no join; with storage partitioned on is_current/valid_to
    ranges this prunes to the relevant partitions."""
    ts = F.lit(as_of).cast(history.schema[ts_col].dataType)
    return history.filter(
        (F.col(ts_col) <= ts)
        & (F.col(end_col).isNull() | (F.col(end_col) > ts))
    )
