"""Sequence packing: assign documents to fixed-token-budget packs — the
step that turns a deduped/filtered corpus into training sequences.

Two packing disciplines, matching what real LLM data pipelines run:

- ``chunked_packing`` — "concatenate then chunk": documents are laid out
  end-to-end in a deterministic order within each shard and the stream is
  cut every ``budget`` tokens. Documents may straddle a cut (the usual
  GPT-style pretraining layout). This is pure window arithmetic
  (one cumulative sum per shard), fully SQL-expressible, and verified
  against the DuckDB oracle.

- ``greedy_pack`` — "first-fit sequential": a document that would overflow
  the current pack starts a new one; no document is split. This is an
  inherently sequential per-shard loop, so it runs as an
  ``applyInPandas`` over shards — parallel across shards, sequential
  within, exactly how per-worker packing behaves in production loaders.

Parallelism model for both: the SHARD (e.g. ``source``) is the unit of
distribution. A shard's documents are processed by one task; shards are
independent. At 100 TB you want #shards >> #executors and no shard larger
than executor memory — the same contract a streaming loader imposes.

Charter extension (the reference has no text pipeline at all).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window


def chunked_packing(
    docs: DataFrame,
    *,
    token_col: str,
    shard_col: str,
    order_cols: Sequence[str],
    budget: int,
) -> DataFrame:
    """Concat-then-chunk pack assignment.

    Adds: ``pack_id`` (0-based within shard — the pack the document's
    FIRST token lands in), ``pack_offset`` (token offset of the document
    inside that pack), and ``straddles`` (true when the document crosses
    a pack boundary and will be split by the chunker).

    One window per shard: ``sum(tokens) OVER (PARTITION BY shard ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING .. 1 PRECEDING)`` — a single
    shuffle on the shard key, no global ordering anywhere.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return (
        docs.withColumn("_cum_before", cum_before)
        .withColumn("pack_id", F.floor(F.col("_cum_before") / budget))
        .withColumn("pack_offset", F.col("_cum_before") % budget)
        .withColumn(
            "straddles",
            (F.col("pack_offset") + F.col(token_col)) > F.lit(budget),
        )
        .drop("_cum_before")
    )


def greedy_pack(
    docs: DataFrame,
    *,
    token_col: str,
    shard_col: str,
    order_cols: Sequence[str],
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """First-fit sequential packing (no document splitting).

    Returns (id, shard, n_tokens, pack_id, pack_offset). A document
    larger than the budget gets a pack of its own (callers typically
    filter or truncate those upstream).

    applyInPandas per shard: the loop is sequential within a shard —
    which is the point; pack assignment IS order-dependent — and Spark
    parallelizes across shards.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    out_schema = StructType(
        [
            docs.schema[id_col],
            docs.schema[shard_col],
            StructField("n_tokens", LongType()),
            StructField("pack_id", LongType()),
            StructField("pack_offset", LongType()),
        ]
    )
    order = list(order_cols)
    tok, sid = token_col, id_col

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pack_id, fill = 0, 0
        ids, toks, packs, offs = [], [], [], []
        for _, row in pdf.iterrows():
            n = int(row[tok])
            if fill > 0 and fill + n > budget:
                pack_id, fill = pack_id + 1, 0
            ids.append(row[sid])
            toks.append(n)
            packs.append(pack_id)
            offs.append(fill)
            fill += n
            if fill >= budget:
                pack_id, fill = pack_id + 1, 0
        return pd.DataFrame(
            {
                sid: ids,
                shard_col: pdf[shard_col].iloc[0] if len(pdf) else None,
                "n_tokens": toks,
                "pack_id": packs,
                "pack_offset": offs,
            }
        )

    return docs.groupBy(shard_col).applyInPandas(pack, schema=out_schema)


def pack_stats(
    packed: DataFrame, *, shard_col: str, budget: int, token_col: str = "n_tokens"
) -> DataFrame:
    """Per-pack fill statistics from a ``greedy_pack``/``chunked_packing``
    output: n_docs, n_tokens, fill_ratio. The distribution of fill_ratio
    is the packing-efficiency metric loaders report."""
    return packed.groupBy(shard_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("n_tokens"),
        F.round(F.sum(token_col) / F.lit(float(budget)), 6).alias("fill_ratio"),
    )
