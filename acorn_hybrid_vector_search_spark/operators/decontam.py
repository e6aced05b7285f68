"""Benchmark decontamination: drop training documents that overlap an
evaluation/benchmark set by exact word n-grams.

The standard LLM-training-data hygiene step (GPT-3 §C / The Pile style
13-gram filtering, scaled down to the corpus at hand): shingle both
sides into word n-grams, find training docs sharing at least
``min_overlap`` distinct n-grams with ANY benchmark text, and remove
them. There is no reference-engine analog (the reference corpus is
images); this is a charter extension over the ``documents`` table.

Scale shape (100 TB corpus, KB–MB benchmark side):

- The benchmark gram set is tiny relative to the corpus (eval suites are
  thousands of documents, not billions) — build it once, ``distinct()``,
  and BROADCAST it. The contamination probe is then a map-side semi-join
  over the exploded corpus grams: no shuffle of corpus data by gram.
- The only corpus-wide shuffle is the per-doc hit count groupBy(doc_id),
  which partial-aggregates map-side; its post-shuffle volume is bounded
  by the number of *contaminated* docs, not corpus size.
- ``decontaminate`` finishes with a left-anti join of the corpus against
  the flagged-id set — the flagged set is usually small enough that AQE
  broadcasts it.

Shingles are ``array_distinct`` within a document (functions.text.
shingles), so hit counts are distinct-gram counts by construction — no
double-counting a repeated phrase inside one document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import shingles

__all__ = [
    "benchmark_ngrams",
    "contamination_stats",
    "contaminated_ids",
    "decontaminate",
]


def benchmark_ngrams(
    benchmark: DataFrame, *, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """The distinct word-``n``-gram set of the benchmark side
    (one ``gram`` STRING column). Small by assumption — cache/broadcast
    at the call sites."""
    return (
        benchmark.select(F.explode(shingles(text_col, n)).alias("gram")).distinct()
    )


def _hit_counts(
    docs: DataFrame,
    bench_grams: DataFrame,
    *,
    n: int,
    id_col: str,
    text_col: str,
    broadcast_bench: bool,
) -> DataFrame:
    bg = F.broadcast(bench_grams) if broadcast_bench else bench_grams
    return (
        docs.select(id_col, F.explode(shingles(text_col, n)).alias("gram"))
        .join(bg, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination evidence against the benchmark set.

    Returns one row per input doc: ``(id_col, n_grams, n_hits,
    contaminated, overlap_frac)`` where ``n_hits`` is the number of
    DISTINCT doc n-grams that appear anywhere in the benchmark set and
    ``contaminated = n_hits >= min_overlap``. Use this to audit/threshold
    before committing to ``decontaminate``'s drop decision.
    """
    bg = benchmark_ngrams(benchmark, n=n, text_col=bench_text_col or text_col)
    hits = _hit_counts(
        docs, bg, n=n, id_col=id_col, text_col=text_col, broadcast_bench=broadcast_bench
    )
    base = docs.select(id_col, F.size(shingles(text_col, n)).alias("n_grams"))
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            n_hits.cast("long").alias("n_hits"),
            (n_hits >= min_overlap).alias("contaminated"),
            F.round(n_hits / F.greatest(F.col("n_grams"), F.lit(1)), 6).alias(
                "overlap_frac"
            ),
        )
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Ids of docs sharing ≥ ``min_overlap`` distinct n-grams with the
    benchmark set — the drop list, without the full stats projection."""
    bg = benchmark_ngrams(benchmark, n=n, text_col=bench_text_col or text_col)
    hits = _hit_counts(
        docs, bg, n=n, id_col=id_col, text_col=text_col, broadcast_bench=broadcast_bench
    )
    return hits.filter(F.col("n_hits") >= min_overlap).select(id_col)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The corpus minus contaminated documents (left-anti join on the
    flagged-id set). Schema-preserving: returns ``docs``' columns."""
    flagged = contaminated_ids(
        docs,
        benchmark,
        n=n,
        min_overlap=min_overlap,
        id_col=id_col,
        text_col=text_col,
        bench_text_col=bench_text_col,
        broadcast_bench=broadcast_bench,
    )
    return docs.join(flagged, id_col, "left_anti")
