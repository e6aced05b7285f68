"""Keyword retrieval (BM25) and rank fusion (RRF) — the text half of
hybrid retrieval.

The reference engine's "hybrid" is vector-similarity × metadata-predicate
(SURVEY.md §2.2). A modern retrieval stack adds a second scored modality
— lexical BM25 — and fuses the two rankings. Both halves are exact,
deterministic DataFrame plans here:

- ``bm25_scores`` / ``bm25_topk``: Okapi BM25 (k1, b) for ONE query's
  term set, with ZERO wide shuffles. Query-term sets are small, so
  per-document term frequencies are computed *inside the token array*
  (one tokenization bound via ``let``, one ``size(filter(...))`` per
  term) — no explode, no (doc, term) shuffle. Pass 1 is a single global
  reduce producing every corpus statistic at once (N, avgdl, per-term
  df); pass 2 broadcasts that 1-row table and evaluates the closed-form
  score per document. Top-k is TakeOrderedAndProject. At 100 TB: two
  column-pruned corpus scans and a scalar broadcast — nothing shuffles
  corpus-sized data.
- ``rrf_fuse``: reciprocal-rank fusion, score = Σ_lists 1/(k + rank) —
  the standard way to combine vector and keyword top-k lists without
  score calibration. Union + partial-agg groupBy on id; list membership
  counts and per-list ranks ride along for auditability.

Corpus-level scalars (N, avgdl) are catalog-style statistics passed in or
computed with one tiny aggregate and inlined as plan literals — never
recomputed per row.

At 100 TB: the BM25 probe's shuffle volume is (docs containing ≥1 query
term) rows — selective queries touch a sliver of the corpus, and the scan
itself is the only full pass. Fusion inputs are top-k lists (thousands of
rows at most); everything downstream of them is driver-scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acorn_hybrid_vector_search_spark.functions.text import let, tokens

__all__ = ["bm25_scores", "bm25_topk", "rrf_fuse"]


def _doc_term_stats(text_col: str, terms: Sequence[str]):
    """STRUCT(dl, tf_0 … tf_{|Q|−1}) per document — document length and
    the frequency of each query term, from ONE tokenization (``let``
    binds the token array once; each tf is a ``size(filter(...))`` over
    the bound variable, all inside whole-stage codegen)."""

    def eq(term):
        # single-parameter lambda: a 2-arg lambda (even via default args)
        # is interpreted by PySpark as an (element, index) HOF lambda
        return lambda x: x == F.lit(term)

    def build(t):
        return F.struct(
            F.size(t).alias("dl"),
            *[
                F.size(F.filter(t, eq(tt))).alias(f"tf_{i}")
                for i, tt in enumerate(terms)
            ],
        )

    return let(tokens(text_col), build)


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Per-document Okapi BM25 score for ``query_terms``.

    Returns ``(id_col, score)`` for every document matching at least one
    query term (non-matching docs score 0 and are omitted).

    idf(t) = ln((N − df_t + 0.5) / (df_t + 0.5) + 1)   [the Lucene form —
    always positive, so stopword-frequency terms degrade gracefully]
    score(d) = Σ_t idf(t) · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    per_doc = docs.select(
        F.col(id_col), _doc_term_stats(text_col, terms).alias("_s")
    )

    # Pass 1 — every corpus statistic in ONE global reduce: N, avgdl, and
    # each term's document frequency. Stays in the plan (broadcast 1-row
    # cross join); collecting it driver-side would cost an extra job.
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg(F.col("_s.dl")).alias("_avgdl"),
        *[
            F.count(F.when(F.col(f"_s.tf_{i}") > 0, 1)).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    if n_docs is not None:
        stats = stats.withColumn("_n", F.lit(float(n_docs)))
    if avgdl is not None:
        stats = stats.withColumn("_avgdl", F.lit(float(avgdl)))

    # Pass 2 — closed-form score per doc; contributions summed in fixed
    # term order (deterministic, unlike a shuffle-ordered SUM).
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_s.dl") / F.col("_avgdl")
    )
    score = None
    for i in range(len(terms)):
        tf_i = F.col(f"_s.tf_{i}")
        idf_i = F.log(
            (F.col("_n") - F.col(f"_df_{i}") + 0.5) / (F.col(f"_df_{i}") + 0.5) + 1.0
        )
        c = F.when(tf_i > 0, idf_i * (tf_i * F.lit(k1 + 1.0) / (tf_i + norm))).otherwise(
            F.lit(0.0)
        )
        score = c if score is None else score + c
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), score.alias("score"))
        .where(F.col("score") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Top-``k`` docs by BM25, ranked. (score desc, id asc) — fully
    deterministic; the limit compiles to TakeOrderedAndProject."""
    scored = bm25_scores(
        docs,
        query_terms,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        n_docs=n_docs,
        avgdl=avgdl,
    )
    ordered = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ordered.withColumn("rank", F.row_number().over(w).cast("long")).select(
        id_col, "rank", F.round("score", 6).alias("score")
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists: score(d) = Σ 1/(k + rank_i).

    Each input must carry ``(id_col, rank_col)`` with ranks 1..n. Returns
    ``(id_col, rrf_score, n_lists, fused_rank)`` ordered by (score desc,
    id asc); ``n_lists`` = how many input lists contained the id. The
    post-rank Window is global but runs over top-k-sized fusion input —
    thousands of rows, not corpus rows.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("_c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(
        F.sum("_c").alias("_score"), F.count(F.lit(1)).alias("n_lists")
    )
    w = Window.orderBy(F.col("_score").desc(), F.col(id_col).asc())
    out = (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .select(
            id_col,
            F.round("_score", 6).alias("rrf_score"),
            F.col("n_lists").cast("long").alias("n_lists"),
            "fused_rank",
        )
    )
    if top is not None:
        out = out.where(F.col("fused_rank") <= top)
    return out
