"""Keyword retrieval (BM25) and rank fusion (RRF) — the text half of
hybrid retrieval.

The reference engine's "hybrid" is vector-similarity × metadata-predicate
(SURVEY.md §2.2). A modern retrieval stack adds a second scored modality
— lexical BM25 — and fuses the two rankings. Both halves are exact,
deterministic DataFrame plans here:

- ``bm25_scores`` / ``bm25_topk``: Okapi BM25 (k1, b) for ONE query's
  term set. The plan never explodes the full token stream: tokens are
  filtered to the query's terms *inside the array* (a JVM higher-order
  ``filter``) before the explode, so the exploded row count is bounded by
  matches-per-doc × |query terms|, not document length. Per-term document
  frequencies fall out of the same aggregate; the |Q|-row idf table is
  broadcast back. One corpus scan, one partial-agg shuffle on doc id.
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

from acorn_hybrid_vector_search_spark.functions.text import tokens

__all__ = ["bm25_scores", "bm25_topk", "rrf_fuse"]


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
    if n_docs is None or avgdl is None:
        stats = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(tokens(text_col))).alias("avgdl"),
        ).head()
        n_docs = n_docs if n_docs is not None else stats["n"]
        avgdl = avgdl if avgdl is not None else float(stats["avgdl"] or 1.0)

    # filter INSIDE the token array, then explode only the survivors
    toks = tokens(text_col)
    matched = F.filter(toks, lambda t: t.isin(*terms))
    tf = (
        docs.select(
            F.col(id_col),
            F.size(toks).alias("_dl"),
            F.explode(matched).alias("term"),
        )
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df_t falls out of the filtered tf table (one row per matching doc)
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = idf.withColumn(
        "idf",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(float(avgdl))
    )
    contrib = F.col("idf") * (
        F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .withColumn("_contrib", contrib)
        .groupBy(id_col)
        .agg(F.sum("_contrib").alias("score"))
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
