"""TF-IDF term scoring over a document corpus — the classic text-analysis
aggregate, Spark-first.

Pipeline shape (all JVM-side, no Python in the row path):

    tokens (split)  ->  explode  ->  (doc, term) tf counts   [shuffle 1]
                                      |
                                      +-> term doc-frequency  [shuffle 2,
                                          term-cardinality output]
    tf  join  df  (broadcast when the vocabulary is small)
    score = tf * ln(N / df)
    top-k terms per doc  (window rank, partitioned by doc)   [shuffle 3]

Scale notes (100 TB):
- The explode multiplies rows by tokens/doc; both aggregations are
  partial-aggregate (map-side combine) before their shuffles, so the
  shuffled volume is distinct (doc, term) pairs, not raw tokens.
- The vocabulary (df table) is usually small after combining — Catalyst
  broadcasts it under the threshold; if a corpus has a huge vocabulary
  the join degrades gracefully to a shuffle hash join on term.
- Stopword-like terms make (term) skewed in the df aggregation; the
  map-side combine bounds each task's contribution to |vocab per task|,
  which is what keeps that shuffle healthy.

Determinism: scores are deterministic (integer tf/df and a single ln());
ranking ties break on the term string. Oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acorn_hybrid_vector_search_spark.functions.text import tokens


def term_frequencies(docs: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) — whitespace tokens of the normalized text; empty
    texts yield no rows."""
    return (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_frequencies(tf: DataFrame, *, id_col: str) -> DataFrame:
    """(term, df) from a term-frequency table: number of distinct docs
    containing the term. tf is already distinct per (doc, term), so this
    is a plain count — no count-distinct expansion."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """(id, term, tf, df, score) with score = tf * ln(N / df).

    ``n_docs``: pass the corpus size when known (a catalog stat); else it
    is computed with one tiny aggregate jobs-side. N is a scalar literal
    in the plan either way — no per-row recomputation."""
    if n_docs is None:
        n_docs = docs.count()
    tf = term_frequencies(docs, text_col=text_col, id_col=id_col)
    df_t = doc_frequencies(tf, id_col=id_col)
    return (
        tf.join(df_t, "term")
        .withColumn("score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .select(id_col, "term", "tf", "df", "score")
    )


def top_terms_per_doc(
    docs: DataFrame,
    k: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (rank by score desc, then term
    asc — fully deterministic). The window partitions by doc, so the rank
    shuffle is on the document key: high-cardinality, skew-free."""
    scored = tfidf(docs, text_col=text_col, id_col=id_col, n_docs=n_docs)
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", F.round("score", 6).alias("score"))
    )
