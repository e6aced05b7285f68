"""Sliding-window document chunking — the RAG/embedding-prep splitter.

Splits each document into overlapping token windows (``chunk_tokens``
wide, advancing by ``stride``), the standard prep before embedding a
corpus for retrieval: overlap keeps boundary-spanning context inside at
least one chunk. Distinct from operators/packing.py (which packs MANY
docs into fixed training batches); this fans ONE doc out into windows.

Plan shape: one tokenization per doc (``let``-bound), chunk indexes from
``sequence``, window text via ``slice`` — all inside whole-stage
codegen; the only row expansion is the posexplode of per-doc chunk
indexes (rows × ~n_tokens/stride). No shuffle at all: chunking is
embarrassingly parallel per document, and at 100 TB it pipelines
straight into the embedding UDF without a repartition.

Chunk-count arithmetic is integer-only (``1 + (n - chunk + stride - 1)
div stride`` for n > chunk) so SQL oracles replay it exactly — no
float ceil() to disagree about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.text import let, tokens

__all__ = ["sliding_chunks"]


def sliding_chunks(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, window): ``(id_col, chunk_id, n_tokens,
    chunk_text)``. Every doc yields ≥ 1 chunk (short docs yield exactly
    one holding the whole text); the final chunk may be shorter than
    ``chunk_tokens``; consecutive chunks overlap by ``chunk_tokens −
    stride`` tokens."""
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be ≥ 1")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would drop tokens between windows")

    def build(t: F.Column) -> F.Column:
        n = F.size(t)
        # integer division (IntegralDivide, same op as DuckDB's `//`) —
        # double division + cast would only match below 2^53
        n_chunks = F.lit(1) + F.when(
            n > chunk_tokens,
            F.call_function(
                "div", (n - chunk_tokens + (stride - 1)).cast("long"), F.lit(int(stride)).cast("long")
            ).cast("int"),
        ).otherwise(F.lit(0))
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.slice(t, i * stride + 1, chunk_tokens).alias("_toks"),
            ),
        )

    chunks = docs.select(
        F.col(id_col), F.explode(let(tokens(text_col), build)).alias("_c")
    )
    return chunks.select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.size("_c._toks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("_c._toks")).alias("chunk_text"),
    )
