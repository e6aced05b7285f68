"""acorn_hybrid_vector_search_spark — a PySpark-native hybrid vector search
and analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``pratyush401/ACORN_Hybrid_Vector_Search`` (hybrid metadata-predicate +
top-k vector similarity search over an embedded product catalog; see
SURVEY.md) as idiomatic Spark DataFrame plans, plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
needed at 100 TB scale.

Design principles (SURVEY.md §7):
- DataFrame/SQL-first: the logical plan is declared, Catalyst picks the
  physical strategy (predicate pushdown, column pruning, broadcast joins,
  TakeOrderedAndProject for top-k).
- JVM-side expressions in the hot path (``pyspark.sql.functions`` arrays /
  higher-order functions); Arrow-batched pandas UDFs only where built-ins
  cannot express the semantics.
- Every operator designed for multi-executor partitioned execution even
  though tests run on local[*].
"""

from acorn_hybrid_vector_search_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
