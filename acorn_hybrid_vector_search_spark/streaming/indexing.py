"""Streaming index maintenance: append new embeddings into a persisted
IVF index without rebuilding it.

The reference rebuilds its whole HNSW graph from scratch every process
start (~51 s for 123k vectors, /root/reference/acorn.py:274-277); adding
items means re-adding everything. Here the index at rest is a
cluster-partitioned parquet table (operators.ann.ivf_write), so ingest is:

    stream of (id, embedding[, …]) rows
      → assign_clusters against the FROZEN codebook (map-only, BLAS batch)
      → append into lists/, partitionBy cluster_id

Each micro-batch lands as new files inside the matching cluster
directories; readers see them on the next query (partition pruning
unchanged). The codebook is intentionally frozen — standard IVF practice:
assignment quality degrades only if the data distribution drifts, at which
point you retrain offline and swap the index directory atomically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from acorn_hybrid_vector_search_spark.operators.ann import assign_clusters


def stream_index_embeddings(
    stream: DataFrame,
    centroids: np.ndarray,
    index_path: str,
    checkpoint: str,
    *,
    vec_col: str = "embedding",
):
    """Start the indexing query: returns the StreamingQuery. ``stream``
    must contain ``vec_col``; all its columns are persisted into the
    lists (same layout ivf_read expects)."""
    assigned = assign_clusters(stream, centroids, vec_col=vec_col)

    # foreachBatch + batch append, NOT the streaming parquet sink: that sink
    # stamps a _spark_metadata log and readers would then ignore every file
    # the original batch ivf_write produced. Batch appends coexist with the
    # initial files; exactly-once still holds via the checkpoint (a replayed
    # batch id is skipped by foreachBatch bookkeeping).
    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").partitionBy("cluster_id").parquet(
            f"{index_path}/lists"
        )

    return (
        assigned.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
