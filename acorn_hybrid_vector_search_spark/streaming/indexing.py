"""Streaming index maintenance: append new embeddings into a persisted
IVF index without rebuilding it.

The reference rebuilds its whole HNSW graph from scratch every process
start (~51 s for 123k vectors, /root/reference/acorn.py:274-277); adding
items means re-adding everything. Here the index at rest is a
cluster-partitioned parquet table (operators.ann.ivf_write), so ingest is:

    stream of (id, embedding[, …]) rows
      → assign_clusters against the FROZEN codebook (map-only, BLAS batch)
      → write into lists/batch=<id>/, partitionBy cluster_id

Each micro-batch lands under its own batch= directory; readers see it on
the next query (cluster_id partition pruning unchanged, one extra
discovery level). The codebook is intentionally frozen — standard IVF practice:
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
    lists (same layout ivf_read expects).

    Note: appended members can exceed the codebook's stored cluster
    radii — after ingest, recompute radii (ann._cluster_radii) before
    relying on ``ivf_search_exact``'s pruning bound; nprobe search is
    unaffected."""
    assigned = assign_clusters(stream, centroids, vec_col=vec_col)

    # foreachBatch + batch write, NOT the streaming parquet sink: that sink
    # stamps a _spark_metadata log and readers would then ignore every file
    # the original batch ivf_write produced. foreachBatch is AT-LEAST-ONCE —
    # after a failure/restart the same batch id can be delivered again — so
    # the write must be idempotent: each micro-batch owns its own
    # lists/batch=<id>/ subtree (ivf_write reserves batch=-1 for base rows)
    # and a replay OVERWRITES exactly that subtree instead of appending
    # duplicate vectors.
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").partitionBy("cluster_id").parquet(
            f"{index_path}/lists/batch={batch_id}"
        )

    return (
        assigned.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
