"""Approximate nearest-neighbor search at scale: IVF (inverted-file) index.

The reference's ANN index is a single-process HNSW graph
(/root/reference/acorn.py:26-49, modified hnswlib). A pointer-chasing
graph doesn't distribute; the standard cluster-scale design is IVF:

- **build**: learn C centroids (distributed KMeans on a sample), assign
  every row to its nearest centroid, store ``cluster_id`` as a column —
  at 100 TB, write the table ``partitionBy("cluster_id")`` so each list
  is its own file group.
- **search**: rank centroids by distance to the query (driver-side — the
  centroid table is tiny), take the ``nprobe`` nearest, scan ONLY those
  clusters (partition pruning via ``cluster_id IN (...)``), exact top-k
  inside. Recall is tunable via nprobe; nprobe = C degrades gracefully to
  exact search.

This mirrors the reference's attribute-specific-index insight
(/root/reference/acorn_attribute_specific.py:44-65 — "search a smaller
index") with a data-driven partitioning instead of a metadata-driven one.

Assignment/search distance runs on NumPy via an Arrow-batched pandas UDF:
one (batch × dim) @ (dim × C) matmul per batch — BLAS replaces the
reference's hand-SIMD (hnswlib/hnswlib/space_l2.h).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from acorn_hybrid_vector_search_spark.operators.knn import knn_exact


@dataclass
class IVFIndex:
    """Driver-side handle: the indexed table + its (tiny) codebook."""

    df: DataFrame  # original columns + cluster_id
    centroids: np.ndarray  # (C, dim) float64
    vec_col: str
    id_col: str

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])


def _kmeans(sample: np.ndarray, n_clusters: int, n_iter: int, seed: int) -> np.ndarray:
    """Plain Lloyd's iterations on a driver-side sample (NumPy). The sample
    is bounded (≤ ~100k rows regardless of table size) — training cost is
    independent of data scale; only assignment is distributed."""
    rng = np.random.RandomState(seed)
    n = sample.shape[0]
    k = min(n_clusters, n)
    centroids = sample[rng.choice(n, size=k, replace=False)]
    for _ in range(n_iter):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(axis=0)
            else:  # re-seed empty cluster deterministically
                centroids[c] = sample[rng.randint(n)]
    return centroids.astype(np.float64)


def assign_clusters(
    df: DataFrame, centroids: np.ndarray, *, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``cluster_id`` = argmin_c ‖v − centroid_c‖². Arrow-batched: one
    BLAS matmul per batch, no per-row Python."""
    cent = centroids  # captured; broadcast with the serialized UDF
    cent_sq = (cent**2).sum(axis=1)  # (C,)

    @F.pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float64)  # (B, dim)
        # argmin over ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is constant per row → drop
        scores = -2.0 * (x @ cent.T) + cent_sq[None, :]
        return pd.Series(scores.argmin(axis=1).astype(np.int32))

    return df.withColumn("cluster_id", assign(F.col(vec_col)))


def ivf_build(
    df: DataFrame,
    n_clusters: int = 16,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 20_000,
    n_iter: int = 10,
    seed: int = 42,
) -> IVFIndex:
    """Train the codebook on a bounded sample and tag every row with its
    cluster. (Persist with ``index.df.write.partitionBy('cluster_id')`` to
    make nprobe pruning a file-skip at rest.)"""
    n = df.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample_df = df.select(vec_col) if frac >= 1.0 else df.select(vec_col).sample(frac, seed=seed)
    sample = np.asarray([r[0] for r in sample_df.collect()], dtype=np.float64)
    centroids = _kmeans(sample, n_clusters, n_iter, seed)
    return IVFIndex(
        df=assign_clusters(df, centroids, vec_col=vec_col),
        centroids=centroids,
        vec_col=vec_col,
        id_col=id_col,
    )


def ivf_write(index: IVFIndex, path: str) -> None:
    """Persist the index: rows partitioned BY cluster_id (each inverted
    list is its own directory → nprobe pruning is a file skip, verified
    via PartitionFilters in the scan plan) + the codebook as a tiny
    parquet sidecar. The reference rebuilds its HNSW graph every run
    (~51 s, /root/reference/acorn.py:274-277, README.md:232); here build
    once, prune forever."""
    # base rows live under batch=-1: streaming ingest appends sibling
    # batch=<id> directories (streaming/indexing.py), so every writer owns
    # exactly one subtree and a replayed micro-batch can overwrite its own
    # idempotently. Partition discovery needs consistent depth, hence the
    # level exists from the start.
    index.df.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{path}/lists/batch=-1"
    )
    spark = index.df.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(index.centroids)]
    spark.createDataFrame(rows, "cluster_id INT, centroid ARRAY<DOUBLE>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/codebook")


def ivf_read(
    spark, path: str, *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> IVFIndex:
    """Load a persisted index. The lists DataFrame carries cluster_id as a
    PARTITION column, so `cluster_id IN (...)` prunes at file-listing time."""
    cb = spark.read.parquet(f"{path}/codebook").orderBy("cluster_id").collect()
    centroids = np.asarray([r["centroid"] for r in cb], dtype=np.float64)
    # `batch` is a writer-ownership detail (base load vs streaming
    # micro-batches) — drop it from the logical schema; cluster_id pruning
    # is unaffected (both are partition levels).
    df = spark.read.parquet(f"{path}/lists").drop("batch")
    return IVFIndex(df=df, centroids=centroids, vec_col=vec_col, id_col=id_col)


def ivf_search(
    index: IVFIndex,
    query_vec: Sequence[float],
    k: int,
    *,
    nprobe: int = 4,
    predicate: Column | None = None,
) -> DataFrame:
    """Top-k by L2² among the ``nprobe`` clusters nearest the query.

    The cluster ranking is a C-row NumPy computation on the driver; the
    scan applies ``cluster_id IN (...)`` FIRST (partition-prunable), then
    the optional metadata predicate, then exact top-k — so the expensive
    distance work touches ~nprobe/C of the data.
    """
    q = np.asarray(list(query_vec), dtype=np.float64)
    d2 = ((index.centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2, kind="stable")[:nprobe]]
    scan = index.df.filter(F.col("cluster_id").isin(probe))
    if predicate is not None:
        scan = scan.filter(predicate)
    return knn_exact(scan, list(query_vec), k, vec_col=index.vec_col, id_col=index.id_col)
