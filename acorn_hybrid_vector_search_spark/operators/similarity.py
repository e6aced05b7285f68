"""Similarity search kernels: Arrow/BLAS distance path + LSH bucketing.

Two physical paths for vector distance (SURVEY.md §7 risk 2):

- ``functions.distance`` — Catalyst higher-order functions, JVM-side,
  whole-stage codegen. Wins for low dims / when the distance feeds other
  JVM expressions (no Python boundary at all).
- this module — Arrow-batched pandas UDFs over NumPy: one BLAS matmul per
  ~10k-row batch. Wins for high dims (the reference's 2048-d ResNet
  vectors): ~dim/8 fewer interpreter-visible ops per row, the same role
  hnswlib's hand-SIMD kernels play in the reference
  (hnswlib/hnswlib/space_l2.h).

Plus **random-hyperplane LSH** (SimHash-for-vectors): a deterministic
bucket id per row; near-duplicate / top-k search joins only inside a
bucket (optionally multi-probed). This is the scale path when even one
exact scan per query is too much and no IVF index is materialized.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from acorn_hybrid_vector_search_spark.operators.knn import knn_exact  # noqa: F401 (re-export)


def l2_sq_distance_blas(vec_col, query_vec: Sequence[float]):
    """Column: squared-L2 distance to a fixed query via NumPy batches."""
    q = np.asarray(list(query_vec), dtype=np.float64)

    @F.pandas_udf(DoubleType())
    def dist(v: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float64)
        d = x - q[None, :]
        return pd.Series(np.einsum("ij,ij->i", d, d))

    return dist(vec_col)


def cosine_similarity_blas(vec_col, query_vec: Sequence[float]):
    """Column: cosine similarity to a fixed query via NumPy batches.
    Zero-norm rows yield NULL (matches functions.distance semantics)."""
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = float(np.sqrt((q**2).sum()))

    @F.pandas_udf(DoubleType())
    def sim(v: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", x, x)) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = (x @ q) / norms
        return pd.Series(np.where(norms == 0.0, np.nan, out))

    return sim(vec_col)


def knn_exact_blas(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
) -> DataFrame:
    """knn_exact with the BLAS distance kernel. Same TakeOrderedAndProject
    plan shape — only the distance projection differs."""
    return (
        df.withColumn(dist_col, l2_sq_distance_blas(F.col(vec_col), query_vec))
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    *,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Add a deterministic LSH bucket id: bit b = sign(v · hyperplane_b).

    Cosine-similar vectors collide with probability (1 − θ/π)^n_planes;
    pair operators then join on the bucket (Σ|bucket|² instead of N²).
    Map-only (no shuffle); the hyperplanes ship inside the serialized UDF.
    """
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def bucket(v: pd.Series) -> pd.Series:
        x = np.asarray(list(v), dtype=np.float64)
        bits = (x @ planes.T) >= 0.0  # (B, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    return df.withColumn(bucket_col, bucket(F.col(vec_col)))


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    *,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs with the quadratic probe confined to LSH
    buckets instead of a metadata column — the no-labels scale path.
    Candidate-only: pairs split across buckets are missed with probability
    (θ/π)·n_planes-ish; raise recall by unioning rotated-seed runs."""
    from acorn_hybrid_vector_search_spark.operators.dedup import embedding_near_dups

    bucketed = with_lsh_bucket(
        df, dim, n_planes=n_planes, seed=seed, vec_col=vec_col, bucket_col="lsh_bucket"
    )
    return embedding_near_dups(
        bucketed, threshold, vec_col=vec_col, id_col=id_col, bucket_col="lsh_bucket"
    )
