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


def knn_batch_blas(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_col: str = "dist",
) -> DataFrame:
    """Batch multi-query exact top-k with MAP-SIDE top-k reduction — the
    100 TB shape for large query batches.

    ``queries`` is the bounded driver-side batch [(query_id, vector), …]
    (a query parameter, like ``knn_exact``'s single vector; it ships
    closure-captured with the UDF, one copy per executor). Plan:

      mapInPandas over (id, vec): per Arrow batch, ONE BLAS matmul gives
      the (batch × |Q|) distance block; np.argpartition keeps each query's
      local top-k → each input partition emits ≤ |Q|·k candidate rows
      total (accumulated across its batches, re-reduced at partition end)
      → global per-query row_number() ≤ k over the tiny candidate stream.

    The shuffle moves O(P·|Q|·k) rows instead of ``knn_batch``'s N·|Q| —
    the same partial-then-final aggregation shape Spark uses for map-side
    combine. Output: (query_id, id, dist); join payload back by id if
    needed (k·|Q| rows — a broadcast).
    """
    qids = np.asarray([int(q) for q, _ in queries], dtype=np.int64)
    qmat = np.asarray([list(v) for _, v in queries], dtype=np.float64)  # (Q, dim)
    q_sq = (qmat**2).sum(axis=1)  # (Q,)
    nq = len(qids)

    out_schema = f"query_id long, {id_col} long, {dist_col} double"

    def gen(batches):
        best_d = [np.empty(0, dtype=np.float64) for _ in range(nq)]
        best_i = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)  # (B, dim)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            d2 = (x**2).sum(axis=1)[:, None] - 2.0 * (x @ qmat.T) + q_sq[None, :]
            for qi in range(nq):
                d = np.concatenate([best_d[qi], d2[:, qi]])
                i = np.concatenate([best_i[qi], ids])
                if d.shape[0] > k:
                    keep = np.argpartition(d, k - 1)[:k]
                    d, i = d[keep], i[keep]
                best_d[qi], best_i[qi] = d, i
        rows = {
            "query_id": np.repeat(qids, [len(b) for b in best_i]),
            id_col: np.concatenate(best_i) if best_i else np.empty(0, np.int64),
            dist_col: np.concatenate(best_d) if best_d else np.empty(0, np.float64),
        }
        yield pd.DataFrame(rows)

    from pyspark.sql.window import Window

    cand = df.select(id_col, vec_col).mapInPandas(gen, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col(dist_col).asc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
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
    n_bands: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs with the quadratic probe confined to LSH
    buckets instead of a metadata column — the no-labels scale path.

    OR-banding recall dial: with ``n_bands`` independent hyperplane sets
    (rotated seeds), a pair is a candidate if it collides in ANY band —
    miss probability drops from (1 − (1−θ/π)^planes) to that value to the
    ``n_bands``-th power, the same AND-of-planes/OR-of-bands structure
    MinHash banding uses. Cost: bands× shuffle volume on the (id, vector)
    rows and one banded self-join; every candidate is exactly verified in
    the join condition, so false positives stay zero. Band 0 uses the
    base ``seed``, so raising ``n_bands`` strictly grows the pair set.
    """
    from acorn_hybrid_vector_search_spark.functions.distance import dot_product, l2_norm
    from acorn_hybrid_vector_search_spark.operators.dedup import _probe_parallelism

    t = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    for i in range(n_bands):
        t = with_lsh_bucket(
            t,
            dim,
            n_planes=n_planes,
            seed=seed + 1_000_003 * i,
            vec_col="v",
            bucket_col=f"_b{i}",
        )
    keys = F.array(
        *[
            F.concat_ws("|", F.lit(str(i)), F.col(f"_b{i}").cast("string"))
            for i in range(n_bands)
        ]
    )
    banded = (
        t.repartition(_probe_parallelism(df))
        .withColumn("nv", l2_norm(F.col("v")))
        .withColumn("bk", F.explode(keys))
        .drop(*[f"_b{i}" for i in range(n_bands)])
    )
    a, b = banded.alias("a"), banded.alias("b")
    denom = F.col("a.nv") * F.col("b.nv")
    sim = F.round(
        F.when(denom != 0.0, dot_product(F.col("a.v"), F.col("b.v")) / denom), 6
    )
    cond = (
        (F.col("a.bk") == F.col("b.bk"))
        & (F.col("a.id") < F.col("b.id"))
        & (sim >= threshold)
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])  # same pair can collide in >1 band
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (r6): the dimensionality-
# reduction scale path BEFORE coarse search. At the reference's 2048
# dims, a full-precision scan pays 2048 mul-adds/row; projecting to
# d' = O(log N / eps^2) dims preserves pairwise L2 within (1 ± eps)
# (JL lemma) and cuts scan cost ~in_dim/out_dim-fold. The matrix is the
# Achlioptas sparse-sign construction (entries +1/-1/0 with prob
# 1/6, 1/6, 2/3, scaled sqrt(3/out_dim)) derived DETERMINISTICALLY from
# the portable md5 hash — a pure function of (seed, i, j), so any
# engine (the DuckDB oracle included) reproduces the identical matrix
# and the identical projected doubles. The projection itself is a
# Catalyst fold per output dim (left-to-right accumulation, the same
# proven-bit-parity order as functions.distance), the matrix riding the
# plan as literals — zero Python in the hot path.


def projection_matrix(
    in_dim: int, out_dim: int, *, seed: str = "jl"
) -> list[list[float]]:
    """R[i][j] for i<in_dim, j<out_dim: sqrt(3/out_dim)·{+1,-1,0} with
    md5-derived signs (Achlioptas 2003). Deterministic and portable —
    md5 is the same bytes everywhere, unlike engine-native hash64s."""
    import hashlib
    import math

    s = math.sqrt(3.0 / out_dim)
    rows = []
    for i in range(in_dim):
        row = []
        for j in range(out_dim):
            h = int(
                hashlib.md5(f"rp:{seed}:{i}:{j}".encode()).hexdigest()[:15], 16
            ) % 6
            row.append(s if h == 0 else (-s if h == 1 else 0.0))
        rows.append(row)
    return rows


def project_embedding(vec_col, matrix: list[list[float]]):
    """ARRAY<double> Column: the input vector times the literal
    projection matrix. out[j] = Σ_i vec[i]·R[i][j], accumulated
    left-to-right over i (oracle-matching IEEE order).

    Scale bound (VERDICT r6 ask #3, MEASURED): each output dim is a
    LEFT-NESTED chain of ~in_dim/3 adds, and the JVM's recursive
    column-node conversion is superlinear in that depth — 11.6 s of
    one-time plan cost at depth 99, 95 s at 368, and a hard
    StackOverflowError at ~700 (the reference's 2048 input dims), where
    this path is BROKEN outright, not merely slow. Use
    ``project_embeddings_df``, which routes to the Arrow-batched matmul
    (``project_embedding_udf`` — bit-identical accumulation order)
    above ``RP_DEPTH_BUDGET``; the budget is pinned by measurement
    (BENCH_LADDER.json "rp_scaling") and tests/test_ann.py.
    """
    in_dim, out_dim = len(matrix), len(matrix[0])
    cols = []
    for j in range(out_dim):
        acc = F.lit(0.0)
        for i in range(in_dim):
            r = matrix[i][j]
            if r != 0.0:
                acc = acc + F.get(vec_col, i).cast("double") * F.lit(r)
        cols.append(acc)
    return F.array(*cols)


def project_embedding_udf(vec_col: str, matrix: list[list[float]]):
    """The large-matrix projection path: an Arrow-batched pandas UDF
    computing the SAME left-to-right accumulation over i as the
    Catalyst literal fold — column i's contribution is added to every
    output dim at step i, zero entries skipped exactly like the
    expression builder skips them — so the two paths produce
    BIT-IDENTICAL doubles (IEEE add/mul are deterministic given
    operand order; pinned by test_rp_projection_paths_bit_identical).
    One numpy (batch × nnz_i) fused multiply-add per input dim: ~100×
    the throughput of 87k expression nodes, zero codegen compile."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    R = np.asarray(matrix, dtype=np.float64)

    @pandas_udf("array<double>")
    def _proj(s: pd.Series) -> pd.Series:
        x = np.asarray(list(s), dtype=np.float64)
        acc = np.zeros((len(x), R.shape[1]), dtype=np.float64)
        for i in range(R.shape[0]):
            nz = R[i] != 0.0
            if nz.any():
                acc[:, nz] += x[:, i : i + 1] * R[i][nz][None, :]
        return pd.Series(list(acc))

    return _proj(vec_col)


# Measured cliff (BENCH_LADDER.json "rp_scaling", local[32], 5k rows):
# the binding constraint is per-output-dim CHAIN DEPTH (≈ in_dim/3
# nested adds), not total node count — the one-time plan-conversion/
# analysis cost is superlinear in depth (3.2 s @ depth 32, 11.6 s @
# 99, 24.7 s @ 196, 95 s @ 368) and the JVM's recursive column-node
# conversion OVERFLOWS THE STACK at depth ~700 (2048→16 dies with
# StackOverflowError after ~49 s despite only 10.9k total nodes — the
# literal fold is BROKEN there, not just slow). Steady-state is at
# parity with the Arrow matmul by depth ~100 and loses beyond, so past
# the budget the matmul is strictly better on every axis.
RP_DEPTH_BUDGET = 128


def project_embeddings_df(
    df: DataFrame,
    matrix: list[list[float]],
    *,
    vec_col: str = "embedding",
    out_col: str = "p",
    depth_budget: int = RP_DEPTH_BUDGET,
) -> DataFrame:
    """Project a vector column by the JL matrix, ROUTING between the
    pure-Catalyst literal fold (shallow chains — zero Python, rides
    whole-stage codegen) and the Arrow-batched matmul UDF (deep — no
    expression-depth cliff) on the matrix's deepest per-output-dim
    accumulation chain. The two paths are bit-identical, so the route
    is a pure physical choice: oracles and results are unaffected."""
    depth = max(
        (sum(1 for r in col if r != 0.0) for col in zip(*matrix)), default=0
    )
    if depth <= depth_budget:
        return df.withColumn(out_col, project_embedding(F.col(vec_col), matrix))
    return df.withColumn(out_col, project_embedding_udf(vec_col, matrix))
