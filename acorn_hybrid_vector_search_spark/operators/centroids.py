"""Group-wise vector centroids + nearest-centroid assignment.

The "vector analytics" aggregate a hybrid-search engine needs around its
ANN core: per-group mean embeddings (class prototypes, cluster refresh
steps, drift monitoring) and nearest-prototype classification. This is
also exactly one k-means Lloyd iteration expressed relationally — the
same shape operators/ann.py uses with a sampled codebook.

Plan shape:
- ``label_centroids``: posexplode(embedding) -> groupBy(label, pos) sum —
  ONE shuffle keyed on (label, position), with map-side partial sums, so
  shuffled volume is |labels| x dim regardless of row count; then the
  tiny per-(label,pos) sums fold back into arrays.
- ``assign_nearest``: the |labels| x dim centroid table is a query-size
  constant — inlined as a plan literal; per-row argmin is a JVM
  higher-order fold (``array_min`` over (dist, label) structs). The
  corpus side is a pure narrow transformation: no join, no shuffle.

Determinism contract (oracle-checked): component sums are accumulated in
DECIMAL (exact, order-independent — double sums would differ run-to-run
with shuffle order) and divided in DOUBLE; distances accumulate
left-to-right over positions, matching the DuckDB oracle's list fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acorn_hybrid_vector_search_spark.functions.distance import l2_sq_distance


def label_centroids(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, centroid ARRAY<DOUBLE>, n) — exact mean embedding per label.

    DECIMAL(28,12) accumulation makes the sum independent of partition
    order (bit-reproducible across runs and engines); the final
    component = CAST(sum AS DOUBLE) / n.
    """
    per_pos = (
        emb.select(
            F.col(label_col).alias("label"),
            F.posexplode(vec_col).alias("pos", "x"),
        )
        .groupBy("label", "pos")
        .agg(
            # float → double (exact widening) → decimal: pins the binary
            # value both engines round to 12 dp, so sums are bit-identical
            F.sum(F.col("x").cast("double").cast("decimal(28,12)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_pos.withColumn("comp", F.col("s").cast("double") / F.col("n"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "comp"))),
                lambda st: st["comp"],
            ).alias("centroid"),
            F.max("n").alias("n"),
        )
    )


def assign_nearest(
    df: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "assigned",
) -> DataFrame:
    """Each row of ``df`` labeled with its nearest centroid (squared-L2;
    ties break to the smallest centroid label).

    The centroid table is a query-size constant (|labels| x dim), so it is
    collected once and inlined as a literal array of (label, vector)
    structs; the per-row argmin is then ``array_min`` over per-centroid
    (dist, label) structs — struct ordering IS (dist, then label), which
    encodes the tie-break. The corpus side stays a narrow projection:
    no join, no shuffle, no window — the plan a 100 TB scan wants.
    """
    rows = centroids.select("label", "centroid").collect()  # |labels| rows — bounded
    cands = F.array(
        *[
            F.struct(
                F.lit(r["label"]).alias("l"),
                F.array(*[F.lit(float(x)) for x in r["centroid"]]).alias("c"),
            )
            for r in sorted(rows, key=lambda r: r["label"])
        ]
    )
    scored = F.transform(
        cands,
        lambda s: F.struct(
            l2_sq_distance(F.col(vec_col), s["c"]).alias("d"), s["l"].alias("l")
        ),
    )
    return df.withColumn(out_col, F.array_min(scored)["l"])


def centroid_confusion(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Confusion counts (true label x nearest-centroid label) — the
    self-consistency check of the label structure in embedding space."""
    cents = label_centroids(emb, vec_col=vec_col, label_col=label_col)
    assigned = assign_nearest(emb, cents, vec_col=vec_col)
    return (
        assigned.groupBy(F.col(label_col).alias("label"), "assigned")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
