"""Ingestion ETL: ABO listings + image-id mappings → the `items` table.

Reference pipeline (/root/reference/parse-json.py): load 16 JSONL listing
files (S1), load map*.csv image-id mappings (S2), correlate each image id
to its listing (J1), project to the 5 query attributes (P1), and emit the
metadata store. The reference does this with nested O(N·M) Python loops
and an awk shell-out; here each step is a DataFrame op so Catalyst fuses
scans/projections and picks broadcast vs shuffle join by stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# P1: the five attributes every query consults (/root/reference/parse-json.py:68-81)
QUERY_ATTRS = ("brand", "color", "item_weight", "model_year", "country")


def read_listings(spark: SparkSession, path: str) -> DataFrame:
    """S1 — JSONL listing scan (/root/reference/parse-json.py:11-16).

    ``spark.read.json`` natively handles line-delimited JSON and infers
    the nested ABO attribute shapes; globs cover the 16 shard files
    (``listings_*.json``). At 100 TB scale: splittable per-line reads,
    schema supplied explicitly to skip inference double-scan if desired.
    """
    return spark.read.json(path)


def read_mappings(spark: SparkSession, path: str) -> DataFrame:
    """S2 — image-id mapping CSV scan (/root/reference/parse-json.py:25-30,
    /root/reference/acorn.py:243-250). Schema: image_id,width,height,path.

    The reference shells out to awk for column 0 and slices ``parts[3][3:]``
    for the basename (stripping the 2-hex-dir prefix ``"00/"`` — its code
    comment says "removes 'id:' prefix", which is wrong; SURVEY.md §1.4).
    Here: one CSV read + ``substring_index`` for the basename.
    """
    df = spark.read.csv(path, header=False).toDF("image_id", "width", "height", "rel_path")
    return df.select(
        "image_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "rel_path",
        F.substring_index("rel_path", "/", -1).alias("filename"),
    )


def correlate_listings(mappings: DataFrame, listings: DataFrame) -> DataFrame:
    """J1 — listing↔image correlation join
    (/root/reference/parse-json.py:41-61).

    Reference semantics: for each image id, find a listing where
    ``main_image_id == id`` OR ``id ∈ other_image_id``; the FIRST match in
    file order wins; unmatched images are dropped. The nested-loop scan
    becomes: equi-join on main_image_id UNION equi-join on exploded
    other_image_id, then ``row_number()`` dedupe. Main-image matches are
    preferred over other-image matches (priority 0 vs 1), then listing
    order — reproducing "first match wins" deterministically.

    Scale: both branches are shuffle equi-joins on image_id (high-entropy
    key, no skew); the explode multiplies the listing side only. With a
    small listing dim, Catalyst broadcasts it.
    """
    ls = listings.withColumn("_listing_ord", F.monotonically_increasing_id())

    main = ls.select(
        F.col("main_image_id").alias("image_id"),
        F.struct(*[F.col(a) for a in QUERY_ATTRS]).alias("meta"),
        F.lit(0).alias("_prio"),
        "_listing_ord",
    ).where(F.col("image_id").isNotNull())

    other = (
        ls.where(F.col("other_image_id").isNotNull())
        .select(
            F.explode("other_image_id").alias("image_id"),
            F.struct(*[F.col(a) for a in QUERY_ATTRS]).alias("meta"),
            F.lit(1).alias("_prio"),
            "_listing_ord",
        )
    )

    cand = mappings.join(main.unionByName(other), "image_id")
    w = Window.partitionBy("image_id").orderBy(F.col("_prio").asc(), F.col("_listing_ord").asc())
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("image_id", "filename", "meta.*")
    )


def build_items(
    spark: SparkSession, listings_path: str, mappings_path: str
) -> DataFrame:
    """Full metadata ETL: S1 + S2 + J1 + P1 → items-shaped table with a
    dense item_id (zipWithIndex-free: row_number over filename order —
    deterministic, matches the reference's positional-id convention)."""
    listings = read_listings(spark, listings_path)
    mappings = read_mappings(spark, mappings_path)
    for attr in QUERY_ATTRS:
        if attr not in listings.columns:
            listings = listings.withColumn(attr, F.lit(None))
    corr = correlate_listings(mappings, listings)
    w = Window.orderBy("filename")
    return corr.withColumn("item_id", F.row_number().over(w) - 1).select(
        "item_id", "filename", *QUERY_ATTRS
    )
