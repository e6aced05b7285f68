"""Explicit StructType schemas for the engine's core tables.

The reference keeps its data model implicit (parallel .npy arrays + a
dict-of-JSON metadata store; /root/reference/pre-filter.py:17-56,
/root/reference/acorn.py:242-266). We make it one explicit relational
schema: nullable typed columns, where absence-of-attribute maps to NULL
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Language-tagged string attribute: [{language_tag, value}] — the shape of
# `brand` and `color` in the ABO metadata (/root/reference/survey_metadata.py:63-71;
# access pattern meta[key][0]["value"], /root/reference/acorn.py:178-185).
LANG_TAGGED = ArrayType(
    StructType(
        [
            StructField("language_tag", StringType(), True),
            StructField("value", StringType(), True),
        ]
    )
)

# item_weight: doubly-nested with a unit-normalized pounds value
# (/root/reference/survey_metadata.py:50-53; SURVEY.md §1.2).
WEIGHT = ArrayType(
    StructType(
        [
            StructField(
                "normalized_value",
                StructType(
                    [
                        StructField("unit", StringType(), True),
                        StructField("value", DoubleType(), True),
                    ]
                ),
                True,
            ),
            StructField("unit", StringType(), True),
            StructField("value", DoubleType(), True),
        ]
    )
)

# model_year: [{value: int}] (/root/reference/acorn.py:293-298).
MODEL_YEAR = ArrayType(StructType([StructField("value", IntegerType(), True)]))

# The `items` metadata table (FIXTURES.md §1): one row per image, the five
# ABO attributes the reference projects (/root/reference/parse-json.py:68-81).
ITEMS_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), False),
        StructField("filename", StringType(), False),
        StructField("brand", LANG_TAGGED, True),
        StructField("color", LANG_TAGGED, True),
        StructField("item_weight", WEIGHT, True),
        StructField("model_year", MODEL_YEAR, True),
        StructField("country", StringType(), True),  # bare scalar, not array-of-struct
    ]
)

# Embedding collection: one DataFrame replaces the reference's parallel
# (N,2048) ndarray + (N,) filename array (/root/reference/pre-filter.py:17-21).
EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType(), True),
    ]
)

# Hybrid query battery row (FIXTURES.md §3): predicates is the reference's
# {"attr": ["op", value]} dict, JSON-encoded (/root/reference/acorn.py:291-298).
QUERIES_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("query_vec", ArrayType(FloatType()), False),
        StructField("k", IntegerType(), False),
        StructField("predicates", StringType(), True),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata
# (charter extension; image bytes analog of /root/reference/vector_embeddings.py S3).
ASSETS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("path", StringType(), True),
        StructField("modality", StringType(), True),  # 'image' | 'audio' | 'video'
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Driver testdata table names (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
