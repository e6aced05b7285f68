from __future__ import annotations

import random

import pytest

from acorn_hybrid_vector_search_spark.schemas import EMBEDDINGS_SCHEMA, ITEMS_SCHEMA
from acorn_hybrid_vector_search_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("acorn-tests", master="local[4]", shuffle_partitions=4)
    yield s


# ---------------------------------------------------------------------------
# ABO-shaped `items` fixture (FIXTURES.md §1): deterministic, exercises every
# predicate path — missing attributes, first-element-only, normalized vs raw
# weight, substring case-sensitivity, sparse model_year.

_BRANDS = ["AmazonBasics", "Amazon Brand - Solimo", "Rivet", "Stone & Beam", "Pinzon"]
_COLORS = ["Multicolor", "multi-colored", "Black", "Vintage White", "Blue"]
_COUNTRIES = ["IN", "IN", "IN", "IN", "US", "US", "GB", "IT", "AU", "DE"]
_UNITS = [("grams", 453.59237), ("pounds", 1.0), ("ounces", 16.0), ("kilograms", 0.45359237)]


def make_items_rows(n: int = 200, seed: int = 42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        brand = None
        if rng.random() < 0.98:  # brand ≈100%
            v = rng.choice(_BRANDS)
            brand = [{"language_tag": "en_US", "value": v}]
            if rng.random() < 0.2:  # arrays len>1 with DIFFERENT value at [1]
                brand.append({"language_tag": "en_GB", "value": "DECOY-" + v})
        color = None
        if rng.random() < 0.73:
            v = rng.choice(_COLORS)
            color = [{"language_tag": "en_US", "value": v}]
            if rng.random() < 0.2:
                color.append({"language_tag": "en_GB", "value": "DECOY"})
        item_weight = None
        if rng.random() < 0.70:
            pounds = round(rng.uniform(0.1, 10.0), 3)
            unit, per_pound = rng.choice(_UNITS)
            item_weight = [
                {
                    "normalized_value": {"unit": "pounds", "value": pounds},
                    "unit": unit,
                    "value": round(pounds * per_pound, 3),
                }
            ]
        model_year = [{"value": rng.randint(2010, 2022)}] if rng.random() < 0.03 else None
        country = rng.choice(_COUNTRIES)
        rows.append(
            {
                "item_id": i,
                "filename": f"{i:08x}.jpg",
                "brand": brand,
                "color": color,
                "item_weight": item_weight,
                "model_year": model_year,
                "country": country,
            }
        )
    return rows


@pytest.fixture(scope="session")
def items_df(spark):
    return spark.createDataFrame(make_items_rows(), schema=ITEMS_SCHEMA).cache()


@pytest.fixture(scope="session")
def items_rows():
    """The same fixture rows as plain dicts, indexed by item_id."""
    return make_items_rows()


@pytest.fixture(scope="session")
def embeddings_df(spark):
    """Small deterministic embedding collection joined 1:1 with items."""
    rng = random.Random(7)
    rows = [
        {
            "vec_id": i,
            "embedding": [round(rng.uniform(-1, 1), 4) for _ in range(16)],
            "label": i % 5,
        }
        for i in range(200)
    ]
    return spark.createDataFrame(rows, schema=EMBEDDINGS_SCHEMA).cache()
