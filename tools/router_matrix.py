"""Per-selectivity-class ROUTER decisions + recall confirmations.

The reference's headline finding (/root/reference/README.md:19-25) is a
hand-run strategy comparison: pre-filter always exact but cost ∝
survivors; post-filter fast but collapses on selective predicates;
attribute-specific index wins on sparse attributes. Our StrategyRouter
(plans/router.py) encodes that decision; this tool proves, per SURVEY.md
§2.4 class, WHICH strategy the router picks and that the routed answer
is exact (recall 1.0 vs the full-table pre-filter oracle).

    python tools/router_matrix.py [sf_dir] [k]

One JSON line per class:
    {"class", "routed_strategy", "est_selectivity", "true_selectivity",
     "median_s", "recall_vs_exact", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from acorn_hybrid_vector_search_spark.functions.predicates import abo_accessors  # noqa: E402
from acorn_hybrid_vector_search_spark.operators.hybrid import prefilter_search  # noqa: E402
from acorn_hybrid_vector_search_spark.plans.router import (  # noqa: E402
    StrategyRouter,
    collect_stats,
)
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

# SURVEY.md §2.4 / reference acorn.py:296-298, acorn_attribute_specific.py:73
CLASSES = {
    "c1_no_predicate": None,
    "c2_weight_brand": {"item_weight": ["<", 2], "brand": ["substring", "Amazon"]},
    "c2_country_brand": {"country": ["exact", "IN"], "brand": ["substring", "Amazon"]},
    "c3_country_us": {"country": ["exact", "US"]},
    "c3_sparse_model_year": {"model_year": ["leq", 2018]},
}

RUNS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("router-matrix")
    spark.sparkContext.setLogLevel("ERROR")

    items = spark.read.parquet("/root/repo/fixtures/abo/items.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumnRenamed(
        "vec_id", "item_id"
    )
    coll = items.join(emb, "item_id").cache()
    n = coll.count()
    q = coll.where(F.col("item_id") == 1).select("embedding").head()[0]
    acc = abo_accessors()

    # A1 histograms over the PREDICATE-VISIBLE scalar per attribute
    # (the same value each accessor compares against, SURVEY.md §2.3):
    # [0].value for brand/color/model_year, normalized pounds for
    # item_weight, the bare string for country. Collected once — the
    # driver-side dict the router consults per query.
    flat = coll.select(
        F.col("brand").getItem(0).getField("value").alias("brand"),
        F.col("color").getItem(0).getField("value").alias("color"),
        F.col("item_weight")
        .getItem(0)
        .getField("normalized_value")
        .getField("value")
        .alias("item_weight"),
        F.col("model_year").getItem(0).getField("value").cast("long").alias("model_year"),
        "country",
    )
    stats = collect_stats(flat, ["brand", "color", "item_weight", "model_year", "country"])

    router = StrategyRouter(stats)
    # K5 materialization: model_year presence subset (the reference's
    # attribute-specific second index)
    sub_items = spark.read.parquet("/root/repo/fixtures/abo/items_model_year.parquet")
    subset = sub_items.join(emb, "item_id").cache()
    router.register_subset("model_year_subset", subset, ["model_year"], subset.count())

    for cls, pred in CLASSES.items():
        route = router.route(pred, k)
        n_match = prefilter_search(coll, q, pred, n, accessors=acc, id_col="item_id").count()
        exact_ids = [
            r["item_id"]
            for r in prefilter_search(
                coll, q, pred, k, accessors=acc, id_col="item_id"
            ).collect()
        ]

        def run():
            return [
                r["item_id"]
                for r in router.search(
                    coll, q, pred, k, accessors=acc, id_col="item_id"
                ).collect()
            ]

        run()  # warm
        samples, got = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            got = run()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        recall = (
            round(len(set(got) & set(exact_ids)) / len(exact_ids), 4)
            if exact_ids
            else None
        )
        print(
            json.dumps(
                {
                    "class": cls,
                    "routed_strategy": route.strategy,
                    "est_selectivity": round(route.selectivity, 4),
                    "true_selectivity": round(n_match / n, 4),
                    "median_s": round(samples[len(samples) // 2], 4),
                    "rows": len(got),
                    "recall_vs_exact": recall,
                    "n_collection": n,
                    "k": k,
                }
            )
        )


if __name__ == "__main__":
    main()
