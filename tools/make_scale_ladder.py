"""Synthesize a scale ladder from /root/testdata/sf0.1 — replicated
tables at x4 / x16 / x48 volume under ``.ladder/x{R}/`` (gitignored;
only the measured BENCH_LADDER.json is committed).

Why synthesis, not another sf: the driver ships sf ≤ 0.1 only, and the
100×-scale claims otherwise rest purely on plan shapes (r4 verdict ask
#2). The ladder keeps the data DISTRIBUTION scale-invariant so measured
totals should grow near-linearly if and only if the plans are the
shapes we claim:

- ``documents``: each replica perturbs every 4th token into a
  replica-specific word (same word at the same position for every doc
  of a replica). Intra-replica near-dup structure is preserved
  (aligned docs get identical substitutions); across replicas every
  3-shingle window overlaps a substituted position except 1 in 4, so
  cross-replica Jaccard ≈ 0.14 — far below the 0.7 near-dup threshold.
  Duplicate-pair volume and duplicated-gram volume therefore scale
  LINEARLY with R instead of quadratically (a naive copy would make
  every original a cluster of R exact dups, benchmarking a corpus no
  dedup pipeline would ever see).
- ``embeddings``: deterministic per-(replica, id, dim) jitter of ±0.08
  max keeps the space filled rather than R-fold degenerate (identical
  points collapse NSW neighborhoods and IVF cells).
- ``events``/``orders``: keys offset per replica (user_id/o_custkey
  share the stride so the as-of join still matches) — the KEY SPACE
  multiplies while per-key history stays constant, which is how real
  event data grows.

Deterministic: pure column expressions over the source parquet, no RNG.
Run: ``python tools/make_scale_ladder.py [sf_dir] [factors...]``.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LADDER = os.path.join(ROOT, ".ladder")
ID_STRIDE = 10_000_000  # > any sf0.1 id; replica r adds r*stride

sys.path.insert(0, ROOT)

from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402
from acorn_hybrid_vector_search_spark.sources.testdata import load_table  # noqa: E402


def _replicas(spark: SparkSession, factor: int) -> DataFrame:
    return spark.range(factor).select(F.col("id").cast("int").alias("rep"))


def scale_documents(df: DataFrame, reps: DataFrame) -> DataFrame:
    toks = F.split("text", " ")
    perturbed = F.array_join(
        F.transform(
            toks,
            lambda tok, i: F.when(
                (F.col("rep") > 0) & (i % 4 == 1),
                F.concat(F.lit("r"), F.col("rep"), F.lit("p"), i),
            ).otherwise(tok),
        ),
        " ",
    )
    return df.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep").cast("long") * ID_STRIDE).alias("doc_id"),
        perturbed.alias("text"),
        "lang",
        "source",
        F.length(perturbed).alias("n_chars"),
    )


def scale_embeddings(df: DataFrame, reps: DataFrame) -> DataFrame:
    jitter = F.transform(
        "embedding",
        lambda x, i: (
            x
            + F.when(F.col("rep") == 0, F.lit(0.0)).otherwise(
                (
                    F.pmod(
                        F.col("vec_id") * 31 + i.cast("long") * 7 + F.col("rep") * 13,
                        F.lit(17),
                    ).cast("double")
                    - 8.0
                )
                * 0.01
            ).cast("float")
        ).cast("float"),
    )
    return df.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep").cast("long") * ID_STRIDE).alias("vec_id"),
        jitter.alias("embedding"),
        "label",
    )


def scale_events(df: DataFrame, reps: DataFrame) -> DataFrame:
    return df.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("rep").cast("long") * ID_STRIDE).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep").cast("long") * ID_STRIDE).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def scale_orders(df: DataFrame, reps: DataFrame) -> DataFrame:
    return df.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("rep").cast("long") * ID_STRIDE).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("rep").cast("long") * ID_STRIDE).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


SCALERS = {
    "documents": scale_documents,
    "embeddings": scale_embeddings,
    "events": scale_events,
    "orders": scale_orders,
}


# ---------------------------------------------------------------------------
# Skew-adversarial variant (r5 verdict ask #5): the uniform ladder keeps
# dup/gram volume linear AND near-uniform per key — precisely NOT the
# regime the de-skew work targets. ``--skew`` writes x{R}skew/documents
# where three power-law heavy hitters each carry 10-30% of rows:
#
# - hot FINGERPRINT: ~14% of docs (doc_id % 7 == 3) become the literal
#   same boilerplate page — the "empty/boilerplate page duplicated
#   10^6-10^8 times" shape exact_dedup's survivor join must absorb;
# - hot GRAM: a further ~17% (doc_id % 6 == 1) get a fixed 8-token
#   boilerplate sentence prepended — with the fingerprint clones, ONE
#   8-gram occurs in ~31% of all docs (dup_ngram_removal's marking);
# - hot DOMAIN: 25% of docs (doc_id % 4 == 0) get source='megadomain'
#   — the mega-domain cap_per_group exists to cap.
#
# Deterministic, same replica perturbation as the uniform ladder for
# the remaining text so overall volume still scales linearly.

HOT_PAGE = " ".join(
    f"boiler{w}" for w in "plate page terms of service all rights reserved "
    "contact privacy cookie policy navigation footer copyright site "
    "map search login register home about help faq news".split()
)
HOT_SENTENCE = "subscribe to our newsletter for updates and exclusive offers"


def scale_documents_skew(df: DataFrame, reps: DataFrame) -> DataFrame:
    base = scale_documents(df, reps)
    is_clone = F.col("doc_id") % 7 == 3
    has_gram = F.col("doc_id") % 6 == 1
    text = (
        F.when(is_clone, F.lit(HOT_PAGE))
        .when(has_gram, F.concat(F.lit(HOT_SENTENCE), F.lit(" "), F.col("text")))
        .otherwise(F.col("text"))
    )
    source = F.when(F.col("doc_id") % 4 == 0, F.lit("megadomain")).otherwise(
        F.col("source")
    )
    return base.select(
        "doc_id",
        text.alias("text"),
        "lang",
        source.alias("source"),
        F.length(text).alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Planted-template variant (r6 verdict ask #1): ``--template`` writes
# x{R}tmpl/documents where 20% of docs (doc_id % 5 == 2) are
# NEAR-identical-but-not-exact copies of one boilerplate template —
# each ends in a doc-unique token, so fingerprints all DIFFER and the
# exact rung cannot collapse the cluster. Every template doc lands in
# the same LSH band buckets / winnow fingerprint buckets, so uncapped
# pair emission from the cluster is C(0.2·n, 2) — quadratic by
# construction. This is the regime the bucket_cap exists to bound.

TEMPLATE_PAGE = " ".join(
    f"plate{w} form{w} widget{w}" for w in
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar".split()
)


def scale_documents_template(df: DataFrame, reps: DataFrame) -> DataFrame:
    base = scale_documents(df, reps)
    is_tpl = F.col("doc_id") % 5 == 2
    text = F.when(
        is_tpl,
        F.concat(F.lit(TEMPLATE_PAGE), F.lit(" variant"), F.col("doc_id").cast("string")),
    ).otherwise(F.col("text"))
    return base.select(
        "doc_id",
        text.alias("text"),
        "lang",
        "source",
        F.length(text).alias("n_chars"),
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--skew", "--template")]
    skew = "--skew" in sys.argv[1:]
    template = "--template" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    factors = [int(a) for a in args[1:]] or ([16] if (skew or template) else [4, 16, 48])
    spark = get_spark("make-scale-ladder")
    for factor in factors:
        suffix = "skew" if skew else ("tmpl" if template else "")
        out_dir = os.path.join(LADDER, f"x{factor}{suffix}")
        reps = _replicas(spark, factor)
        if skew:
            scalers = {"documents": scale_documents_skew}
        elif template:
            scalers = {"documents": scale_documents_template}
        else:
            scalers = SCALERS
        for table, scaler in scalers.items():
            dest = os.path.join(out_dir, f"{table}.parquet")
            if os.path.exists(dest):
                shutil.rmtree(dest)
            src = load_table(spark, sf_dir, table)
            scaled = scaler(src, reps)
            # write partitioned wide enough that downstream scans start
            # parallel (replica × source-partition grain)
            scaled.repartition(
                max(spark.sparkContext.defaultParallelism, factor)
            ).write.parquet(dest)
            n = spark.read.parquet(dest).count()
            print(f"x{factor}/{table}: {n} rows -> {dest}", flush=True)


if __name__ == "__main__":
    main()
