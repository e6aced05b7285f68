"""Scale-ladder measurement (r4 verdict ask #2): run the headline
operator families at x1 / x4 / x16 / x48 of sf0.1 volume (synthesized
by tools/make_scale_ladder.py) and record wall seconds + per-row cost.

The claim under test: every family's plan is the shape whose total
grows near-linearly in rows on a fixed-size cluster. A super-linear
family means a constant that doesn't amortize (driver-side state,
all-pairs blowup, skewed single-task stage) — exactly what plan-shape
reading can miss.

Families (the judge-named set):
- ``prefilter_topk`` / ``pure_topk``: exact hybrid search scan
- ``minhash_pairs`` + ``near_dup_components``: banded LSH + iterative CC
- ``dup_ngram_removal``: substring dedup (the de-skewed groupBy plan)
- ``nsw_build_write`` vs ``nsw_persisted_search``: graph build
  amortization — build cost may grow linearly, the SEARCH from the
  persisted index must stay flat-ish (it reads graphs, not the corpus)
- ``asof_chunked``: skew-safe as-of join

Writes BENCH_LADDER.json. Run after the generator:
    python tools/make_scale_ladder.py /root/testdata/sf0.1 1 4 16 48
    python tools/bench_ladder.py 1 4 16 48
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LADDER = os.path.join(ROOT, ".ladder")
sys.path.insert(0, ROOT)

from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 48]
    spark = get_spark("bench-ladder")
    results: dict[str, dict] = {}

    from acorn_hybrid_vector_search_spark.operators.asof import asof_join_chunked
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        minhash_near_dups,
        near_dup_components,
    )
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        nsw_read_topk,
        nsw_write,
    )
    from acorn_hybrid_vector_search_spark.operators.hybrid import prefilter_search
    from acorn_hybrid_vector_search_spark.operators.knn import knn_exact
    from acorn_hybrid_vector_search_spark.operators.substring_dedup import (
        remove_duplicate_ngrams,
    )

    for factor in factors:
        d = os.path.join(LADDER, f"x{factor}")
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        events = spark.read.parquet(os.path.join(d, "events.parquet"))
        orders = spark.read.parquet(os.path.join(d, "orders.parquet"))
        n_docs, n_vec, n_ev = docs.count(), emb.count(), events.count()
        qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        fam: dict[str, dict] = {}

        def run(name: str, fn, rows_in: int) -> None:
            t0 = time.time()
            out = fn()
            el = time.time() - t0
            fam[name] = {
                "sec": round(el, 3),
                "rows_in": rows_in,
                "rows_out": out,
                "us_per_row": round(1e6 * el / max(rows_in, 1), 3),
            }
            print(f"x{factor} {name}: {el:.2f}s over {rows_in} rows -> {out}",
                  flush=True)

        run("pure_topk", lambda: len(knn_exact(emb, qvec, 10).collect()), n_vec)
        run(
            "prefilter_topk",
            lambda: len(
                prefilter_search(emb, qvec, {"label": ["exact", 3]}, 10).collect()
            ),
            n_vec,
        )
        run(
            "minhash_pairs_components",
            lambda: near_dup_components(
                docs, minhash_near_dups(docs, verify_threshold=0.7)
            ).count(),
            n_docs,
        )
        run(
            "dup_ngram_removal",
            lambda: remove_duplicate_ngrams(docs)
            .agg(F.sum("n_removed"), F.count(F.lit(1)))
            .collect()[0][1],
            n_docs,
        )
        idx = os.path.join(d, "nsw_idx")
        if os.path.exists(idx):
            shutil.rmtree(idx)
        run("nsw_build_write", lambda: nsw_write(emb, idx) or n_vec, n_vec)
        queries = [(i, qvec) for i in range(4)]
        run(
            "nsw_persisted_search",
            lambda: nsw_read_topk(spark, idx, queries, 10).count(),
            n_vec,
        )
        deduped = orders.groupBy("o_custkey", "o_orderdate").agg(
            F.max("o_orderkey").alias("o_orderkey")
        )
        run(
            "asof_chunked",
            lambda: asof_join_chunked(
                events.select("event_id", "user_id", "ts"),
                deduped,
                left_on="ts",
                right_on="o_orderdate",
                left_by="user_id",
                right_by="o_custkey",
                value_cols=["o_orderkey"],
                chunk="90 days",
            ).count(),
            n_ev,
        )
        # round-6 family: winnowing fingerprint pairs — the codegen
        # fingerprint projection is a narrow map (linear by construction);
        # the pair join is Σ|bucket|², linear when dup volume is linear
        # (the ladder's perturbation contract)
        from acorn_hybrid_vector_search_spark.operators.dedup import (
            winnow_near_dups,
        )

        run(
            "winnow_pairs",
            lambda: winnow_near_dups(docs).count(),
            n_docs,
        )

        # round-5 families
        from acorn_hybrid_vector_search_spark.operators.bpe import bpe_train
        from acorn_hybrid_vector_search_spark.operators.lm_quality import (
            bigram_logprob_scores,
        )
        from acorn_hybrid_vector_search_spark.operators.scd import scd2_apply

        run(
            "bigram_lm_quality",
            lambda: bigram_logprob_scores(docs)
            .agg(F.count(F.lit(1)), F.sum("mean_logprob"))
            .collect()[0][0],
            n_docs,
        )
        run(
            "bpe_train_5",
            lambda: len(bpe_train(docs, 5)[0]),
            n_docs,
        )
        n_orders = orders.count()
        hist = orders.select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            F.col("o_orderdate").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
        cdc = orders.filter(F.col("o_orderkey") % 41 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_totalprice") * 2.0).alias("o_totalprice"),
        )
        run(
            "scd2_apply",
            lambda: scd2_apply(
                hist, cdc, ["o_orderkey"], ["o_orderstatus", "o_totalprice"],
                "2002-01-01 00:00:00",  # after max(o_orderdate): scd2_apply monotonic guard
            ).count(),
            n_orders,
        )
        results[f"x{factor}"] = {
            "n_docs": n_docs,
            "n_vectors": n_vec,
            "n_events": n_ev,
            "families": fam,
        }

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["results"].update(results)
    merged["results"] = dict(
        sorted(merged["results"].items(), key=lambda kv: int(kv[0][1:]))
    )
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
