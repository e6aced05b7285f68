"""Core-scaling proof (r15, VERDICT r14 ask #8): the sf0.1 bench rows
are job-dispatch-floor-bound (17 MB of input — 8-of-10 scaling ratios
read ~1 in BENCH_r14_c8), so the 100 TB parallelism claims rested on
plan shape alone. This tool measures the heavy operator families at
x16 of sf0.1 volume (tools/make_scale_ladder.py — distribution-
preserving synthesis, ~80k docs / 32k vectors / 1.6M events) under the
CURRENT ``SPARK_GRAFT_CPUS`` core count and merges the result into
``CORE_SCALING.json``; when both an 8-core and a 32-core run are
present it emits the speedup ratio per family. Ratios ≫ 1 where the
plans predict data-parallel work are the missing measurement behind
the scale claims.

Run (two processes — the master is fixed per JVM):
    python tools/make_scale_ladder.py /root/testdata/sf0.1 16
    SPARK_GRAFT_CPUS=8  python tools/bench_core_scaling.py 16
    SPARK_GRAFT_CPUS=32 python tools/bench_core_scaling.py 16

Methodology: per family, one warm-up then median of 3 (same as
bench.py); families and inputs are exactly tools/bench_ladder.py's so
the x-volume and x-core artifacts are comparable. Inputs are read cold
from the ladder parquet (no hot cache) — at this volume the compute,
not the dispatch floor, dominates, which is the point.
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

RUNS = 3


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-core-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    # size scan splits to the COMPUTE, not the bytes (guide §6 / the
    # int8-sidecar parallelism note): the ladder tables are ~0.7 MB
    # per file, and the default 128 MB target + 4 MB open-cost packs
    # all 48 files into ~2 splits — the per-row-heavy scan stages
    # (fingerprint UDFs, shingle explodes) then run 2 tasks regardless
    # of core count, which would measure the split packing, not the
    # operators. 4 MB splits give every core work at both core counts.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "1m")

    from acorn_hybrid_vector_search_spark.operators.asof import (
        asof_join_chunked,
    )
    from acorn_hybrid_vector_search_spark.operators.decontam import (
        contamination_stats_bloom,
    )
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        minhash_near_dups,
        near_dup_components,
        winnow_near_dups,
    )
    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        nsw_read_topk,
        nsw_write,
    )
    from acorn_hybrid_vector_search_spark.operators.hybrid import (
        prefilter_search,
    )
    from acorn_hybrid_vector_search_spark.operators.knn import knn_exact
    from acorn_hybrid_vector_search_spark.operators.substring_dedup import (
        remove_duplicate_ngrams,
    )
    from acorn_hybrid_vector_search_spark.sources.listings import build_items

    d = os.path.join(LADDER, f"x{factor}")
    if not os.path.isdir(d):
        raise SystemExit(
            f"{d} missing — run tools/make_scale_ladder.py first"
        )
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
    events = spark.read.parquet(os.path.join(d, "events.parquet"))
    orders = spark.read.parquet(os.path.join(d, "orders.parquet"))
    n_docs, n_vec, n_ev = docs.count(), emb.count(), events.count()
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]

    fam: dict[str, float] = {}
    fam_samples: dict[str, list[float]] = {}

    def run(name: str, fn) -> None:
        fn()  # warm-up (codegen, broadcast relations)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn()
            samples.append(round(time.perf_counter() - t0, 3))
        # MIN of RUNS, all samples disclosed: this sandbox's host shows
        # exogenous load spikes (loadavg 15-20 with zero local
        # processes), and a multi-minute pass gets hit mid-run — the
        # minimum is the standard interference-robust wall statistic
        # for a scaling RATIO (both core counts benefit equally; a
        # median can triple on one side from a single host burst).
        fam_samples[name] = samples
        fam[name] = min(samples)
        print(f"c{cpus} x{factor} {name}: {fam[name]}s {samples}", flush=True)

    run("pure_topk", lambda: knn_exact(emb, qvec, 10).collect())
    run(
        "prefilter_topk",
        lambda: prefilter_search(
            emb, qvec, {"label": ["exact", 3]}, 10
        ).collect(),
    )
    run(
        "minhash_pairs_components",
        lambda: near_dup_components(
            docs, minhash_near_dups(docs, verify_threshold=0.7)
        ).count(),
    )
    run(
        "winnow_near_dups",
        lambda: winnow_near_dups(docs).count(),
    )
    run(
        "dup_ngram_removal",
        lambda: remove_duplicate_ngrams(docs)
        .agg(F.sum("n_removed"), F.count(F.lit(1)))
        .collect(),
    )
    run(
        "decontaminate_bloom",
        lambda: contamination_stats_bloom(
            docs, docs.limit(500), n=3
        ).count(),
    )
    idx = os.path.join(d, f"nsw_idx_c{cpus}")

    def _build() -> None:
        if os.path.exists(idx):
            shutil.rmtree(idx)
        nsw_write(emb, idx)

    run("nsw_build_write", _build)
    queries = [(i, qvec) for i in range(4)]
    run(
        "nsw_persisted_search",
        lambda: nsw_read_topk(spark, idx, queries, 10).count(),
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
    )

    out_path = os.path.join(ROOT, "CORE_SCALING.json")
    merged = {"base_sf": 0.1, "runs": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.setdefault("runs", {})
    merged["runs"][f"x{factor}_c{cpus}"] = {
        "factor": factor,
        "cpus": int(cpus),
        "n_docs": n_docs,
        "n_vectors": n_vec,
        "n_events": n_ev,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "families": fam,
        "samples": fam_samples,
    }
    runs = merged["runs"]
    speedups: dict[str, dict] = {}
    for key, lo in runs.items():
        if lo["cpus"] != 8:
            continue
        hi = runs.get(f"x{lo['factor']}_c32")
        if hi is None:
            continue
        speedups[f"x{lo['factor']}"] = {
            k: round(lo["families"][k] / v, 2)
            for k, v in hi["families"].items()
            if k in lo["families"] and v > 0
        }
    if speedups:
        merged["speedup_8_to_32"] = speedups
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
