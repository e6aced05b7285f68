"""Amortized-ACORN headline row (r10 — VERDICT r9 ask #5): the
baseline's 3.5 ms ACORN row (BASELINE.md / reference README.md:235)
times ONE in-process C++ ``knn_query`` against a PREBUILT hnswlib
index — no process start, no plan, no I/O. The engine's single-query
~50 ms is the Spark job-dispatch floor (py4j + codegen), which no plan
shape removes; the same-contract comparable is the PER-QUERY AMORTIZED
cost in the serving surface the engine actually ships: one
``nsw_read_topk(predicates={qid: …})`` batch over the prebuilt store
(build NOT timed — the reference doesn't time its 51 s build either),
wall time ÷ |Q|.

Measures a |Q|=64 batch of ACORN-shaped hybrid queries (exact-match
label predicates — the reference's filter-functor ``knn_query``
workload) and a |Q|=64 unfiltered batch (the brute ``knn_query``
workload) over the x16 ladder store (32k vectors, dim 64, 8 shards),
median of 5 after one warm-up. Idle-settle evidence: os.getloadavg()
is recorded AT LAUNCH — re-run on a quiet host if load1 > ~1.5
(PLANS.md methodology).

Writes the ``acorn_amortized`` section of BENCH_LADDER.json with the
baseline ratio. Run: python tools/bench_acorn_amortized.py [batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from acorn_hybrid_vector_search_spark.operators.graph_ann import (  # noqa: E402
    nsw_read_topk,
    nsw_write,
)
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

K = 10
EF = 64
BASELINE_ACORN_MS = 3.5  # reference README.md:235 (0.0035 s/query)
BASELINE_BRUTE_MS = 98.2  # reference pre-filter.py brute k-NN row


def main() -> None:
    q_n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    load1, load5, load15 = os.getloadavg()

    spark = get_spark("bench-acorn-amortized")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(
        os.path.join(ROOT, ".ladder", "x16", "embeddings.parquet")
    )
    n_vec = emb.count()
    root = tempfile.mkdtemp(prefix="acorn_amortized_")
    path = root + "/graph"
    t0 = time.time()
    nsw_write(
        emb.select("vec_id", "embedding", "label").repartition(8),
        path,
        payload_cols=["label"],
    )
    build_s = time.time() - t0

    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.limit(q_n).collect()
    }
    qids = sorted(vecs)[:q_n]
    queries = [(int(i), vecs[i]) for i in qids]
    preds = {int(i): F.col("label") == int(i) % 10 for i in qids}

    def timed(**kw) -> float:
        nsw_read_topk(spark, path, queries, K, ef=EF, **kw).count()  # warm
        samples = []
        for _ in range(5):
            t0 = time.time()
            nsw_read_topk(spark, path, queries, K, ef=EF, **kw).count()
            samples.append(time.time() - t0)
        samples.sort()
        return samples[len(samples) // 2]

    hybrid_s = timed(predicates=preds)
    pure_s = timed()
    hybrid_ms = hybrid_s / q_n * 1000
    pure_ms = pure_s / q_n * 1000

    out = {
        "n_vectors": int(n_vec),
        "n_shards": 8,
        "build_s_untimed": round(build_s, 1),
        "batch": q_n,
        "ef": EF,
        "k": K,
        "loadavg_at_launch": [round(load1, 2), round(load5, 2), round(load15, 2)],
        "hybrid_batch_s": round(hybrid_s, 3),
        "hybrid_amortized_ms_per_query": round(hybrid_ms, 2),
        "baseline_acorn_ms": BASELINE_ACORN_MS,
        "hybrid_vs_baseline_ratio": round(hybrid_ms / BASELINE_ACORN_MS, 2),
        "pure_batch_s": round(pure_s, 3),
        "pure_amortized_ms_per_query": round(pure_ms, 2),
        "baseline_brute_ms": BASELINE_BRUTE_MS,
        "pure_vs_baseline_ratio": round(pure_ms / BASELINE_BRUTE_MS, 3),
    }
    print(out, flush=True)

    shutil.rmtree(root)
    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["acorn_amortized"] = out
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (acorn_amortized)")


if __name__ == "__main__":
    main()
