"""Batched-hybrid serving measurement (r8): ONE prefilter_search_batch
job vs the per-query driver loop it replaces, at growing query-batch
sizes over the x16 ladder embeddings (32k vectors, dim 64).

The claim under test (VERDICT r7 ask #1's motivation): serving N hybrid
queries as N driver-planned jobs pays plan construction + scan × N; the
batch form pays them once, so wall-clock per query should FALL with
batch size while the loop stays flat. Queries cycle through four §2.3
predicate classes (none / numeric exact / numeric range / selective
conjunction), so the batch path exercises the per-query parameter
evaluation, not one shared filter.

Writes the ``hybrid_batch`` section of BENCH_LADDER.json.
Run: python tools/bench_hybrid_batch.py [batch_sizes...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from acorn_hybrid_vector_search_spark.operators.hybrid import (  # noqa: E402
    prefilter_search,
    prefilter_search_batch,
)
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

K = 10


def _preds(i: int):
    cls = i % 4
    if cls == 0:
        return None
    if cls == 1:
        return {"label": ["exact", i % 10]}
    if cls == 2:
        return {"label": ["geq", i % 7]}
    return {"vec_id": ["<", 4000 + 97 * i]}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4, 16, 64]
    spark = get_spark("bench-hybrid-batch")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(ROOT, ".ladder", "x16", "embeddings.parquet"))
    emb = emb.cache()
    n_vec = emb.count()
    qrows = (
        emb.filter(F.col("vec_id") < max(sizes))
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: r["embedding"] for r in qrows}

    rows = []
    for q in sizes:
        batch = [(i, vecs[i], _preds(i)) for i in range(q)]
        # warm both paths once (JIT/codegen), then time
        prefilter_search_batch(emb, batch, K).count()
        t0 = time.time()
        out_rows = prefilter_search_batch(emb, batch, K).count()
        batch_s = time.time() - t0
        prefilter_search(emb, vecs[0], _preds(0), K).count()
        t0 = time.time()
        loop_rows = 0
        for i in range(q):
            loop_rows += prefilter_search(emb, vecs[i], _preds(i), K).count()
        loop_s = time.time() - t0
        rec = {
            "n_queries": q,
            "batch_s": round(batch_s, 3),
            "loop_s": round(loop_s, 3),
            "batch_ms_per_query": round(1000 * batch_s / q, 1),
            "loop_ms_per_query": round(1000 * loop_s / q, 1),
            "speedup": round(loop_s / batch_s, 2),
            "rows_batch": out_rows,
            "rows_loop": loop_rows,
        }
        assert out_rows == loop_rows, rec  # same answers, different plans
        rows.append(rec)
        print(rec, flush=True)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["hybrid_batch"] = {
        "n_vectors": n_vec,
        "k": K,
        "source": ".ladder/x16 embeddings",
        "batches": rows,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (hybrid_batch)")


if __name__ == "__main__":
    main()
