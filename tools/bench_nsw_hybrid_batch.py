"""Batched hybrid serving over the PERSISTED NSW store (r8b): ONE
nsw_read_topk(predicates={qid: Column}) call vs the per-query loop
(nsw_read_topk(predicate=...) once per query), at growing query-batch
sizes over the x16 ladder embeddings (32k vectors, dim 64, 8 stored
graph shards with the label payload).

The graph-path twin of tools/bench_hybrid_batch.py: the per-query loop
pays plan construction + a full store read + the per-shard walk job per
query; the batch rides |Q| Catalyst predicate projections on ONE store
scan and answers every query from the same per-shard walk invocation.
Queries cycle the same four predicate classes, so the per-query mask
dispatch is exercised, not one shared filter.

Writes the ``nsw_hybrid_batch`` section of BENCH_LADDER.json.
Run: python tools/bench_nsw_hybrid_batch.py [batch_sizes...]
"""

from __future__ import annotations

import json
import os
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


def _pred(i: int):
    cls = i % 4
    if cls == 0:
        return None
    if cls == 1:
        return F.col("label") == i % 10
    if cls == 2:
        return F.col("label") >= i % 7
    return F.col("vec_id") < 4000 + 97 * i


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4, 16, 64]
    spark = get_spark("bench-nsw-hybrid-batch")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(
        os.path.join(ROOT, ".ladder", "x16", "embeddings.parquet")
    )
    n_vec = emb.count()
    path = tempfile.mkdtemp(prefix="acorn_nsw_ladder_") + "/graph"
    t0 = time.time()
    nsw_write(emb.repartition(8), path, payload_cols=["label"])
    build_s = time.time() - t0
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < max(sizes)).collect()
    }

    rows = []
    for q in sizes:
        batch = [(i, vecs[i]) for i in range(q)]
        preds = {i: p for i in range(q) if (p := _pred(i)) is not None}
        nsw_read_topk(spark, path, batch, K, ef=EF, predicates=preds).count()
        t0 = time.time()
        out_rows = nsw_read_topk(
            spark, path, batch, K, ef=EF, predicates=preds
        ).count()
        batch_s = time.time() - t0
        nsw_read_topk(spark, path, batch[:1], K, ef=EF,
                      predicate=preds.get(0)).count()
        t0 = time.time()
        loop_rows = 0
        for i in range(q):
            loop_rows += nsw_read_topk(
                spark, path, [(i, vecs[i])], K, ef=EF, predicate=_pred(i)
            ).count()
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
    merged["nsw_hybrid_batch"] = {
        "n_vectors": n_vec,
        "k": K,
        "ef": EF,
        "n_shards": 8,
        "build_s": round(build_s, 2),
        "source": ".ladder/x16 embeddings",
        "batches": rows,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (nsw_hybrid_batch)")


if __name__ == "__main__":
    main()
