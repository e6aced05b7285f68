"""NSW partition-size ladder (VERDICT r7 ask #3): measure per-partition
graph search cost and quality as a SINGLE partition grows 2k → 64k
vectors, for both entry strategies — the fixed entry node 0 the graphs
used through r7, and the r8 coarse entry (nearest of a deterministic √n
sample, the flat analog of hnswlib's upper-layer descent,
hnswlib/hnswlib/hnswalg.h ``searchKnn``).

What the numbers decide: VERDICT r7 asked "if hops from fixed entry 0
grow super-log, add coarse entry selection". The measurement shows the
visit count does NOT blow up (the ef-bounded beam termination caps it),
but recall@10 at fixed ef decays with partition size because a fixed
entry spends the beam on travel — the coarse entry buys the recall back
at fewer visits, which is why ``_local_topk_frame`` now searches with
``coarse_entry=True`` (exactness at full beam is unchanged and
pytest-pinned; budgeted-recall gates unchanged).

Per size, in-process (the per-task cost is a pure numpy function — the
same code every executor runs): build seconds, and per strategy the
mean/max visit count, mean recall@10 vs brute force over 16 ladder
queries, and search milliseconds for the 16-query batch. Plus the
Spark-side end-to-end: ``nsw_write`` (single shard) + an 8-query
``nsw_read_topk`` — the flat job overhead the per-partition numbers sit
inside.

Writes the ``nsw_partition_scaling`` section of BENCH_LADDER.json.
Run: python tools/bench_nsw_partition_scaling.py [sizes...]
(vectors come from .ladder/x48 — run tools/make_scale_ladder.py first)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from acorn_hybrid_vector_search_spark.operators.graph_ann import (  # noqa: E402
    NswGraph,
    nsw_read_topk,
    nsw_write,
)
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

N_QUERIES = 16
EF = 64
K = 10


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000, 32000, 64000]
    src = os.path.join(ROOT, ".ladder", "x48", "embeddings.parquet")
    t = pq.read_table(src, columns=["vec_id", "embedding"])
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(0)
    queries = emb[rng.integers(0, emb.shape[0], N_QUERIES)]

    spark = get_spark("bench-nsw-partition")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sizes:
        x = emb[:n]
        t0 = time.time()
        g = NswGraph(x, m=8, ef_construction=32)
        build_s = time.time() - t0
        truth = []
        for q in queries:
            d = ((x - q) ** 2).sum(axis=1)
            truth.append(set(np.argsort(d, kind="stable")[:K].tolist()))
        rec: dict = {"n": n, "build_s": round(build_s, 1)}
        for label, coarse in (("entry0", False), ("coarse", True)):
            vis, recall = [], []
            t0 = time.time()
            for q in queries:
                cand, v = g._search(q, EF, coarse_entry=coarse)
                vis.append(v)
            search_ms = 1000 * (time.time() - t0)
            for q, tr in zip(queries, truth):
                cand, _ = g._search(q, EF, coarse_entry=coarse)
                recall.append(len(set(cand[:K]) & tr) / K)
            rec[label] = {
                "visits_mean": round(float(np.mean(vis)), 1),
                "visits_max": int(max(vis)),
                "recall_at_10": round(float(np.mean(recall)), 3),
                "search16_ms": round(search_ms, 1),
            }
        # Spark end-to-end: one shard persisted, 8-query batch read
        root = tempfile.mkdtemp(prefix="acorn_nsw_ladder_")
        path = root + "/graph"
        sdf = spark.createDataFrame(
            [(i, [float(v) for v in x[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        ).coalesce(1)
        nsw_write(sdf, path)
        qbatch = [(i, [float(v) for v in queries[i]]) for i in range(8)]
        nsw_read_topk(spark, path, qbatch, K, ef=EF).count()  # warm
        t0 = time.time()
        nsw_read_topk(spark, path, qbatch, K, ef=EF).count()
        rec["e2e_query8_s"] = round(time.time() - t0, 3)
        shutil.rmtree(root)
        rows.append(rec)
        print(rec, flush=True)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["nsw_partition_scaling"] = {
        "ef": EF,
        "k": K,
        "n_queries": N_QUERIES,
        "source": ".ladder/x48 embeddings (dim 64)",
        "sizes": rows,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (nsw_partition_scaling)")


if __name__ == "__main__":
    main()
