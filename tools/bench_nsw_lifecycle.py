"""Deletion-lifecycle cost ladder (r9): measure what the tombstone
sidecar design actually costs at store scale — the claims under test
are "delete is O(|ids|) with zero store rewrite", "the read-side
tombstone join is noise", and "reclaim is one compact".

96k-vector store (the nsw_prune corpus generator), then in order:
delete 1k ids (sidecar append wall time), the 16-query serving-beam
batch before vs after tombstones (read-side join overhead), upsert 1k
ids (tombstone + shard append), exactness spot-check against brute
force over the updated corpus, and nsw_compact (physical reclaim wall
time + rows dropped).

Writes the ``nsw_lifecycle`` section of BENCH_LADDER.json.
Run: python tools/bench_nsw_lifecycle.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from acorn_hybrid_vector_search_spark.operators.graph_ann import (  # noqa: E402
    nsw_compact,
    nsw_delete,
    nsw_read_topk,
    nsw_upsert,
    nsw_write,
)
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

DIM = 64
N_BLOBS = 64
N_QUERIES = 16
K = 10
EF = 64
N_OPS = 1000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96_000

    rng = np.random.default_rng(9)
    centers = rng.normal(0.0, 4.0, (N_BLOBS, DIM))
    blob = rng.integers(0, N_BLOBS, n)
    x = centers[blob] + rng.normal(0.0, 0.5, (n, DIM))
    q_idx = rng.choice(n, N_QUERIES, replace=False)
    queries = [(int(i), [float(v) for v in x[i]]) for i in q_idx]

    spark = get_spark("bench-nsw-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    sdf = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(32)

    root = tempfile.mkdtemp(prefix="acorn_lifecycle_")
    path = root + "/graph"
    t0 = time.time()
    nsw_write(sdf, path)
    build_s = time.time() - t0

    def q16() -> float:
        nsw_read_topk(spark, path, queries, K, ef=EF).count()  # warm plan
        t0 = time.time()
        nsw_read_topk(spark, path, queries, K, ef=EF).count()
        return time.time() - t0

    search_clean_s = q16()

    # ids untouched by the query set so exactness spot-checks stay easy;
    # draw from a widened range so the count is EXACTLY N_OPS even when
    # query ids land below it (review r9b: the old slice could only
    # truncate, so 'delete_1k' sometimes deleted 998)
    q_set = set(q_idx.tolist())
    del_ids = [
        int(i) for i in range(N_OPS + N_QUERIES) if i not in q_set
    ][:N_OPS]
    assert len(del_ids) == N_OPS
    t0 = time.time()
    nsw_delete(spark, path, del_ids, strict=False)
    delete_s = time.time() - t0
    search_tomb_s = q16()

    ups_ids = [n - 1 - i for i in range(N_OPS)]
    ups = spark.createDataFrame(
        [(int(i), [float(v) for v in (x[i] + 0.25)]) for i in ups_ids],
        "vec_id long, embedding array<double>",
    )
    t0 = time.time()
    nsw_upsert(ups, path)
    upsert_s = time.time() - t0

    # exactness spot-check over the updated corpus, full beam, 2 queries
    live = np.ones(n, dtype=bool)
    live[del_ids] = False
    x2 = x.copy()
    x2[ups_ids] = x[ups_ids] + 0.25
    for qid, qv in queries[:2]:
        d = ((x2 - np.asarray(qv)) ** 2).sum(axis=1)
        order = [i for i in np.argsort(d, kind="stable") if live[i]][:K]
        got = [
            r["vec_id"]
            for r in nsw_read_topk(
                spark, path, [(qid, qv)], K, ef=10**9
            ).collect()
        ]
        assert got == [int(i) for i in order], f"lifecycle exactness (q {qid})"

    n_before = spark.read.parquet(path).count()
    t0 = time.time()
    nsw_compact(spark, path, n_shards=32)
    compact_s = time.time() - t0
    n_after = spark.read.parquet(path).count()
    assert n_after == n - len(del_ids), (n_after, n, len(del_ids))
    search_reclaimed_s = q16()

    rec = {
        "n_vectors": n,
        "build_s": round(build_s, 1),
        "delete_1k_s": round(delete_s, 2),
        "upsert_1k_s": round(upsert_s, 1),
        "search_q16_clean_s": round(search_clean_s, 3),
        "search_q16_tombstoned_s": round(search_tomb_s, 3),
        "search_q16_reclaimed_s": round(search_reclaimed_s, 3),
        "compact_s": round(compact_s, 1),
        "rows_physical_before_compact": int(n_before),
        "rows_physical_after_compact": int(n_after),
    }
    print(rec, flush=True)
    shutil.rmtree(root)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["nsw_lifecycle"] = rec
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (nsw_lifecycle)")


if __name__ == "__main__":
    main()
