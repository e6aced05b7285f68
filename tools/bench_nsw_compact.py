"""NSW shard-compaction economics (r6 verdict ask #2).

``nsw_append`` is cheap at ingest but every append adds a graph shard,
and each query pays one k-candidate search PER SHARD forever.
``nsw_compact`` pays one rebuild to restore the fan-out. This tool
measures that trade on the sf0.1 embeddings: build a store through 15
appends (16 shard generations), time the same query batch against the
GROWN store, compact, and time it again — plus the one-time compaction
cost itself. Full-beam results are exact over the union both before and
after (hash-pinned by nsw_compact_topk / tests), so the delta is pure
physical-layout economics.

Writes the ``nsw_compact`` section of BENCH_LADDER.json.
Run: python tools/bench_nsw_compact.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402
from acorn_hybrid_vector_search_spark.sources.testdata import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-nsw-compact")
    spark.sparkContext.setLogLevel("ERROR")

    from acorn_hybrid_vector_search_spark.operators.graph_ann import (
        nsw_append,
        nsw_compact,
        nsw_read_topk,
        nsw_write,
    )

    emb = load_table(spark, sf_dir, "embeddings").cache()
    n_vec = emb.count()
    root = tempfile.mkdtemp(prefix="acorn_nsw_cmp_bench_")
    path = root + "/graph"

    gens = 16
    t0 = time.time()
    nsw_write(emb.filter(F.col("vec_id") % gens == 0), path)
    for r in range(1, gens):
        nsw_append(emb.filter(F.col("vec_id") % gens == r), path)
    grow_s = time.time() - t0
    shards_before = spark.read.parquet(path).select("part_id").distinct().count()

    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]

    def search_median(runs: int = 5) -> float:
        times = []
        for _ in range(runs):
            t = time.time()
            nsw_read_topk(spark, path, queries, 10, ef=64).count()
            times.append(time.time() - t)
        times.sort()
        return times[len(times) // 2]

    search_median()  # warm the store listing
    grown_s = search_median()

    t0 = time.time()
    shards_after = nsw_compact(spark, path, n_shards=8)
    compact_s = time.time() - t0
    search_median()
    compacted_s = search_median()

    rec = {
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "append_generations": gens,
        "shards_grown": shards_before,
        "shards_compacted": shards_after,
        "grow_total_s": round(grow_s, 2),
        "compact_one_time_s": round(compact_s, 2),
        "query8_grown_median_s": round(grown_s, 3),
        "query8_compacted_median_s": round(compacted_s, 3),
    }
    print(rec, flush=True)
    shutil.rmtree(root)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["nsw_compact"] = rec
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (nsw_compact)")


if __name__ == "__main__":
    main()
