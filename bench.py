"""Benchmark harness: runs the headline query battery at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time is the median of ``RUNS`` executions after one warm-up
(JVM/codegen warm), measured to ``collect()`` — full plan execution.

Inputs are HOT: base tables are cached (and materialized during warm-up)
before timing, because the reference's baseline numbers are measured over
in-memory NumPy arrays after load (BASELINE.md / SURVEY.md §6) — timing
our queries over resident DataFrames is the like-for-like comparison.
Set ``SPARK_GRAFT_CACHE_INPUTS=0`` to time cold parquet scans instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CACHE_INPUTS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from acorn_hybrid_vector_search_spark.session import get_spark

RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("acorn-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        fn(spark, sf_dir).collect()  # warm-up (also validates)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "hybrid_query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
