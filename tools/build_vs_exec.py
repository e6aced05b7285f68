"""r14: split every battery query's per-call cost into PLAN BUILD
(python expression construction + analysis + any internal jobs) vs
EXECUTION (collect of the built plan), with the Spark job count of each
phase. Drives the @_prepared scoping decision: a query whose warm build
runs ZERO jobs is a pure plan whose construction is prepared-statement
amortizable; a query whose build runs jobs per call does per-call work
(loops, writes, probes) and must stay unprepared.

    python tools/build_vs_exec.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("build-vs-exec")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    rows = []
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).collect()  # warm (stores, memos, codegen)
        except Exception as e:  # pragma: no cover - disclosure only
            print(json.dumps({"query": name, "err": str(e)[:200]}), flush=True)
            continue
        g1 = f"bve_b_{name}"
        sc.setJobGroup(g1, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        sc.setJobGroup(None, None)
        bjobs = len(sc.statusTracker().getJobIdsForGroup(g1))
        g2 = f"bve_c_{name}"
        sc.setJobGroup(g2, name)
        df.collect()
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)
        cjobs = len(sc.statusTracker().getJobIdsForGroup(g2))
        rows.append(
            {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "build_jobs": bjobs,
                "collect_s": round(t2 - t1, 3),
                "collect_jobs": cjobs,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    tot_b = sum(r["build_s"] for r in rows)
    tot_c = sum(r["collect_s"] for r in rows)
    print(
        json.dumps(
            {"total_build_s": round(tot_b, 1), "total_collect_s": round(tot_c, 1)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
