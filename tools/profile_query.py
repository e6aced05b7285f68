"""r14 optimization profiler: isolated per-query measurement with JOB
COUNTS and plan capture — guide §1 ("measure first") tooling.

For each named query: fresh-session warm-up (builds caches/stores), then
``runs`` timed executions under a per-execution job group so the Spark
status tracker attributes every job to the execution that launched it.
Reports median wall seconds, jobs per execution (the dispatch-floor
multiplier — each job costs ~20-50 ms on this host before any work), and
optionally writes ``.explain('formatted')`` to ``plans/r14/<q>_<tag>.txt``.

    python tools/profile_query.py [--plans TAG] q1 [q2 ...]

Protocol matches tools/triage_risers.py (PLANS "Headline triage"): job
floor before/after, loadavg disclosed, every sample printed.
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
from tools._bench_common import job_floor_ms  # noqa: E402

RUNS = 5


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    if args and args[0] == "--plans":
        plans_tag = args[1]
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = tuple(round(x, 2) for x in os.getloadavg())
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    floor0 = job_floor_ms(spark)
    print(json.dumps({"floor_before_ms": floor0, "loadavg": load0}), flush=True)
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        df.collect()  # warm-up (builds caches/stores, compiles codegen)
        if plans_tag:
            os.makedirs(os.path.join(ROOT, "plans", "r14"), exist_ok=True)
            with open(
                os.path.join(ROOT, "plans", "r14", f"{name}_{plans_tag}.txt"), "w"
            ) as f:
                f.write(df._sc is not None and df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ) or "")
        samples = []
        jobs = []
        for i in range(RUNS):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup(None, None)
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        med = sorted(samples)[len(samples) // 2]
        floor = job_floor_ms(spark)
        print(
            json.dumps(
                {
                    "query": name,
                    "median_s": med,
                    "samples_s": samples,
                    "jobs_per_exec": jobs,
                    "floor_after_ms": floor,
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {"loadavg_after": tuple(round(x, 2) for x in os.getloadavg())}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
