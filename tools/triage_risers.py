"""r13 riser triage (VERDICT r12 ask #2): isolated-median re-measurement
of the r12 battery's heavy tail — stream_nsw_append (4.54×), bpe_merges
(+3.5 s), scd2_orders_history (2.17×), simhash_cap_stats (2.62×),
html_text_extraction (2.43×), plus stream_hybrid_serve and
ivf_delete_topk (the remaining >2× movers) — under the standing
protocol: fresh session, warm-up, median of 5 at sf0.1, job-floor
control before/after and BETWEEN queries, loadavg disclosed, every
sample printed.

The BLAS-cap rule-out leg: run with OPENBLAS_NUM_THREADS pre-exported
(>1) and the session cap becomes a no-op (session.py uses setdefault),
restoring pre-r12 worker threading:

    python tools/triage_risers.py                 # capped (r12 default)
    OPENBLAS_NUM_THREADS=32 OMP_NUM_THREADS=32 \
        python tools/triage_risers.py uncapped    # pre-r12 threading

Prints one JSON line per query; paste-ready for the PLANS triage table.
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

RISERS = (
    "stream_nsw_append",
    "bpe_merges",
    "scd2_orders_history",
    "simhash_cap_stats",
    "html_text_extraction",
    "stream_hybrid_serve",
    "ivf_delete_topk",
)


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "capped"
    # r14: a 2nd arg overrides the query list (comma-separated) so each
    # round's movers triage under the same protocol without editing the
    # tool — e.g. `python tools/triage_risers.py r14-movers a,b,c`
    global RISERS
    if len(sys.argv) > 2:
        RISERS = tuple(sys.argv[2].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = tuple(round(x, 2) for x in os.getloadavg())
    spark = get_spark("triage-risers")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    floor0 = job_floor_ms(spark)
    for name in RISERS:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warm (builds caches/stores)
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 3))
        med = sorted(samples)[2]
        floor = job_floor_ms(spark)
        out[name] = {
            "median_s": med,
            "samples_s": samples,
            "floor_after_ms": floor,
        }
        print(
            json.dumps({"query": name, "label": label, **out[name]}),
            flush=True,
        )
    print(
        json.dumps(
            {
                "label": label,
                "sf_dir": sf_dir,
                "loadavg_at_launch": load0,
                "job_floor_ms_start": floor0,
                "loadavg_at_end": tuple(
                    round(x, 2) for x in os.getloadavg()
                ),
                "blas_env": {
                    v: os.environ.get(v)
                    for v in (
                        "OPENBLAS_NUM_THREADS",
                        "OMP_NUM_THREADS",
                    )
                },
                "medians": {k: v["median_s"] for k, v in out.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
