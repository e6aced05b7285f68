"""Skew-adversarial ladder measurement (r5 verdict ask #5).

The uniform ladder (bench_ladder.py) proves linear growth on
near-uniform keys; the de-skew work's whole argument is HEAVY-TAILED
keys. This tool runs the four de-skew-relevant families on the
``--skew`` dataset (make_scale_ladder.py: one document fingerprint at
~14% of rows, one 8-gram in ~31% of docs, one domain at 25%) AND on
the uniform dataset of the same factor, and — the actual evidence —
records PER-TASK duration stats from the Spark event log: a hot-key
window would show up as one task holding max/median >> bucket count,
while the de-skewed plans must keep max/median bounded.

Families:
- ``dup_ngram_removal``      — de-skewed groupBy+join-back marking (r5)
- ``dedup_survivors``        — partial-agg + semi-join survivor pick (r6)
- ``domain_caps``            — two-phase count-join + salted-bucket cap (r6)
- ``minhash_post_exact``     — MinHash banding AFTER the exact rung
  (the router's documented rung order: the clone cluster collapses in
  the exact rung first; feeding 14% literal clones to pair-emitting
  LSH would be quadratic by construction on ANY engine)

Writes the ``x{R}skew`` section of BENCH_LADDER.json with
``task_max_ms`` / ``task_p50_ms`` / ``task_max_over_p50`` per family.
Run after the generators:
    python tools/make_scale_ladder.py /root/testdata/sf0.1 16
    python tools/make_scale_ladder.py --skew /root/testdata/sf0.1 16
    python tools/bench_skew_ladder.py 16
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LADDER = os.path.join(ROOT, ".ladder")
sys.path.insert(0, ROOT)


def _session(eventlog_dir: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    return (
        SparkSession.builder.appName("bench-skew-ladder")
        .master(master)
        .config("spark.sql.shuffle.partitions", str(int(cpus) if cpus else 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", eventlog_dir)
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )


def _task_stats_by_group(eventlog_dir: str) -> dict[str, dict]:
    """Parse the event log: job-group -> per-task duration stats."""
    stage_group: dict[int, str] = {}
    durations: dict[str, list[float]] = {}
    paths = []
    for root, _dirs, files in os.walk(eventlog_dir):
        paths += [
            os.path.join(root, fn) for fn in files if not fn.startswith("appstatus")
        ]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if grp:
                        for si in ev.get("Stage Infos", []):
                            stage_group[si["Stage ID"]] = grp
                elif k == "SparkListenerTaskEnd":
                    grp = stage_group.get(ev.get("Stage ID"))
                    ti = ev.get("Task Info") or {}
                    if grp and ti.get("Finish Time") and ti.get("Launch Time"):
                        durations.setdefault(grp, []).append(
                            ti["Finish Time"] - ti["Launch Time"]
                        )
    out = {}
    for grp, ds in durations.items():
        ds.sort()
        p50 = ds[len(ds) // 2]
        out[grp] = {
            "n_tasks": len(ds),
            "task_max_ms": ds[-1],
            "task_p50_ms": p50,
            "task_max_over_p50": round(ds[-1] / max(p50, 1), 1),
        }
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    elog = tempfile.mkdtemp(prefix="acorn_skew_elog_")
    spark = _session(elog)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    from acorn_hybrid_vector_search_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dups,
    )
    from acorn_hybrid_vector_search_spark.operators.sampling import cap_per_group
    from acorn_hybrid_vector_search_spark.operators.substring_dedup import (
        remove_duplicate_ngrams,
    )

    results: dict[str, dict] = {}
    for suffix in (f"x{factor}", f"x{factor}skew"):
        d = os.path.join(LADDER, suffix, "documents.parquet")
        docs = spark.read.parquet(d)
        n_docs = docs.count()
        fam: dict[str, dict] = {}

        def run(name: str, fn) -> None:
            grp = f"{suffix}:{name}"
            sc.setJobGroup(grp, name)
            t0 = time.time()
            out = fn()
            el = time.time() - t0
            sc.setJobGroup("idle", "idle")
            fam[name] = {"sec": round(el, 3), "rows_in": n_docs, "rows_out": out}
            print(f"{suffix} {name}: {el:.2f}s -> {out}", flush=True)

        run(
            "dup_ngram_removal",
            lambda: remove_duplicate_ngrams(docs)
            .agg(F.sum("n_removed"), F.count(F.lit(1)))
            .collect()[0][1],
        )
        run("dedup_survivors", lambda: exact_dedup(docs).count())
        run(
            "domain_caps",
            lambda: cap_per_group(
                docs, 15, group_col="source", key_col="doc_id"
            ).count(),
        )
        survivors = exact_dedup(docs)
        run(
            "minhash_post_exact",
            lambda: minhash_near_dups(survivors, verify_threshold=0.7).count(),
        )

        # measured heavy-hitter shares (honesty: the dataset really is
        # adversarial, not just labeled so)
        top = {}
        for key, expr in (
            ("fingerprint", F.md5(F.col("text"))),
            ("domain", F.col("source")),
        ):
            top[key] = round(
                docs.groupBy(expr.alias("k"))
                .count()
                .agg(F.max("count"))
                .head()[0]
                / n_docs,
                3,
            )
        fam["_top_key_share"] = top
        results[suffix] = {"n_docs": n_docs, "families": fam}

    spark.stop()  # flush + finalize the event log
    stats = _task_stats_by_group(elog)
    for suffix, block in results.items():
        for name, rec in block["families"].items():
            st = stats.get(f"{suffix}:{name}")
            if st and isinstance(rec, dict) and "sec" in rec:
                rec.update(st)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.setdefault("skew_adversarial", {}).update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (skew_adversarial: {list(results)})")


if __name__ == "__main__":
    main()
