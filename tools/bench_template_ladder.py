"""Planted-template ladder measurement (r6 verdict ask #1).

The LSH emission cap's adversary: a boilerplate TEMPLATE shared by 20%
of the corpus as near-identical-but-NOT-exact copies (each ends in a
doc-unique token → distinct fingerprints → the exact rung cannot
collapse the cluster; `make_scale_ladder.py --template`). Every
template doc collides in the same band buckets, so uncapped pair
emission is C(0.2·n, 2) — quadratic by construction on any engine.

This tool measures, per factor:

- the honesty stats (cluster share; exact-rung survivors ≈ n_docs,
  proving the cluster really survives the exact rung);
- UNCAPPED minhash pair emission at the SMALLEST factor only (a direct
  measured quadratic contrast — at larger factors the uncapped run is
  exactly the blowup the cap exists to prevent, so it is DISCLOSED
  analytically from the cap-stats rows instead of executed);
- the ROUTED capped run (route_dedup's rule-6 bucket_cap =
  max(64, ceil(4*sqrt(n))) dispatched end-to-end via dedup_search)
  with per-task duration stats from the event log (max/p50 — no
  single-task stall);
- capped winnow (the passage rung, router cap);
- the no-silent-caps disclosure aggregate: over-cap bucket count, max
  bucket size, and Σ pairs_uncapped — what WOULD have been emitted.

Writes the ``template_adversarial`` section of BENCH_LADDER.json.
Run after the generator:
    python tools/make_scale_ladder.py --template /root/testdata/sf0.1 4 16
    python tools/bench_template_ladder.py 4 16
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LADDER = os.path.join(ROOT, ".ladder")
sys.path.insert(0, ROOT)

from tools.bench_skew_ladder import _session, _task_stats_by_group  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [4, 16]
    elog = tempfile.mkdtemp(prefix="acorn_tmpl_elog_")
    spark = _session(elog)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    from acorn_hybrid_vector_search_spark.functions.text import tokens
    from acorn_hybrid_vector_search_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_near_dups,
        winnow_near_dups,
    )
    from acorn_hybrid_vector_search_spark.plans.router import (
        dedup_search,
        route_dedup,
    )

    results: dict[str, dict] = {}
    for fi, factor in enumerate(factors):
        suffix = f"x{factor}tmpl"
        docs = spark.read.parquet(
            os.path.join(LADDER, suffix, "documents.parquet")
        )
        stats = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(tokens("text"))).alias("avg_tok"),
        ).collect()[0]
        n_docs, avg_tok = int(stats["n"]), float(stats["avg_tok"])
        cluster_n = docs.where(F.col("doc_id") % 5 == 2).count()
        survivors = exact_dedup_groups(docs).count()
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

        route = route_dedup(n_docs, avg_tok, threshold=0.7)
        cap = route.params["bucket_cap"]

        if fi == 0:
            # the measured quadratic contrast, smallest factor only
            run(
                "minhash_uncapped_pairs",
                lambda: minhash_near_dups(
                    docs, num_hashes=16, bands=4, verify_threshold=0.7
                ).count(),
            )
        run("minhash_routed_capped_pairs", lambda: dedup_search(docs, route).count())
        run(
            "winnow_capped_pairs",
            lambda: winnow_near_dups(docs, bucket_cap=cap).count(),
        )
        st = (
            minhash_near_dups(
                docs, num_hashes=16, bands=4, verify_threshold=0.7,
                bucket_cap=cap, cap_stats=True,
            )
            .agg(
                F.count(F.lit(1)).alias("over_cap_buckets"),
                F.max("bucket_n").alias("max_bucket_n"),
                F.sum("pairs_uncapped").alias("pairs_uncapped_total"),
                F.sum("pairs_capped").alias("pairs_capped_bound"),
            )
            .collect()[0]
        )
        results[suffix] = {
            "n_docs": n_docs,
            "template_cluster_n": cluster_n,
            "cluster_share": round(cluster_n / n_docs, 3),
            "exact_rung_survivors": survivors,
            "routed_bucket_cap": cap,
            "cap_disclosure": {
                "over_cap_buckets": int(st["over_cap_buckets"] or 0),
                "max_bucket_n": int(st["max_bucket_n"] or 0),
                "pairs_uncapped_total": int(st["pairs_uncapped_total"] or 0),
                "pairs_capped_bound": int(st["pairs_capped_bound"] or 0),
            },
            "families": fam,
        }

    spark.stop()  # flush + finalize the event log
    stats = _task_stats_by_group(elog)
    for suffix, block in results.items():
        for name, rec in block["families"].items():
            stt = stats.get(f"{suffix}:{name}")
            if stt and isinstance(rec, dict) and "sec" in rec:
                rec.update(stt)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged.setdefault("template_adversarial", {}).update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (template_adversarial: {list(results)})")


if __name__ == "__main__":
    main()
