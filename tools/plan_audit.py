"""Physical-plan audit: dump the executed plans of headline queries with
the scale-critical features called out — the ".explain and iterate"
evidence behind the design rules (README.md).

    python tools/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

# query → the plan features that make it scale (checked + printed)
AUDIT: dict[str, list[str]] = {
    "prefilter_exact": ["TakeOrderedAndProject", "PushedFilters"],
    "nested_prefilter_weight_brand": ["TakeOrderedAndProject", "PushedFilters", "ReadSchema"],
    "join_revenue_by_nation": ["BroadcastHashJoin", "HashAggregate"],
    "agg_lineitem_pricing": ["HashAggregate", "Exchange"],
    "bm25_topk_docs": ["BroadcastNestedLoopJoin", "TakeOrderedAndProject"],
    "minhash_near_dups": ["Join"],
    "asof_latest_order": ["Window", "Exchange"],
    "global_sort_orders": ["TakeOrderedAndProject", "Window"],
    "quantized_ann_topk": ["TakeOrderedAndProject"],
    "decontaminate_docs": ["BroadcastHashJoin", "HashAggregate"],
    "salted_event_stats": ["HashAggregate"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    print("# PLANS — executed physical plans of headline queries")
    print()
    print(f"`python tools/plan_audit.py {sf_dir}` — features listed per query")
    print("are asserted present (plan-shape contract); full executed plan")
    print("follows, truncated to the interesting prefix.")
    for name, feats in AUDIT.items():
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        missing = [f for f in feats if f not in plan]
        status = "OK" if not missing else f"MISSING {missing}"
        print(f"\n## {name} — features: {', '.join(feats)} [{status}]\n")
        print("```")
        # compress literal arrays (query vectors / LUTs) for readability
        compact = re.sub(r"\[(-?\d+\.\d+(, -?\d+\.\d+){4,})[^\]]*\]", "[…floats…]", plan)
        compact = re.sub(r"array\((-?[\d.E-]+, ){4,}[^)]*\)", "array(…)", compact)
        lines = compact.splitlines()
        print("\n".join(lines[:38]))
        if len(lines) > 38:
            print(f"… ({len(lines) - 38} more lines)")
        print("```")


if __name__ == "__main__":
    main()
