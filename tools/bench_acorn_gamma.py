"""ACORN-γ recall-per-visit measurement (r8b): traverse-all (the
reference's ACORN-1 / filter-functor walk) vs the ACORN-γ predicate-
subgraph walk, on the x16 ladder embeddings under a selective
predicate, across visit budgets.

The claim under test (Patel et al., SIGMOD'24 §4, replicated in
NswGraph._search_subgraph): at selectivity s, traverse-all spends ~1/s
of its visit budget per returnable node (failing nodes are traversed,
then filtered at collection), while the subgraph walk spends every
visit on a passing node — so at EQUAL budgets its recall should be
higher, converging as budgets grow. The γ-dense store is the price:
γ·m adjacency per node (disclosed as the degree ratio).

Writes the ``acorn_gamma`` section of BENCH_LADDER.json.
Run: python tools/bench_acorn_gamma.py [budgets...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from acorn_hybrid_vector_search_spark.operators.graph_ann import (  # noqa: E402
    nsw_read_topk,
    nsw_write,
)
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

K = 10
EF = 64
N_QUERIES = 16
LABEL = 3  # testdata labels are uniform 0..9 → selectivity ≈ 0.1


def main() -> None:
    budgets = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64, 128]
    spark = get_spark("bench-acorn-gamma")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(
        os.path.join(ROOT, ".ladder", "x16", "embeddings.parquet")
    ).cache()
    n_vec = emb.count()
    root = tempfile.mkdtemp(prefix="acorn_gamma_ladder_")
    p1, p4 = root + "/g1", root + "/g4"
    nsw_write(emb.repartition(8), p1, payload_cols=["label"])
    nsw_write(emb.repartition(8), p4, gamma=4, payload_cols=["label"])

    def mean_degree(path):
        return float(
            spark.read.parquet(path)
            .agg(F.avg(F.size("neighbors")))
            .head()[0]
        )

    deg1, deg4 = mean_degree(p1), mean_degree(p4)
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < N_QUERIES).collect()
    }
    pred = F.col("label") == LABEL

    # exact ground truth per query (brute force over the passing set)
    truth: dict[int, set] = {}
    passing = emb.filter(pred)
    for qid, qv in qvecs.items():
        arr = F.array(*[F.lit(float(x)) for x in qv])
        d = F.aggregate(
            F.zip_with("embedding", arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        truth[qid] = {
            r["vec_id"]
            for r in passing.select("vec_id", d.alias("d"))
            .orderBy("d", "vec_id")
            .limit(K)
            .collect()
        }

    batch = [(i, qvecs[i]) for i in sorted(qvecs)]
    rows = []
    for mv in budgets:
        rec = {"max_visits": mv}
        for name, path, strat in (
            ("traverse_all_g1", p1, "traverse_all"),
            ("subgraph_g4", p4, "subgraph"),
        ):
            res = nsw_read_topk(
                spark, path, batch, K, ef=EF, max_visits=mv,
                predicate=pred, strategy=strat,
            ).collect()
            by_q: dict[int, set] = {}
            for r in res:
                by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
            rec[name] = round(
                sum(len(by_q.get(q, set()) & truth[q]) for q in truth)
                / (K * len(truth)),
                3,
            )
        rows.append(rec)
        print(rec, flush=True)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["acorn_gamma"] = {
        "n_vectors": n_vec,
        "k": K,
        "ef": EF,
        "n_queries": N_QUERIES,
        "selectivity": 0.1,
        "mean_degree_g1": round(deg1, 1),
        "mean_degree_g4": round(deg4, 1),
        "source": ".ladder/x16 embeddings",
        "budgets": rows,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (acorn_gamma)")


if __name__ == "__main__":
    main()
