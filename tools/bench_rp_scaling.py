"""RP dims-scaling evidence (r6 verdict ask #3).

project_embedding builds ~in_dim·out_dim/3 literal add-multiply nodes
in ONE Catalyst expression; committed evidence before r7 covered 64→16
(~340 nodes) only, while the module's 100 TB story is written for the
reference's 2048 dims (acorn.py:275). This tool measures BOTH paths at
2048→{16, 32, 64, 128} on synthetic 2048-dim vectors:

- ``expr_first_s``: Catalyst literal fold, first execution — includes
  analysis + whole-stage-codegen compile of the node chain (the BPE
  fold chain's ~15 s cliff regime);
- ``expr_steady_s``: second execution of the same prepared frame;
- ``udf_first_s`` / ``udf_steady_s``: the Arrow matmul path
  (bit-identical doubles, no expression nodes).

The measured crossover pins RP_NODE_BUDGET (operators/similarity.py):
below it the JVM expression wins (no Python), above it the matmul wins
(no compile cliff). Writes the ``rp_scaling`` section of
BENCH_LADDER.json. Run: python tools/bench_rp_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402

IN_DIM = 2048
OUT_DIMS = [16, 32, 64, 128]


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark("bench-rp-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    from acorn_hybrid_vector_search_spark.operators.similarity import (
        project_embedding,
        project_embedding_udf,
        projection_matrix,
    )

    # deterministic synthetic 2048-dim vectors (pure column expressions)
    vecs = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(IN_DIM - 1)),
                lambda i: (
                    F.pmod(F.col("id") * 31 + i.cast("long") * 7, F.lit(97)).cast(
                        "double"
                    )
                    / 97.0
                ),
            ).alias("embedding"),
        )
        .repartition(32)
        .cache()
    )
    vecs.count()

    results: dict[str, dict] = {}
    for out_dim in OUT_DIMS:
        t0 = time.time()
        R = projection_matrix(IN_DIM, out_dim, seed="jl")
        matrix_s = time.time() - t0
        nnz = sum(1 for row in R for r in row if r != 0.0)
        rec: dict = {"nnz": nnz, "matrix_derive_s": round(matrix_s, 2)}

        for name, col in (
            ("expr", lambda: project_embedding(F.col("embedding"), R)),
            ("udf", lambda: project_embedding_udf("embedding", R)),
        ):
            df = vecs.select(F.get(col(), 0).alias("p0"))
            t0 = time.time()
            df.agg(F.sum("p0")).collect()
            rec[f"{name}_first_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            df.agg(F.sum("p0")).collect()
            rec[f"{name}_steady_s"] = round(time.time() - t0, 2)
        results[f"2048x{out_dim}"] = rec
        print(f"2048->{out_dim}: {rec}", flush=True)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["rp_scaling"] = {"n_rows": n_rows, "in_dim": IN_DIM, "cells": results}
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (rp_scaling)")


if __name__ == "__main__":
    main()
