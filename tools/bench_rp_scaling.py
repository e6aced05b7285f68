"""RP dims-scaling evidence (r6 verdict ask #3).

project_embedding builds ~in_dim·out_dim/3 literal add-multiply nodes
in ONE Catalyst expression; committed evidence before r7 covered 64→16
(~340 nodes) only, while the module's 100 TB story is written for the
reference's 2048 dims (acorn.py:275). This tool measures BOTH paths at
2048→{16, 32, 64, 128} on synthetic 2048-dim vectors:

- ``expr_first_s``: Catalyst literal fold, first execution — includes
  analysis + codegen of the node chain; at 2048 input dims the ~680-term
  left-fold PER OUTPUT DIM overflows the JVM stack during column-node
  conversion (StackOverflowError after ~49 s of recursion) — the
  literal-fold path is not merely slow there, it is BROKEN, which is
  recorded per cell as ``expr_error``;
- ``expr_steady_s``: second execution of the same prepared frame;
- ``udf_first_s`` / ``udf_steady_s``: the Arrow matmul path
  (bit-identical doubles, no expression nodes, no stack depth).

The measured cliff pins RP_DEPTH_BUDGET (operators/similarity.py):
below it the JVM expression wins (no Python), above it the matmul is
the only working plan. Writes the ``rp_scaling`` section of
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

# (in_dim, out_dim) cells: nnz ≈ in·out/3, expr chain depth ≈ in/3
CELLS = [(64, 16), (256, 32), (512, 32), (1024, 64), (2048, 16), (2048, 128)]


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark("bench-rp-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    from acorn_hybrid_vector_search_spark.operators.similarity import (
        project_embedding,
        project_embedding_udf,
        projection_matrix,
    )

    def make_vecs(in_dim: int):
        # deterministic synthetic vectors (pure column expressions)
        v = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(in_dim - 1)),
                    lambda i: (
                        F.pmod(
                            F.col("id") * 31 + i.cast("long") * 7, F.lit(97)
                        ).cast("double")
                        / 97.0
                    ),
                ).alias("embedding"),
            )
            .repartition(32)
            .cache()
        )
        v.count()
        return v

    results: dict[str, dict] = {}
    vec_cache: dict[int, object] = {}
    for in_dim, out_dim in CELLS:
        if in_dim not in vec_cache:
            vec_cache[in_dim] = make_vecs(in_dim)
        vecs = vec_cache[in_dim]
        t0 = time.time()
        R = projection_matrix(in_dim, out_dim, seed="jl")
        matrix_s = time.time() - t0
        nnz = sum(1 for row in R for r in row if r != 0.0)
        depth = max(sum(1 for r in row if r != 0.0) for row in zip(*R))
        rec: dict = {
            "nnz": nnz,
            "max_chain_depth": depth,
            "matrix_derive_s": round(matrix_s, 2),
        }

        paths = [
            ("expr", lambda: project_embedding(F.col("embedding"), R)),
            ("udf", lambda: project_embedding_udf("embedding", R)),
        ]
        already_failed = any(
            str(r.get("expr_error", "")).startswith("StackOverflowError")
            and "expr_failed_after_s" in r
            for r in results.values()
        )
        if depth > 600 and already_failed:
            # the depth>600 StackOverflowError is already MEASURED at an
            # earlier cell this run (~49 s of recursion before dying);
            # re-failing at every deeper cell adds nothing but wall time
            rec["expr_error"] = (
                "StackOverflowError (same depth regime as the measured cell)"
            )
            paths = paths[1:]
        for name, col in paths:
            t0 = time.time()
            try:
                df = vecs.select(F.get(col(), 0).alias("p0"))
                df.agg(F.sum("p0")).collect()
                rec[f"{name}_first_s"] = round(time.time() - t0, 2)
                t0 = time.time()
                df.agg(F.sum("p0")).collect()
                rec[f"{name}_steady_s"] = round(time.time() - t0, 2)
            except Exception as e:  # the HONEST record: the path is broken
                msg = str(e)
                kind = (
                    "StackOverflowError"
                    if "StackOverflowError" in msg
                    else type(e).__name__
                )
                rec[f"{name}_error"] = kind
                rec[f"{name}_failed_after_s"] = round(time.time() - t0, 2)
        results[f"{in_dim}x{out_dim}"] = rec
        print(f"{in_dim}->{out_dim}: {rec}", flush=True)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["rp_scaling"] = {"n_rows": n_rows, "cells": results}
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (rp_scaling)")


if __name__ == "__main__":
    main()
