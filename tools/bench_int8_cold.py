"""Bandwidth-bound int8 A/B (r14 — VERDICT r13 ask #1): the int8 rung
exists for the regime where the corpus does NOT fit page cache and scan
BYTES are the constraint — the one committed r13 int8 measurement was
page-cached (store resident), where the f32 kernel wins ~4× and the
rung's entire justification had zero evidence. This tool measures the
regime the rung exists for: every sample runs against a COLD page cache
(``sync; echo 3 > /proc/sys/vm/drop_caches`` before each run — root-only;
the tool refuses rather than silently measuring warm), arms alternate
f32/int8 so a host phase shifts both, every sample + interleaved
job-dispatch floors + loadavg disclosed.

Three paired measurements, coldest-claim first:

1. ``cold_scan`` — the rung's PREMISE in isolation: wall time to stream
   the full vector column (f32 store) vs the full qcode column (int8
   sidecar) through a trivial aggregate. No gemm, no merge: pure
   bytes-off-disk. Prediction: ~4× (the byte ratio).
2. ``cold_kernel`` — what serving actually pays end-to-end:
   ``nsw_dense_topk`` (f32) vs ``nsw_dense_topk_int8(mode='rerank')``
   (the scale mode), |Q| queries, k=10. The int8 kernel's phase 2
   re-reads candidate row groups of the f32 store — at this corpus size
   candidate ids scatter, so page/row-group skipping quality decides how
   much of the f32 bytes phase 2 pays back; that split is the honest
   finding either way (``spark.sql.parquet.pushdown.inFilterThreshold``
   is raised so the candidate ``isin`` pushes as a real parquet filter
   instead of collapsing to a min/max range).
3. ``warm_kernel`` — the r13 control (one pair, caches hot): the
   page-cached regime where f32 is expected to win, re-confirmed in the
   same artifact so the two regimes sit side by side.

Store: the reference shape (123k × 2048) at ``vector_dtype=float32``
(the reference's own precision — the 4× claim is vs float32, 8× vs
float64), 32 shards. Build untimed (the amortized ladder rows time it).

Run: python tools/bench_int8_cold.py [q_n] [n_vectors] [dim] [shards]
Writes the ``dense_int8_cold`` section of BENCH_LADDER.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from acorn_hybrid_vector_search_spark.operators.graph_ann import (  # noqa: E402
    nsw_dense_topk,
    nsw_dense_topk_int8,
    nsw_write,
    nsw_write_int8,
)
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402
from tools._bench_common import job_floor_ms  # noqa: E402

K = 10
PAIRS = 3  # alternating cold samples per arm


def drop_caches() -> None:
    """Flush dirty pages and evict the page cache. Refuses to continue
    if the write fails — a 'cold' number measured warm is worse than no
    number."""
    subprocess.run(["sync"], check=True)
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
    except OSError as e:
        raise SystemExit(
            f"cannot drop page caches ({e}) — this tool only produces "
            "cold-regime numbers; run as root or use a cgroup memory cap"
        )


def du_bytes(path: str) -> int:
    out = subprocess.run(
        ["du", "-sb", path], capture_output=True, text=True, check=True
    )
    return int(out.stdout.split()[0])


def _synth_corpus(spark, n_vectors: int, dim: int):
    """Same deterministic executor-side clustered corpus as
    bench_acorn_amortized.py (labels vec_id % 10, dim-0 shifted)."""
    import numpy as np
    import pandas as pd

    schema = "vec_id long, embedding array<double>, label int"

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(100003 + int(ids[0]))
            x = rng.standard_normal((len(ids), dim))
            labels = (ids % 10).astype("int32")
            x[:, 0] += 4.0 * labels
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [row.tolist() for row in x],
                    "label": labels,
                }
            )

    return spark.range(n_vectors).repartition(32).mapInPandas(gen, schema)


def main() -> None:
    q_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_vectors = int(sys.argv[2]) if len(sys.argv) > 2 else 123_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    shards = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    load_launch = [round(x, 2) for x in os.getloadavg()]

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("bench-int8-cold")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "512")
    # phase-1 cost is per ROW; size splits so the 4× smaller sidecar
    # keeps the same task parallelism as the store (kernel docstring)
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024)
    )
    # let the candidate isin push as a REAL parquet filter (default
    # threshold 10 collapses large IN lists to a min/max range, which
    # spans the whole id space here and skips nothing)
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "4096")

    emb = _synth_corpus(spark, n_vectors, dim)
    root = tempfile.mkdtemp(prefix="acorn_int8_cold_")
    path = root + "/graph"
    t0 = time.time()
    nsw_write(
        emb.select("vec_id", "embedding", "label").repartition(shards),
        path,
        payload_cols=["label"],
        vector_dtype="float32",
    )
    build_s = time.time() - t0
    t0 = time.time()
    nsw_write_int8(spark, path)
    int8_build_s = time.time() - t0
    sidecar = path + "/_int8_codes"
    store_b = du_bytes(path) - du_bytes(sidecar)
    sidecar_b = du_bytes(sidecar)
    print(
        f"store {store_b / 1e6:.0f} MB, sidecar {sidecar_b / 1e6:.0f} MB "
        f"(ratio {store_b / sidecar_b:.2f}); build {build_s:.0f}s + "
        f"int8 {int8_build_s:.0f}s",
        flush=True,
    )

    vecs = {
        r["vec_id"]: list(r["embedding"]) for r in emb.limit(q_n).collect()
    }
    queries = [(int(i), vecs[i]) for i in sorted(vecs)[:q_n]]

    # arm bodies — each returns after full materialization
    def scan_f32() -> None:
        (
            spark.read.parquet(path)
            .select(F.sum(F.element_at("vector", 1)))
            .collect()
        )

    def scan_int8() -> None:
        (
            spark.read.parquet(sidecar)
            .select(F.sum(F.length("qcode")))
            .collect()
        )

    def kernel_f32() -> None:
        nsw_dense_topk(spark, path, queries, K).count()

    def kernel_int8() -> None:
        nsw_dense_topk_int8(
            spark, path, queries, K, mode="rerank"
        ).count()

    def cold_pair(name: str, arm_a, arm_b) -> dict:
        """PAIRS alternating cold samples per arm (a, b, a, b, …) with a
        floor probe after each pair; medians + all samples disclosed."""
        a_s, b_s, floors = [], [], []
        for _ in range(PAIRS):
            drop_caches()
            t0 = time.time()
            arm_a()
            a_s.append(round(time.time() - t0, 2))
            drop_caches()
            t0 = time.time()
            arm_b()
            b_s.append(round(time.time() - t0, 2))
            floors.append(job_floor_ms(spark))
        out = {
            "f32_s": sorted(a_s)[len(a_s) // 2],
            "int8_s": sorted(b_s)[len(b_s) // 2],
            "f32_samples_s": a_s,
            "int8_samples_s": b_s,
            "floor_ms": floors,
        }
        out["f32_over_int8"] = round(out["f32_s"] / out["int8_s"], 2)
        print(f"  {name}: {out}", flush=True)
        return out

    floor_start = job_floor_ms(spark)
    cold_scan = cold_pair("cold_scan", scan_f32, scan_int8)
    cold_kernel = cold_pair("cold_kernel", kernel_f32, kernel_int8)

    # warm control (the r13 page-cached regime): one untimed warm pass
    # per arm, then one timed pair — caches hot, same code paths
    kernel_f32()
    t0 = time.time()
    kernel_f32()
    warm_f32 = round(time.time() - t0, 2)
    kernel_int8()
    t0 = time.time()
    kernel_int8()
    warm_int8 = round(time.time() - t0, 2)

    out = {
        "n_vectors": n_vectors,
        "dim": dim,
        "n_shards": shards,
        "vector_dtype": "float32",
        "batch": q_n,
        "k": K,
        "rerank_mode": "rerank",
        "store_bytes": store_b,
        "sidecar_bytes": sidecar_b,
        "bytes_ratio": round(store_b / sidecar_b, 2),
        "loadavg_at_launch": load_launch,
        "loadavg_at_end": [round(x, 2) for x in os.getloadavg()],
        "job_floor_ms_start": floor_start,
        "cold_scan": cold_scan,
        "cold_kernel": cold_kernel,
        "warm_kernel": {"f32_s": warm_f32, "int8_s": warm_int8},
        "build_s_untimed": round(build_s, 1),
        "int8_codes_build_s_untimed": round(int8_build_s, 1),
        "in_filter_threshold": 4096,
        "max_partition_bytes_mb": 16,
    }
    shutil.rmtree(root)

    out_path = os.path.join(ROOT, "BENCH_LADDER.json")
    merged = {"base_sf": 0.1, "host": "local[32]", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["dense_int8_cold"] = out
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out_path} (dense_int8_cold)", flush=True)


if __name__ == "__main__":
    main()
