"""Recall sweep for the approximate paths: IVF (recall@k vs nprobe),
LSH near-dup (pair recall vs n_planes), int8 quantization, and product
quantization (recall@k vs compression), measured against the exact
operators on driver testdata.

    python tools/recall_sweep.py [sf_dir] [n_queries]

Prints one JSON line per configuration — the tuning evidence behind the
defaults (nprobe=4/16 clusters, n_planes=8, PQ m=8/k=32).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from acorn_hybrid_vector_search_spark.operators.ann import ivf_build, ivf_search  # noqa: E402
from acorn_hybrid_vector_search_spark.operators.dedup import embedding_near_dups  # noqa: E402
from acorn_hybrid_vector_search_spark.operators.knn import knn_exact  # noqa: E402
from acorn_hybrid_vector_search_spark.operators.similarity import lsh_near_dup_pairs  # noqa: E402
from acorn_hybrid_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = 10

    spark = get_spark("recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    dim = len(emb.select("embedding").head()[0])

    qvecs = [
        (r["vec_id"], r["embedding"])
        for r in emb.orderBy("vec_id").limit(n_queries).collect()
    ]
    exact = {
        vid: [r["vec_id"] for r in knn_exact(emb, v, k).collect()] for vid, v in qvecs
    }

    index = ivf_build(emb, n_clusters=16)
    index.df = index.df.cache()
    for nprobe in (1, 2, 4, 8, 16):
        hits = tot = 0
        for vid, v in qvecs:
            got = {r["vec_id"] for r in ivf_search(index, v, k, nprobe=nprobe).collect()}
            hits += len(got & set(exact[vid]))
            tot += k
        print(
            json.dumps(
                {
                    "sweep": "ivf",
                    "nprobe": nprobe,
                    "n_clusters": index.n_clusters,
                    "recall_at_k": round(hits / tot, 4),
                    "scan_fraction": round(nprobe / index.n_clusters, 4),
                }
            )
        )

    # --- memory-ladder sweeps: int8 (4×) and PQ (byte-codes) vs exact L2 ---
    from acorn_hybrid_vector_search_spark.operators.pq import (
        pq_encode,
        pq_topk,
        pq_train,
    )
    from acorn_hybrid_vector_search_spark.operators.quantize import quantized_topk

    # exact top-k by L2 is the IVF/PQ truth; int8 ranks by cosine, so its
    # truth is the exact cosine ranking
    from acorn_hybrid_vector_search_spark.functions.distance import cosine_similarity

    cos_exact = {}
    for vid, v in qvecs:
        rows = (
            emb.select("vec_id", cosine_similarity("embedding", v).alias("s"))
            .orderBy(F.col("s").desc(), "vec_id")
            .limit(k)
            .collect()
        )
        cos_exact[vid] = {r["vec_id"] for r in rows}
    hits = sum(
        len({r["vec_id"] for r in quantized_topk(emb, v, k).collect()} & cos_exact[vid])
        for vid, v in qvecs
    )
    print(
        json.dumps(
            {
                "sweep": "int8",
                "compression": "4x",
                "recall_at_k": round(hits / (k * len(qvecs)), 4),
            }
        )
    )

    for m, kc in ((8, 32), (8, 256), (16, 32)):
        if dim % m:
            continue
        cb = pq_train(emb, m=m, k=kc)
        enc = pq_encode(emb, cb).select("vec_id", "pq_code").cache()
        enc.count()
        hits = sum(
            len({r["vec_id"] for r in pq_topk(enc, cb, v, k).collect()} & set(exact[vid]))
            for vid, v in qvecs
        )
        enc.unpersist()
        print(
            json.dumps(
                {
                    "sweep": "pq",
                    "m": m,
                    "k_centroids": kc,
                    "bytes_per_vec": m,
                    "compression": f"{dim * 4 // m}x",
                    "recall_at_k": round(hits / (k * len(qvecs)), 4),
                }
            )
        )

    # --- NSW graph ANN: recall@k vs search beam (ef), one batched job per ef ---
    from acorn_hybrid_vector_search_spark.operators.graph_ann import nsw_batch_topk

    n_total = emb.count()
    for ef in (16, 32, 64, n_total):
        got_rows = nsw_batch_topk(emb, qvecs, k, ef=ef).collect()
        by_q: dict[int, set[int]] = {}
        for r in got_rows:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(by_q.get(vid, set()) & set(exact[vid])) for vid, _ in qvecs)
        print(
            json.dumps(
                {
                    "sweep": "nsw",
                    "ef": "N" if ef == n_total else ef,
                    "recall_at_k": round(hits / (k * len(qvecs)), 4),
                }
            )
        )

    threshold = 0.5
    truth = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(emb, threshold, bucket_col=None).collect()
    }
    for n_planes in (2, 4, 8, 12):
        got = {
            (r["id_a"], r["id_b"])
            for r in lsh_near_dup_pairs(emb, threshold, dim, n_planes=n_planes).collect()
        }
        print(
            json.dumps(
                {
                    "sweep": "lsh",
                    "n_planes": n_planes,
                    "true_pairs": len(truth),
                    "recall": round(len(got & truth) / len(truth), 4) if truth else None,
                    "false_positives": len(got - truth),
                }
            )
        )

    for n_bands in (1, 2, 4, 8):
        got = {
            (r["id_a"], r["id_b"])
            for r in lsh_near_dup_pairs(
                emb, threshold, dim, n_planes=8, n_bands=n_bands
            ).collect()
        }
        print(
            json.dumps(
                {
                    "sweep": "lsh_or_banding",
                    "n_planes": 8,
                    "n_bands": n_bands,
                    "true_pairs": len(truth),
                    "recall": round(len(got & truth) / len(truth), 4) if truth else None,
                    "false_positives": len(got - truth),
                }
            )
        )


if __name__ == "__main__":
    main()
