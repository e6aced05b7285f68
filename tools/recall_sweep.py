"""Recall sweep for the approximate paths: IVF (recall@k vs nprobe) and
LSH near-dup (pair recall vs n_planes), measured against the exact
operators on driver testdata.

    python tools/recall_sweep.py [sf_dir] [n_queries]

Prints one JSON line per configuration — the tuning evidence behind the
defaults (nprobe=4/16 clusters, n_planes=8).
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
