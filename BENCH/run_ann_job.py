"""spark-submit job script: ANN workloads over a synthetic embedding
corpus, printing a RESULT json line (the ANN analogue of
run_curation_job.py — used by BENCH/ann_scaling.py for N-vs-4N scaling
evidence of the similarity-search operators).

Runs the two scale-path ANN variants end-to-end:
  - multi-table hyperplane LSH top-k (lsh_bucketed_topk)
  - IVF top-k (train centroids + probe)
plus the embedding near-dup clustering (embedding_dedup_components),
and reports per-workload wall + a result checksum so cross-cluster-size
equality can be asserted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# importable under plain `python BENCH/run_ann_job.py` too (spark-submit
# --py-files puts the zip on sys.path; this covers the local smoke path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--dedup-input", required=True)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from mongo2neo_spark.operators.similarity import (
        embedding_dedup_components,
        ivf_topk,
        lsh_bucketed_topk,
        train_ivf_centroids,
    )
    from mongo2neo_spark.session import DEFAULT_CONFS

    builder = SparkSession.builder.appName("m2n-ann-job")
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.files.minPartitionNum",
        str(2 * spark.sparkContext.defaultParallelism),
    )

    corpus = spark.read.parquet(args.input)
    n_vecs = corpus.count()
    queries = corpus.filter(F.col("vec_id") < args.n_queries)

    # warm Python UDF workers on every core (bucket/assign UDFs)
    width = 4 * spark.sparkContext.defaultParallelism
    warm = corpus.limit(2048).repartition(width)
    lsh_bucketed_topk(warm, queries.limit(4), k=3).count()

    walls, checks = {}, {}

    t0 = time.monotonic()
    lsh = lsh_bucketed_topk(corpus, queries, k=args.k)
    checks["lsh"] = lsh.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("query_id", "neighbor_id", "rank")).alias("c"),
    ).first().asDict()
    walls["lsh_topk"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    cents = train_ivf_centroids(corpus, n_centroids=32)
    ivf = ivf_topk(corpus, queries, k=args.k, centroids=cents, n_probe=8)
    checks["ivf"] = ivf.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("query_id", "neighbor_id", "rank")).alias("c"),
    ).first().asDict()
    walls["ivf_topk"] = round(time.monotonic() - t0, 2)

    # near-dup clustering runs on its own planted-duplicate corpus with
    # scale-appropriate plane count: hyperplane LSH needs
    # p ~ log2(n / target_bucket_size) planes per table or bucket
    # co-residence of UNRELATED vectors goes quadratic (tight 0.99-cosine
    # dup groups still collide: per-table p(collision) = 0.949^p)
    import math

    dd = spark.read.parquet(args.dedup_input)
    n_dd = dd.count()
    p_planes = max(6, math.ceil(math.log2(max(n_dd, 2) / 32.0)))
    t0 = time.monotonic()
    comp = embedding_dedup_components(
        dd, threshold=0.95, n_planes=p_planes, n_tables=8
    )
    checks["dedup"] = comp.agg(
        F.count("*").alias("n"),
        F.count_distinct("component").alias("c"),
    ).first().asDict()
    walls["embedding_dedup"] = round(time.monotonic() - t0, 2)

    total = round(sum(walls.values()), 2)
    print(
        "RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.getConf().get("spark.master", "?"),
                "wall_sec": total,
                "walls": walls,
                "vecs": n_vecs,
                "dedup_vecs": n_dd,
                "dedup_planes": p_planes,
                "vecs_per_sec": round(n_vecs / total, 1),
                "checks": {k: {kk: int(vv) for kk, vv in v.items()}
                           for k, v in checks.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
