"""spark-submit job script: ANN workloads over a synthetic embedding
corpus, printing a RESULT json line (the ANN analogue of
run_curation_job.py — used by BENCH/ann_scaling.py for N-vs-4N scaling
evidence of the similarity-search operators).

Round-4 shape — build-once / probe-many, the production ANN service
contract:
  - lsh_build:  hash the corpus ONCE into a persisted bucket index
                (bkey-sorted parquet; row-group stats prune probes)
  - lsh_probe:  3 independent query batches against the SAME index —
                bkey-pruned scan + broadcast join + JVM cosine, zero
                Python, no corpus re-hash
  - ivf_build:  train the quantizer + persist the inverted lists
  - ivf_probe:  3 query batches against the persisted lists
  - embedding_dedup: near-dup clustering on its own planted corpus
Per-workload walls + result checksums (probe batches individually) so
cross-cluster-size equality is asserted on every output.

Round-5 change — probe-batch FUSION: round 4 ran each family's 3
batches as 3 separate Spark jobs, and the decomposition showed the
non-scaling residual was almost entirely per-job fixed latency (LIMIT
probe, broadcast build, AQE planning: ~2-4s x 6 jobs on a 568s wall;
lsh_probe efficiency 0.595).  A production ANN service batches
concurrent queries into one probe — so the job now unions the 3 query
batches into ONE probe call per family (one pruned scan, one broadcast,
one top-k) and recovers the per-batch checksums from the fused result
with a groupBy.  Per-query results are independent of co-batched
queries (per-query candidate generation + per-query rank), so the
per-batch checksums are BIT-IDENTICAL to the round-4 three-job values —
the fusion changes the physics, not the answers (asserted across
cluster sizes as before; round-4 checksum continuity verified at 1M).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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
    ap.add_argument("--idx-dir", default="/dev/shm/m2n_ann_idx")
    args = ap.parse_args()

    from mongo2neo_spark.operators.similarity import (
        embedding_dedup_components,
        ivf_topk,
        lsh_bucketed_topk,
        train_ivf_centroids,
        write_ivf_cell_index,
        write_lsh_bucket_index,
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
    nq = args.n_queries
    # 3 disjoint probe batches, FUSED into one probe frame — per-query
    # independence makes the fused per-batch checksums equal the
    # three-separate-jobs values (see module docstring)
    all_queries = corpus.filter(F.col("vec_id") < 3 * nq)

    # warm Python UDF workers on every core (bucket/assign UDFs)
    width = 4 * spark.sparkContext.defaultParallelism
    warm = corpus.limit(2048).repartition(width)
    lsh_bucketed_topk(warm, all_queries.limit(4), k=3).count()

    idx_root = f"{args.idx_dir}_{os.getpid()}"
    walls, checks = {}, {}

    def chk_batches(df, family):
        # per-batch (count, bit_xor hash) recovered from the fused
        # result in ONE aggregation job — same values as running each
        # batch alone, because the batch id is a pure function of
        # query_id and every output row belongs to exactly one query
        rows = (
            df.withColumn("batch", (F.col("query_id") / nq).cast("int"))
            .groupBy("batch")
            .agg(
                F.count("*").alias("n"),
                F.bit_xor(
                    F.xxhash64("query_id", "neighbor_id", "rank")
                ).alias("c"),
            )
            .collect()
        )
        for r in rows:
            checks[f"{family}_probe_{int(r.batch)}"] = {
                "n": int(r.n), "c": int(r.c)
            }

    # index layout sized by DATA, IDENTICAL at every cluster size:
    # ~128 MB of exploded (bkey, id, float32[32]) rows per sort task.
    # Round-6 found the writers' defaultParallelism fallback made the
    # 1-executor cluster sort 12M-row partitions through a ~1.25 GB
    # per-task budget (multi-pass spill) while the 4-executor cluster
    # wrote a different, finer layout — two different jobs posing as a
    # scaling pair (see write_lsh_bucket_index docstring).
    row_b = 16 + 8 + 8 + 4 * 32
    idx_parts = max(32, (n_vecs * 8 * row_b) // (128 << 20) + 1)
    # the IVF index has ONE row per vector (no n_tables x posexplode
    # multiplier), so it gets its own partition count — reusing the LSH
    # 8x-sized idx_parts wrote the IVF index ~8x finer than the
    # 128 MB/task target (many tiny files/tasks; round-6 ADVICE)
    ivf_parts = max(32, (n_vecs * row_b) // (128 << 20) + 1)

    # ---- LSH: build once ...
    t0 = time.monotonic()
    write_lsh_bucket_index(corpus, f"{idx_root}/lsh", partitions=idx_parts)
    lsh_idx = spark.read.parquet(f"{idx_root}/lsh")
    checks["lsh_index_rows"] = {"n": lsh_idx.count()}
    walls["lsh_build"] = round(time.monotonic() - t0, 2)

    # ... probe many, fused (no corpus re-hash, one bkey-pruned scan,
    # one broadcast, one top-k; unroll=True skips the size probe — the
    # corpus is known-large here)
    t0 = time.monotonic()
    chk_batches(
        lsh_bucketed_topk(corpus, all_queries, k=args.k, index=lsh_idx,
                          unroll=True),
        "lsh",
    )
    walls["lsh_probe"] = round(time.monotonic() - t0, 2)

    # ---- IVF: train + build once ... (train wall reported separately
    # inside the build number — it is the driver-side fixed cost)
    t0 = time.monotonic()
    cents = train_ivf_centroids(corpus, n_centroids=32)
    ivf_train = round(time.monotonic() - t0, 2)
    write_ivf_cell_index(
        corpus, cents, f"{idx_root}/ivf", partitions=ivf_parts
    )
    ivf_idx = spark.read.parquet(f"{idx_root}/ivf")
    checks["ivf_index_rows"] = {"n": ivf_idx.count()}
    walls["ivf_build"] = round(time.monotonic() - t0, 2)

    # ... probe many, fused
    t0 = time.monotonic()
    chk_batches(
        ivf_topk(corpus, all_queries, k=args.k, centroids=cents, n_probe=8,
                 index=ivf_idx, unroll=True),
        "ivf",
    )
    walls["ivf_probe"] = round(time.monotonic() - t0, 2)

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
    checks["dedup"] = {
        kk: int(vv)
        for kk, vv in comp.agg(
            F.count("*").alias("n"),
            F.count_distinct("component").alias("c"),
        ).first().asDict().items()
    }
    walls["embedding_dedup"] = round(time.monotonic() - t0, 2)

    shutil.rmtree(idx_root, ignore_errors=True)
    total = round(sum(walls.values()), 2)
    print(
        "RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.getConf().get("spark.master", "?"),
                "wall_sec": total,
                "walls": walls,
                "vecs": n_vecs,
                "ivf_train_sec": ivf_train,
                "dedup_vecs": n_dd,
                "dedup_planes": p_planes,
                "vecs_per_sec": round(n_vecs / total, 1),
                "checks": checks,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
