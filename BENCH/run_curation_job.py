"""spark-submit job script: run the document-curation pipeline and print
a RESULT json line (the curation analogue of run_pipeline_job.py — same
--py-files launch mode, used by BENCH/curation_scaling.py for the
N-vs-4N scaling evidence of the data-pipeline operator family).

    spark-submit --master local-cluster[N,4,6144] \
        --py-files m2n.zip BENCH/run_curation_job.py \
        --input <documents parquet> --out <dir>
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from mongo2neo_spark.plans.curation import CurationConfig, run_curation
    from mongo2neo_spark.session import DEFAULT_CONFS

    builder = SparkSession.builder.appName("m2n-curation-job")
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.files.minPartitionNum",
        str(2 * spark.sparkContext.defaultParallelism),
    )

    n_docs = spark.read.parquet(args.input).count()
    # warm every core's Python UDF worker (fingerprint + minhash UDFs)
    from mongo2neo_spark.operators import dedup as _dd
    from mongo2neo_spark.operators import text as _tx

    width = 4 * spark.sparkContext.defaultParallelism
    warm = spark.read.parquet(args.input).limit(2048).repartition(width)
    _tx.text_profile(warm).count()
    _dd.minhash_candidate_pairs(warm).count()

    cfg = CurationConfig(n_buckets=args.buckets, run_id="job")
    t0 = time.monotonic()
    paths = run_curation(spark, args.input, args.out, cfg, resume=False)
    wall = time.monotonic() - t0
    n_curated = spark.read.parquet(paths["curated"]).count()
    print(
        "RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.getConf().get("spark.master", "?"),
                "wall_sec": round(wall, 2),
                "docs": n_docs,
                "docs_per_sec": round(n_docs / wall, 1),
                "curated": n_curated,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
