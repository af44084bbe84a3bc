"""spark-submit job: exact substring-dedup workloads over a large
synthetic document corpus, printing a RESULT json line (used by
BENCH/substring_scaling.py for N-vs-4N scaling evidence of
operators.dedup.duplicated_window_profile / substring_dedup — the one
major curation family that shipped in round 5 with a no-pairwise-join
scale ARGUMENT but no measured scaling row).

Shape under test (the published sub-document dedup recipe,
re-expressed without the single-machine suffix array): one Arrow
rolling-fingerprint pass over token k-windows, an (fp, id) aggregation
with positions riding as per-doc lists, "seen in >= 2 distinct docs"
as a plain count(*) window, exact-gram verify, min-id keeper.  No
pairwise join anywhere — every stage is a linear group-by, so the
campaign tests whether the two window-keyed shuffles of the ~40-window
per-doc stream actually scale, cap-free.

Two workloads, timed separately:
  profile — duplicated_window_profile (detect + verify + per-doc ppm)
  dedup   — substring_dedup (detect + verify + keeper + token removal,
            clean text materialized and checksummed)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    from mongo2neo_spark.operators.dedup import (
        duplicated_window_profile,
        substring_dedup,
    )
    from mongo2neo_spark.session import DEFAULT_CONFS

    builder = SparkSession.builder.appName("m2n-substring-job")
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.files.minPartitionNum",
        str(2 * spark.sparkContext.defaultParallelism),
    )

    docs = spark.read.parquet(args.input)
    n_docs = docs.count()

    walls = {}
    checks = {}

    t0 = time.monotonic()
    prof = duplicated_window_profile(docs, k=args.k)
    row = prof.agg(
        F.count("*").alias("n"),
        F.sum("n_dup_windows").alias("dup_windows"),
        F.bit_xor(
            F.xxhash64("id", "n_windows", "n_dup_windows", "dup_window_ppm")
        ).alias("c"),
    ).first()
    walls["profile"] = round(time.monotonic() - t0, 2)
    checks["profile"] = {k: int(v) for k, v in row.asDict().items()}

    t0 = time.monotonic()
    ded = substring_dedup(docs, k=args.k)
    row = ded.agg(
        F.count("*").alias("n"),
        F.sum("n_removed_tokens").alias("removed_tokens"),
        F.bit_xor(
            F.xxhash64("id", "clean_text", "n_removed_tokens")
        ).alias("c"),
    ).first()
    walls["dedup"] = round(time.monotonic() - t0, 2)
    checks["dedup"] = {k: int(v) for k, v in row.asDict().items()}

    wall = round(sum(walls.values()), 2)
    print(
        "RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.getConf().get("spark.master", "?"),
                "wall_sec": wall,
                "walls": walls,
                "docs": n_docs,
                "docs_per_sec": round(n_docs / wall, 1),
                "checks": checks,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
