"""spark-submit job: graph-analytics workloads (co-occurrence edge
build, triangle counting, integer PageRank) over a large synthetic
skewed bipartite (group, item) table, printing a RESULT json line (used
by BENCH/graph_scaling.py for N-vs-4N scaling evidence of
operators/graph.py).

Shape under test:
* edge build — per-group JVM pair expansion (bounded by the generator's
  group size) -> weight aggregation; the K3 cap path is exercised with
  a cap above the generator's max so nothing is dropped (drop-audit
  correctness is pinned by tests, not benchmarked).
* triangles — the degree-ordered-orientation wedge join; the item
  distribution is quadratically skewed (hub items), which is exactly
  the regime the orientation exists for.
* pagerank — 5 join-per-iteration rounds of integer-exact rank flow on
  the once-partitioned persisted adjacency.

The edge set is built once and persisted (as a production pipeline
would materialize it) so the triangle and pagerank walls measure those
operators, not a rebuild.
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
from pyspark.storagelevel import StorageLevel


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--min-weight", type=int, default=2)
    ap.add_argument("--pr-iters", type=int, default=5)
    args = ap.parse_args()

    from mongo2neo_spark.operators.graph import (
        cooccurrence_edges,
        pagerank_integer,
        triangle_counts,
    )
    from mongo2neo_spark.session import DEFAULT_CONFS

    builder = SparkSession.builder.appName("m2n-graph-job")
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.files.minPartitionNum",
        str(2 * spark.sparkContext.defaultParallelism),
    )

    df = spark.read.parquet(args.input)
    n_rows = df.count()

    walls: dict[str, float] = {}
    checks: dict[str, dict] = {}

    def checksum(out, name, *cols):
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*cols)).alias("c"),
        ).first()
        checks[name] = {"n": int(agg["n"]), "c": int(agg["c"])}

    # 1. edge build (cap set above the generator's group size: the cap
    # compare runs on every group, but nothing is dropped, so the edge
    # set is threshold-only)
    t0 = time.monotonic()
    edges = cooccurrence_edges(
        df, "group_id", "item_id",
        min_weight=args.min_weight, max_group_items=64,
    ).persist(StorageLevel.DISK_ONLY)
    checksum(edges, "edges", "s1", "s2", "weight")
    walls["edges_build"] = round(time.monotonic() - t0, 2)

    e = edges.select("s1", "s2")

    # 2. triangle counting (degree-ordered orientation)
    t0 = time.monotonic()
    tri = triangle_counts(e)
    checksum(tri, "triangles", "node", "n_triangles")
    walls["triangles"] = round(time.monotonic() - t0, 2)

    # 3. integer-exact pagerank
    t0 = time.monotonic()
    pr = pagerank_integer(e, iters=args.pr_iters)
    agg = pr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank").alias("mass"),
        F.bit_xor(F.xxhash64("node", "rank")).alias("c"),
    ).first()
    checks["pagerank"] = {
        "n": int(agg["n"]), "mass": int(agg["mass"]), "c": int(agg["c"]),
    }
    walls["pagerank"] = round(time.monotonic() - t0, 2)

    wall = round(sum(walls.values()), 2)
    print(
        "RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.getConf().get("spark.master", "?"),
                "wall_sec": wall,
                "walls": walls,
                "rows": n_rows,
                "edges": checks["edges"]["n"],
                "rows_per_sec": round(n_rows / wall, 1),
                "checks": checks,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
