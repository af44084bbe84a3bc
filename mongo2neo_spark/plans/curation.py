"""Training-data curation pipeline driver — the composed, resumable
sibling of plans.pipeline for the data-curation operator family
(driver brief: these are first-class components, so they get the same
lineage / idempotent-resume / scaling plumbing as the KG pipeline):

    profile  -> exact dedup -> minhash near-dup -> quality/lang filter

    spark-submit --py-files m2n.zip -m mongo2neo_spark.plans.curation \
        --input <documents parquet/iceberg> --out <dir> [--no-resume]

Stage shapes at 100 TB:

- **profile** (bucket-granular resume): one pass over the corpus, all
  JVM-side expressions except the Arrow-batched fingerprint; output
  REBALANCE-clustered by a stable doc_id bucket (AQE splits hot buckets
  / coalesces small ones), per-bucket lineage rides the write via
  ``observe()`` — zero extra scans.
- **exact** (global): one hash shuffle keyed (xxhash64(text), len, text)
  — the text stays in the grouping key as the collision verify
  (operators.dedup.exact_dedup).
- **neardup** (global): MinHash/LSH banding where the band stream is
  (id, band_key) only, JVM-side jaccard verify, min-id CC survivors.
- **filter** (global, trivially parallel): quality >= threshold AND
  allowed predicted language; pure codegen expressions.

Each stage records lineage and is skipped on resume when its lineage
rows exist; re-running a completed pipeline is a no-op (tested).
"""

from __future__ import annotations

import argparse
import uuid
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from ..operators import dedup as dedup_mod
from ..operators import skew as skew_mod
from ..operators import text as text_mod
from ..sources import io as m2nio
from . import lineage as lin


@dataclass
class CurationConfig:
    n_buckets: int = 32            # profile lineage/resume granularity
    minhash_threshold: float = 0.5
    band_cap: int = hashing.BAND_CAP
    min_quality: float = 0.5
    langs: Tuple[str, ...] = ("en",)
    run_id: str = ""

    def __post_init__(self):
        if not self.run_id:
            self.run_id = uuid.uuid4().hex[:12]


def run_curation(
    spark: SparkSession,
    input_source: str,
    out_dir: str,
    cfg: Optional[CurationConfig] = None,
    resume: bool = True,
) -> Dict[str, str]:
    cfg = cfg or CurationConfig()
    paths = {
        "profiled": f"{out_dir}/profiled",
        "exact": f"{out_dir}/exact",
        "neardup": f"{out_dir}/neardup",
        "curated": f"{out_dir}/curated",
        "lineage": lin.lineage_path(out_dir),
    }
    _stage_profile(spark, input_source, paths, cfg, resume)
    _stage_exact(spark, paths, cfg, resume)
    _stage_neardup(spark, paths, cfg, resume)
    _stage_filter(spark, paths, cfg, resume)
    return paths


# ---------------------------------------------------------------------------
# stage 1: text profile (bucket-granular resume)
# ---------------------------------------------------------------------------
def _stage_profile(spark, input_source, paths, cfg, resume) -> None:
    stage = "profile"
    out_root = paths["lineage"].rsplit("/", 1)[0]
    done = set(lin.completed_keys(spark, out_root, stage)) if resume else set()
    all_buckets = {str(b) for b in range(cfg.n_buckets)}
    todo = sorted(all_buckets - done, key=int)
    if not todo:
        return
    todo_ints = [int(b) for b in todo]

    with lin.StageTimer() as t:
        docs = m2nio.read_table(spark, input_source).filter(
            F.col("doc_id").isNotNull() & F.col("text").isNotNull()
        )
        docs = docs.withColumn(
            "bucket", skew_mod.bucket_of(F.col("doc_id"), cfg.n_buckets)
        )
        if len(todo) < cfg.n_buckets:
            docs = docs.filter(F.col("bucket").isin(todo_ints))
        prof = text_mod.text_profile(docs)
        # NARROW write-clustering exchange (profile columns are tiny next
        # to the text); REBALANCE so AQE right-sizes output files and
        # splits a hot bucket across write tasks
        prof = prof.hint("rebalance", "bucket")
        obs, prof = lin.observe_bucket_metrics(
            prof, todo_ints, ["doc_id", "bucket"]
        )
        m2nio.write_table(
            prof, paths["profiled"], partition_by=["bucket"],
            options={"parquet.block.size": m2nio.INTERMEDIATE_ROW_GROUP_BYTES},
        )
    got = obs.get
    entries = []
    for b in todo:
        n = got.get(f"n_{b}") or 0
        c = got.get(f"c_{b}")
        entries.append((b, 0, int(n), str(c) if c is not None else "0", t.wall_ms))
    lin.record(spark, out_root, stage, entries, cfg.run_id)


# ---------------------------------------------------------------------------
# stages 2-4: global stages (whole-stage lineage, resume = skip)
# ---------------------------------------------------------------------------
def _global_stage(spark, paths, cfg, resume, stage, produce) -> None:
    """Shared shape: read -> transform -> observed write -> lineage row.

    ``produce`` returns (df, n_in); the drop audit (n_in minus the
    written count, collected by ``observe()`` as a side effect of the
    write — no second execution of the transform) lands in the lineage
    entry's input_rows slot, so shrinkage is never silent.  ``n_in`` is
    a parquet-metadata count of the previous stage's table — cheap."""
    out_root = paths["lineage"].rsplit("/", 1)[0]
    if resume and lin.completed_keys(spark, out_root, stage):
        return
    with lin.StageTimer() as t:
        df, n_in = produce()
        obs, df = lin.observe_table_metrics(df)
        m2nio.write_table(
            df, paths[_STAGE_OUT[stage]], partition_by=["bucket"],
            options={"parquet.block.size": m2nio.INTERMEDIATE_ROW_GROUP_BYTES},
        )
    got = obs.get
    dropped = n_in - int(got["n"])
    lin.record(
        spark, out_root, stage,
        [(lin.STAGE_KEY, int(dropped), int(got["n"]),
          str(got["c"]) if got["c"] is not None else "0", t.wall_ms)],
        cfg.run_id,
    )


_STAGE_OUT = {"exact": "exact", "neardup": "neardup", "filter": "curated"}


def _stage_exact(spark, paths, cfg, resume) -> None:
    def produce():
        prof = spark.read.parquet(paths["profiled"])
        return dedup_mod.exact_dedup(prof, "text", "doc_id"), prof.count()

    _global_stage(spark, paths, cfg, resume, "exact", produce)


def _stage_neardup(spark, paths, cfg, resume) -> None:
    def produce():
        ex = spark.read.parquet(paths["exact"])
        comp = dedup_mod.minhash_dedup_components(
            ex, "text", "doc_id",
            threshold=cfg.minhash_threshold, band_cap=cfg.band_cap,
        )
        survivors = comp.groupBy("component").agg(
            F.min("id").alias("doc_id")
        )
        kept = ex.join(survivors.select("doc_id"), "doc_id", "left_semi")
        return kept, ex.count()

    _global_stage(spark, paths, cfg, resume, "neardup", produce)


def _stage_filter(spark, paths, cfg, resume) -> None:
    def produce():
        nd = spark.read.parquet(paths["neardup"])
        kept = nd.filter(
            (F.col("quality") >= cfg.min_quality)
            & F.col("pred_lang").isin(list(cfg.langs))
        )
        return kept, nd.count()

    _global_stage(spark, paths, cfg, resume, "filter", produce)


def main(argv=None) -> None:
    from ..session import get_spark

    ap = argparse.ArgumentParser(description="document curation pipeline")
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)
    spark = get_spark(
        master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    cfg = CurationConfig(n_buckets=args.buckets, min_quality=args.min_quality)
    paths = run_curation(
        spark, args.input, args.out, cfg, resume=not args.no_resume
    )
    n = spark.read.parquet(paths["curated"]).count()
    print(f"curation complete: {n} curated docs -> {args.out}")


if __name__ == "__main__":
    main()
