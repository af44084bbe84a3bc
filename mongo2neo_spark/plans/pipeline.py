"""End-to-end pipeline driver (E1, SURVEY.md §3): the spark-submit entry
point that runs

    ingest → extract → link → canonicalize → materialize

with per-partition lineage, idempotent resume, and salted skew handling.

    spark-submit --py-files m2n.zip -m mongo2neo_spark.plans.pipeline \
        --input <transcripts parquet/iceberg> --out <dir> [--no-resume]

Each stage is a pure DataFrame function (operators/*); this module only
sequences them, writes their outputs via the IO abstraction, and records
lineage.  Re-running a completed pipeline is a no-op (lineage skip).
"""

from __future__ import annotations

import argparse
import uuid
from dataclasses import dataclass
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import rules
from ..functions import hashing
from ..operators import cc as cc_mod
from ..operators import extract as extract_mod
from ..operators import ingest as ingest_mod
from ..operators import link as link_mod
from ..operators import materialize as mat_mod
from ..operators import skew as skew_mod
from ..sources import io as m2nio
from . import lineage as lin


@dataclass
class PipelineConfig:
    n_buckets: int = 64          # extraction lineage/resume granularity
    salt: int = skew_mod.DEFAULT_SALT
    band_cap: int = hashing.BAND_CAP
    threshold: float = rules.LINK_THRESHOLD
    max_provenance: int = mat_mod.MAX_PROVENANCE
    run_id: str = ""

    def __post_init__(self):
        if not self.run_id:
            self.run_id = uuid.uuid4().hex[:12]


def run_pipeline(
    spark: SparkSession,
    input_source: str,
    out_dir: str,
    cfg: Optional[PipelineConfig] = None,
    resume: bool = True,
) -> Dict[str, str]:
    cfg = cfg or PipelineConfig()
    paths = {
        "extracted": f"{out_dir}/extracted",
        "components": f"{out_dir}/components",
        "nodes": f"{out_dir}/nodes",
        "edges": f"{out_dir}/edges",
        "triples": f"{out_dir}/triples",
        "lineage": lin.lineage_path(out_dir),
    }
    _stage_extract(spark, input_source, paths, cfg, resume)
    _stage_components(spark, paths, cfg, resume)
    _stage_materialize(spark, paths, cfg, resume)
    return paths


# ---------------------------------------------------------------------------
# stage 1: ingest + extract (bucket-granular resume)
# ---------------------------------------------------------------------------
def _stage_extract(spark, input_source, paths, cfg, resume) -> None:
    stage = "extract"
    done = set(lin.completed_keys(spark, paths["lineage"].rsplit("/", 1)[0], stage)) if resume else set()
    all_buckets = {str(b) for b in range(cfg.n_buckets)}
    todo = sorted(all_buckets - done, key=int)
    if not todo:
        return
    out_root = paths["lineage"].rsplit("/", 1)[0]

    with lin.StageTimer() as t:
        turns = ingest_mod.ingest(m2nio.read_transcripts(spark, input_source))
        turns = turns.withColumn(
            "bucket", skew_mod.bucket_of(F.col("conv_id"), cfg.n_buckets)
        )
        if len(todo) < cfg.n_buckets:
            turns = turns.filter(F.col("bucket").isin([int(b) for b in todo]))
        # K1 salted repartition, keyed by (bucket, turn-salt): spreads a
        # hot conversation across `salt` partitions for the UDF stage while
        # keeping output files clustered by the bucket write-partition
        # (avoids tasks×buckets small-file blowup at scale).
        # EXPLICIT partition count: AQE sizes coalescing by shuffle BYTES,
        # but the downstream pandas-UDF work per byte is huge — letting AQE
        # coalesce here collapses the extraction stage to a handful of
        # tasks and kills scaling.  User-specified counts are not coalesced.
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        salt_col = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(cfg.salt))
        turns = turns.repartition(n_part, F.col("bucket"), salt_col)
        # ONE write of the combined extraction table (flat mention/triple
        # arrays, one row per turn); mentions/raw_triples are derived
        # columnar at read time by later stages.  One UDF pass + one
        # full-data write — cheaper than materializing (or caching) two
        # denormalized tables, at sandbox and at 100 TB alike.
        ex = extract_mod.extract(turns).withColumn(
            "bucket", skew_mod.bucket_of(F.col("conv_id"), cfg.n_buckets)
        )
        # dynamic partition overwrite = idempotent per-bucket replace (S2)
        m2nio.write_table(ex, paths["extracted"], partition_by=["bucket"])

    # lineage: per-bucket metrics from the written output (reads back the
    # bucket-pruned parquet — cheap, and records what actually landed)
    written = spark.read.parquet(paths["extracted"]).filter(
        F.col("bucket").isin([int(b) for b in todo])
    ).select("conv_id", "turn_idx", "bucket")
    metrics = {r.partition_key: r for r in lin.stage_metrics(written, "bucket").collect()}
    entries = []
    for b in todo:
        m = metrics.get(b)
        entries.append(
            (b, 0, m.output_rows if m else 0, m.checksum if m else "0", t.wall_ms)
        )
    lin.record(spark, out_root, stage, entries, cfg.run_id)


# ---------------------------------------------------------------------------
# stage 2: link + canonicalize (global stage)
# ---------------------------------------------------------------------------
def _stage_components(spark, paths, cfg, resume) -> None:
    stage = "components"
    out_root = paths["lineage"].rsplit("/", 1)[0]
    if resume and lin.completed_keys(spark, out_root, stage):
        return
    with lin.StageTimer() as t:
        ments = extract_mod.mentions(spark.read.parquet(paths["extracted"]))
        # one LSH pass feeds both candidate generation and the drop audit
        bands = link_mod.lsh_bands(ments).persist()
        pairs = link_mod.candidate_pairs_from_bands(
            bands, cfg.band_cap, cfg.threshold
        )
        comp = mat_mod.norm_components(ments, pairs=pairs)
        m2nio.write_table(comp, paths["components"])
        dropped = link_mod.dropped_from_bands(bands, cfg.band_cap).count()
        bands.unpersist()
    written = spark.read.parquet(paths["components"])
    row = written.agg(
        F.count("*").alias("n"), lin.checksum_col(written).alias("c")
    ).collect()[0]
    lin.record(
        spark, out_root, stage,
        [(lin.STAGE_KEY, dropped, row.n, row.c or "0", t.wall_ms)],
        cfg.run_id,
    )


# ---------------------------------------------------------------------------
# stage 3: materialize (global stage)
# ---------------------------------------------------------------------------
def _stage_materialize(spark, paths, cfg, resume) -> None:
    stage = "materialize"
    out_root = paths["lineage"].rsplit("/", 1)[0]
    if resume and lin.completed_keys(spark, out_root, stage):
        return
    with lin.StageTimer() as t:
        extracted = spark.read.parquet(paths["extracted"])
        # NO persist on the mention stream: re-deriving it from the
        # (zstd-compressed, column-pruned) extraction table is parallel
        # CPU, while caching it is serial shared-disk IO — the one
        # resource that does not scale with executors.  The vocabulary-
        # sized norm->entity map IS persisted (tiny) and reused by every
        # consumer.
        ments = extract_mod.mentions(extracted)
        raw = extract_mod.raw_triples(extracted)
        comp = spark.read.parquet(paths["components"])
        canon = mat_mod.canonical_names(ments, comp)
        n2e = mat_mod.norm_to_entity(comp, canon).persist()
        n2e.count()  # materialize the (vocabulary-sized) map before reuse
        resolved = mat_mod.resolve_triples(raw, n2e=n2e)
        m2nio.write_table(mat_mod.nodes(ments, n2e=n2e), paths["nodes"])
        m2nio.write_table(
            mat_mod.edges(resolved, cfg.max_provenance), paths["edges"]
        )
        m2nio.write_table(mat_mod.triples(resolved), paths["triples"])
        n2e.unpersist()
    written = spark.read.parquet(paths["triples"])
    row = written.agg(
        F.count("*").alias("n"), lin.checksum_col(written).alias("c")
    ).collect()[0]
    lin.record(
        spark, out_root, stage,
        [(lin.STAGE_KEY, 0, row.n, row.c or "0", t.wall_ms)],
        cfg.run_id,
    )


def main(argv=None) -> None:
    from ..session import get_spark

    ap = argparse.ArgumentParser(description="transcript -> KG pipeline")
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salt", type=int, default=skew_mod.DEFAULT_SALT)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)
    spark = get_spark(
        master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    cfg = PipelineConfig(n_buckets=args.buckets, salt=args.salt)
    paths = run_pipeline(spark, args.input, args.out, cfg, resume=not args.no_resume)
    n = spark.read.parquet(paths["triples"]).count()
    print(f"pipeline complete: {n} distinct triples -> {args.out}")


if __name__ == "__main__":
    main()
