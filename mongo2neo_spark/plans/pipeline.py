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
from ..functions import probe as probe_mod
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
    band_cap: int = hashing.BAND_CAP
    threshold: float = rules.LINK_THRESHOLD
    max_provenance: int = mat_mod.MAX_PROVENANCE
    # P3 strategy: "shuffle" (classic full-row exchange), "adaptive"
    # (narrow dup-scan + anti/semi join — the text stream never shuffles
    # when duplicates are absent), or "auto" (cost-based: adaptive pays
    # when the text payload is wide relative to the dedup key, measured
    # from a row sample; both strategies produce identical rows)
    dedup_strategy: str = "auto"
    # linking venue: norm vocabularies up to this size are linked on the
    # driver (link.driver_link_components — bit-identical, same shared
    # hashing/rules code) instead of paying 3 UDF-stage fixed costs on a
    # vocabulary-sized problem; 0 forces the distributed path
    driver_link_max: int = 100_000
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
    todo_ints = [int(b) for b in todo]

    with lin.StageTimer() as t:
        raw = ingest_mod.clean(m2nio.read_transcripts(spark, input_source))
        if len(todo) < cfg.n_buckets:
            raw = raw.filter(
                skew_mod.bucket_of(F.col("conv_id"), cfg.n_buckets).isin(todo_ints)
            )
        # P3 dedup, cost-based:
        # - "adaptive": a narrow column-pruned aggregate finds the (rare)
        #   duplicated keys; the text stream is anti-joined against that
        #   tiny set (AQE broadcast) and NEVER shuffles when duplicates
        #   are absent — the win grows with text width (real transcripts
        #   are KBs/turn; the dup-scan moves only the ~30-byte keys).
        # - "shuffle": the classic full-row exchange + partition-local
        #   min(struct) aggregate — cheaper when rows are barely wider
        #   than their keys, because adaptive's dup-scan would move
        #   almost as many bytes and still pay the extra pass.
        # Both yield identical rows (tests assert it); "auto" picks by
        # the sampled text:key byte ratio.  Either way (conv_id,
        # turn_idx) is fine-grained, so a hot conversation spreads
        # across partitions — the K1 salting effect without a dedicated
        # salt exchange.
        strategy = cfg.dedup_strategy
        if strategy == "auto":
            s = raw.limit(20_000).agg(
                F.avg(F.length("text")).alias("t"),
                F.avg(F.length("conv_id")).alias("k"),
            ).first()
            wide = s.t is not None and s.t > 4.0 * (float(s.k or 0) + 8.0)
            strategy = "adaptive" if wide else "shuffle"
        if strategy == "adaptive":
            turns = ingest_mod.dedup_adaptive(raw)
        else:
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
            turns = ingest_mod.dedup(
                raw.repartition(n_part, F.col("conv_id"), F.col("turn_idx"))
            )
        # ONE write of the combined extraction table (flat mention/triple
        # arrays, one row per turn); mentions/raw_triples are derived
        # columnar at read time by later stages.  One UDF pass + one
        # full-data write — cheaper than materializing (or caching) two
        # denormalized tables, at sandbox and at 100 TB alike.
        ex = extract_mod.extract(turns).withColumn(
            "bucket", skew_mod.bucket_of(F.col("conv_id"), cfg.n_buckets)
        )
        # write-clustering shuffle: NARROW — extraction output carries
        # mention/triple arrays, not the text, so this exchange is a
        # fraction of the input bytes.  REBALANCE (not repartition): the
        # work downstream of this exchange is byte-proportional (parquet
        # encoding + IO), exactly what AQE's byte-based sizing gets
        # right — it coalesces small buckets into few files at sandbox
        # scale AND splits a hot bucket across several write tasks at
        # 100 TB (the salt trick, done by the optimizer from runtime
        # sizes).  Plain repartition-by-column is never AQE-resized.
        ex = ex.hint("rebalance", "bucket")
        # per-bucket lineage metrics ride the write job via observe() —
        # no second scan of the (largest) table just to count it.
        obs, ex = lin.observe_bucket_metrics(
            ex, todo_ints, ["conv_id", "turn_idx", "bucket"]
        )
        # dynamic partition overwrite = idempotent per-bucket replace (S2);
        # small row groups keep the table splittable for the three
        # downstream scans regardless of how few files AQE produces
        m2nio.write_table(
            ex, paths["extracted"], partition_by=["bucket"],
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
# stage 2: link + canonicalize (global stage)
# ---------------------------------------------------------------------------
def _stage_components(spark, paths, cfg, resume) -> None:
    stage = "components"
    out_root = paths["lineage"].rsplit("/", 1)[0]
    if resume and lin.completed_keys(spark, out_root, stage):
        return
    with lin.StageTimer() as t:
        ments = extract_mod.mentions(spark.read.parquet(paths["extracted"]))
        # venue choice: LIMIT max+1 + collect is ONE job — if it comes
        # back short we already hold the complete vocabulary and the
        # whole linking stage (3 UDF passes + CC rounds of fixed cost)
        # collapses to driver arithmetic over the same shared functions
        sample = None
        if cfg.driver_link_max > 0:
            nid = ments.select("norm").distinct().withColumn(
                "id", F.xxhash64("norm")
            )
            sample = probe_mod.driver_probe(nid, cfg.driver_link_max)
        if sample is not None:
            comp_rows, dropped = link_mod.driver_link_components(
                [(r.norm, r.id) for r in sample], cfg.band_cap, cfg.threshold
            )
            import pandas as pd

            comp = spark.createDataFrame(
                pd.DataFrame(comp_rows, columns=["norm", "entity_id"])
                if comp_rows
                else pd.DataFrame({"norm": pd.Series(dtype="object"),
                                   "entity_id": pd.Series(dtype="int64")})
            )
            obs, comp = lin.observe_table_metrics(comp)
            m2nio.write_table(comp, paths["components"])
        else:
            # one LSH pass feeds both candidates and the drop audit
            bands = link_mod.lsh_bands(ments).persist()
            pairs = link_mod.candidate_pairs_from_bands(
                bands, cfg.band_cap, cfg.threshold
            )
            # vertex set from the persisted bands (every norm has >=1
            # band key), not a second scan of the extraction table
            comp = mat_mod.norm_components(
                ments, pairs=pairs, norms=bands.select("norm").distinct()
            )
            obs, comp = lin.observe_table_metrics(comp)
            m2nio.write_table(comp, paths["components"])
            dropped = link_mod.dropped_from_bands(bands, cfg.band_cap).count()
            bands.unpersist()
    got = obs.get
    lin.record(
        spark, out_root, stage,
        [(lin.STAGE_KEY, dropped, int(got["n"]),
          str(got["c"]) if got["c"] is not None else "0", t.wall_ms)],
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
        # The (huge) mention stream is scanned ONCE, straight into the
        # vocabulary-sized mention_stats rollup; canonical naming, the
        # norm->entity map, and the node table all run on that tiny
        # persisted aggregate.  The triple stream is NOT persisted:
        # re-deriving it per consumer (column-pruned scan + broadcast
        # joins) is parallel CPU, while the columnar cache build is
        # measurably the opposite — A/B at 27M turns: edges+triples
        # take 24.7s at 4N with a MEMORY_AND_DISK persist vs 12.7s
        # recomputing (and 34.4 vs 29.7 at N).  Cache only what is
        # vocabulary-sized.
        stats = mat_mod.mention_stats(extract_mod.mentions(extracted)).persist()
        comp = spark.read.parquet(paths["components"])
        canon = mat_mod.canonical_names(components=comp, stats=stats)
        n2e = mat_mod.norm_to_entity(comp, canon).persist()
        n2e.count()  # materialize the (vocabulary-sized) map before reuse

        def resolved():
            return mat_mod.resolve_triples(
                extract_mod.raw_triples(extracted), n2e=n2e
            )

        m2nio.write_table(mat_mod.nodes(stats=stats, n2e=n2e), paths["nodes"])
        m2nio.write_table(
            mat_mod.edges(resolved(), cfg.max_provenance), paths["edges"]
        )
        # the edges table already has EXACTLY one row per distinct
        # (subj, pred, obj) — the triples set is a projection of it, so
        # derive it from the (small) written edges table instead of
        # re-deriving + re-shuffling the full resolved stream a second
        # time for a distinct
        obs, triples_df = lin.observe_table_metrics(
            spark.read.parquet(paths["edges"]).select("subj", "pred", "obj")
        )
        m2nio.write_table(triples_df, paths["triples"])
        stats.unpersist()
        n2e.unpersist()
    got = obs.get
    lin.record(
        spark, out_root, stage,
        [(lin.STAGE_KEY, 0, int(got["n"]),
          str(got["c"]) if got["c"] is not None else "0", t.wall_ms)],
        cfg.run_id,
    )


def main(argv=None) -> None:
    from ..session import get_spark

    ap = argparse.ArgumentParser(description="transcript -> KG pipeline")
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)
    spark = get_spark(
        master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    cfg = PipelineConfig(n_buckets=args.buckets)
    paths = run_pipeline(spark, args.input, args.out, cfg, resume=not args.no_resume)
    n = spark.read.parquet(paths["triples"]).count()
    print(f"pipeline complete: {n} distinct triples -> {args.out}")


if __name__ == "__main__":
    main()
