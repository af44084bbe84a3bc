"""Materialize stage: resolve mentions/triples through the entity
components, elect canonical names, and build the node/edge tables with
set-semantics dedup — the Spark analogue of the reference's batched
Cypher MERGE upserts (SURVEY.md §2.3 J2, §2.4 A1/A2/A4, §2.5 W3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cc as cc_mod
from . import link as link_mod

MAX_PROVENANCE = 20


def norm_components(mentions: DataFrame,
                    band_cap: int | None = None,
                    threshold: float | None = None,
                    pairs: DataFrame | None = None,
                    norms: DataFrame | None = None) -> DataFrame:
    """Full linking + canonicalization: mentions -> (norm, entity_id:long).

    Vertices are the distinct norms (ids = xxhash64(norm)); edges are the
    scored LSH candidate pairs above threshold; components come from the
    iterative min-label CC.  Singleton norms keep their own id.
    Pass ``pairs`` to reuse precomputed candidate pairs and ``norms`` (a
    single-column distinct-norm frame, e.g. derived from the persisted
    LSH bands) to skip re-scanning the mention stream for the vertex set.
    """
    if pairs is None:
        kwargs = {}
        if band_cap is not None:
            kwargs["band_cap"] = band_cap
        if threshold is not None:
            kwargs["threshold"] = threshold
        pairs = link_mod.candidate_pairs(mentions, **kwargs)
    if norms is None:
        norms = mentions.select("norm").distinct()
    norms = norms.withColumn("id", F.xxhash64("norm"))
    edges = (
        pairs.select(
            F.xxhash64("a_norm").alias("src"), F.xxhash64("b_norm").alias("dst")
        )
    )
    comp = cc_mod.connected_components_auto(edges, norms.select("id"))
    return norms.join(comp, "id").select("norm", F.col("component").alias("entity_id"))


def mention_stats(mentions: DataFrame) -> DataFrame:
    """ONE pass over the mention stream -> vocabulary-sized rollup
    (norm, kind, cnt, first_ts, last_ts).

    Canonical-name election AND the node table both derive from this
    aggregate, so the (huge) mention stream is scanned/shuffled exactly
    once for both — everything downstream is vocabulary-sized.  Persist
    the result when feeding multiple consumers.
    """
    return mentions.groupBy("norm", "kind").agg(
        F.count("*").alias("cnt"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def canonical_names(mentions: DataFrame = None, components: DataFrame = None,
                    stats: DataFrame = None) -> DataFrame:
    """W3: per entity, the most frequent norm (by mention count), ties
    broken lexicographically -> (entity_id, entity) canonical name.

    Pass ``stats`` (a persisted :func:`mention_stats`) to skip the
    mention-stream scan."""
    if stats is None:
        stats = mention_stats(mentions)
    counts = stats.groupBy("norm").agg(F.sum("cnt").alias("cnt"))
    joined = counts.join(components, "norm")
    w = Window.partitionBy("entity_id").orderBy(F.desc("cnt"), F.asc("norm"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("entity_id", F.col("norm").alias("entity"))
    )


def norm_to_entity(components: DataFrame, canon: DataFrame) -> DataFrame:
    """norm -> canonical entity name (vocabulary-sized, broadcast-friendly)."""
    return components.join(canon, "entity_id").select("norm", "entity")


def resolve_triples(raw_triples: DataFrame, components: DataFrame = None,
                    canon: DataFrame = None,
                    n2e: DataFrame = None) -> DataFrame:
    """J2: rewrite raw (subj_norm, pred, obj_norm) to canonical entities.

    The norm->entity map is vocabulary-sized — broadcast both joins so
    the (huge) triple stream never shuffles here.  Pass a precomputed
    (ideally persisted) ``n2e`` to avoid rebuilding the map.
    """
    if n2e is None:
        n2e = norm_to_entity(components, canon)
    n2e = F.broadcast(n2e)
    return (
        raw_triples.join(
            n2e.withColumnsRenamed({"norm": "subj_norm", "entity": "subj"}),
            "subj_norm",
        )
        .join(
            n2e.withColumnsRenamed({"norm": "obj_norm", "entity": "obj"}),
            "obj_norm",
        )
        .select("conv_id", "turn_idx", "subj", "pred", "obj")
    )


def edges(resolved: DataFrame, max_provenance: int = MAX_PROVENANCE) -> DataFrame:
    """A1: weighted edges with bounded, deterministically-ordered provenance.

    One shuffle total: the row_number window hash-partitions by the edge
    key, and the groupBy below reuses that partitioning (Catalyst plans
    no second exchange).  Weight comes free as max(row_number), and
    collect_list only keeps rows at or under the provenance cap — so a
    hot triple never materializes an unbounded list on one task
    (collect-then-slice is a memory bomb at 10^12-turn scale).
    """
    keys = ["subj", "pred", "obj"]
    w = Window.partitionBy(*keys).orderBy("conv_id", "turn_idx")
    # ONE shuffle: the window's exchange hash-partitions by the edge key,
    # so the groupBy below is partition-local (Catalyst plans no second
    # exchange) — weight comes free as max(row_number) and collect_list
    # skips the null rows beyond the cap, so provenance stays bounded
    # without a separate filtered pass + join.
    return (
        resolved.withColumn("_rn", F.row_number().over(w))
        .groupBy(*keys)
        .agg(
            F.max("_rn").cast("long").alias("weight"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_rn") <= max_provenance,
                        F.struct("conv_id", "turn_idx"),
                    )
                )
            ).alias("provenance"),
        )
        .select(*keys, "weight", "provenance")
    )


def triples(resolved: DataFrame) -> DataFrame:
    """A4: the distinct (subj, pred, obj) set — the scored artifact."""
    return resolved.select("subj", "pred", "obj").dropDuplicates(
        ["subj", "pred", "obj"]
    )


def nodes(mentions: DataFrame = None, components: DataFrame = None,
          canon: DataFrame = None, n2e: DataFrame = None,
          stats: DataFrame = None) -> DataFrame:
    """A2 + W3: node table with mention stats and majority kind.

    Derives from the vocabulary-sized :func:`mention_stats` rollup (pass
    a persisted one via ``stats`` to skip the mention scan entirely):
    the (entity, kind) histogram, stats, and majority-kind election all
    run on tiny aggregates, never on the mention stream itself.
    """
    if n2e is None:
        n2e = norm_to_entity(components, canon)
    if stats is None:
        stats = mention_stats(mentions)
    m = stats.join(F.broadcast(n2e), "norm")
    by_kind = m.groupBy("entity", "kind").agg(
        F.sum("cnt").alias("kcnt"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
    )
    w = Window.partitionBy("entity").orderBy(F.desc("kcnt"), F.asc("kind"))
    return (
        by_kind.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_mentions", F.sum("kcnt").over(Window.partitionBy("entity")))
        .withColumn("first_ts", F.min("first_ts").over(Window.partitionBy("entity")))
        .withColumn("last_ts", F.max("last_ts").over(Window.partitionBy("entity")))
        .filter(F.col("_rn") == 1)
        .select("entity", "kind", "n_mentions", "first_ts", "last_ts")
    )
