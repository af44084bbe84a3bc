"""G1: union-find canonicalization via iterative connected components
over the mention graph (SURVEY.md §2.8) — pure DataFrame ops, no
GraphFrames, no RDDs.

Algorithm: hash-min label propagation.  Every vertex starts with its own
id as label; each round every vertex takes the min label among itself
and its neighbors; stop when no label changes.  Converges in O(graph
diameter) rounds — alias-cluster components are tiny (stars around a
canonical surface form), so diameter is small; a checkpoint every round
truncates the logical plan so analysis cost stays O(1) per round
(SURVEY.md §4 'iterative-plan lineage blowup').

Determinism: min() over int64 labels has a unique fixed point — the
component id is always the minimum vertex id in the component,
independent of partitioning, task order, or cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 50


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iterations: int = MAX_ITERATIONS
) -> DataFrame:
    """edges(src:long, dst:long) + vertices(id:long) -> (id, component).

    ``vertices`` must contain every id in ``edges`` (singletons allowed —
    they keep their own id as component).
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # cache the (static) adjacency once; labels change per round
    sym = sym.repartition("src").persist()
    labels = vertices.select(F.col("id"), F.col("id").alias("label"))
    labels = _materialize(labels)
    handle = labels  # the persisted DataFrame backing `labels`

    for _ in range(max_iterations):
        # neighbor labels: for each edge src->dst, src's label flows to dst.
        # The old label rides along (is_old tag) so one aggregation yields
        # BOTH the new min-label and the change indicator — a single
        # shuffle per round, no separate old-vs-new join.
        msgs = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label", F.lit(False).alias("is_old")
        )
        olds = labels.select("id", "label", F.lit(True).alias("is_old"))
        agg = (
            msgs.unionByName(olds)
            .groupBy("id")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("is_old"), F.col("label"))).alias("old_label"),
            )
        )
        agg = _materialize(agg)
        changed = (
            agg.filter(F.col("label") != F.col("old_label")).limit(1).count()
        )
        handle.unpersist()
        handle = agg
        labels = agg.select("id", "label")
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("id", F.col("label").alias("component"))


DRIVER_CC_MAX_EDGES = 5_000_000


def connected_components_auto(
    edges: DataFrame,
    vertices: DataFrame,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Size-adaptive CC — the AQE-broadcast-threshold idea applied to
    graph canonicalization.

    The mention graph's edge set is *vocabulary* metadata (distinct
    surface-form pairs), orders of magnitude smaller than the mention
    stream.  Below ``driver_max_edges`` it is collected and union-found
    on the driver in one pass (exact same min-id semantics, ~10 driver
    jobs cheaper); above it, the distributed iterative version runs.
    """
    edges = edges.persist()
    n_edges = edges.count()
    if n_edges > driver_max_edges:
        out = connected_components(edges, vertices)
        edges.unpersist()
        return out
    parent: dict = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    # collect, not toLocalIterator: the branch guarantees <= driver_max_edges
    # rows (~80 MB at the 5M default), and toLocalIterator pays one
    # sequential job per partition
    for row in edges.select("src", "dst").collect():
        ra, rb = find(row.src), find(row.dst)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    edges.unpersist()
    mapping = [(k, find(k)) for k in parent]
    spark = vertices.sparkSession
    if not mapping:
        return vertices.select("id", F.col("id").alias("component"))
    comp = spark.createDataFrame(mapping, "id long, component long")
    # vertices not touched by any edge are singletons
    return (
        vertices.join(F.broadcast(comp), "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )


def _materialize(df: DataFrame) -> DataFrame:
    """Checkpoint (reliable if a checkpoint dir is set, else local) to cut
    the iterative plan's lineage, then persist for the next round."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        out = df.checkpoint(eager=True)
    else:
        out = df.localCheckpoint(eager=True)
    return out.persist()
