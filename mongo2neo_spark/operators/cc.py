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

    for _ in range(max_iterations):
        # neighbor labels: for each edge src->dst, src's label flows to dst
        msgs = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        new_labels = (
            msgs.unionByName(labels.select("id", "label"))
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        new_labels = _materialize(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("id", F.col("label").alias("component"))


def _materialize(df: DataFrame) -> DataFrame:
    """Checkpoint (reliable if a checkpoint dir is set, else local) to cut
    the iterative plan's lineage, then persist for the next round."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        out = df.checkpoint(eager=True)
    else:
        out = df.localCheckpoint(eager=True)
    return out.persist()
