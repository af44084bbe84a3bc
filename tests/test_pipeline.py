"""End-to-end pipeline: P/R vs oracle, permutation/salt invariance,
idempotent resume, lineage contents."""

import pytest

from mongo2neo_spark import fixtures, oracle
from mongo2neo_spark.plans import lineage as lin
from mongo2neo_spark.plans.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def pipeline_out(spark, small_rows, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe")
    messy = fixtures.with_duplicates_and_shuffle(small_rows)
    spark.createDataFrame(fixtures.turns_to_pandas(messy)).write.parquet(
        str(tmp / "in")
    )
    cfg = PipelineConfig(n_buckets=8, run_id="r1")
    paths = run_pipeline(spark, str(tmp / "in"), str(tmp / "out"), cfg)
    return tmp, paths


def _triples(spark, paths):
    return {tuple(r) for r in spark.read.parquet(paths["triples"]).collect()}


def test_precision_recall_vs_oracle(spark, small_rows, pipeline_out):
    _, paths = pipeline_out
    got = _triples(spark, paths)
    ref = oracle.pipeline_triples(small_rows)
    p, r = oracle.precision_recall(got, ref)
    assert (p, r) == (1.0, 1.0)  # contract floor is 0.95; shared rules give 1.0


def test_resume_is_noop(spark, pipeline_out):
    tmp, paths = pipeline_out
    before = _triples(spark, paths)
    lin_before = spark.read.parquet(paths["lineage"]).count()
    run_pipeline(
        spark, str(tmp / "in"), str(tmp / "out"),
        PipelineConfig(n_buckets=8, run_id="r2"),
    )
    assert _triples(spark, paths) == before
    # no new lineage rows: every partition was already recorded
    assert spark.read.parquet(paths["lineage"]).count() == lin_before


def test_lineage_shape(spark, pipeline_out):
    _, paths = pipeline_out
    lin_df = spark.read.parquet(paths["lineage"])
    stages = {r.stage for r in lin_df.select("stage").distinct().collect()}
    assert stages == {"extract", "components", "materialize"}
    # extraction is bucket-granular
    assert lin_df.filter("stage = 'extract'").count() == 8


def test_salt_invariance(spark, small_rows):
    """K1 losslessness: the salted repartition changes only the physical
    distribution, never the triple set — identical output at SALT∈{1,8}
    through the composed operator path.  (The pipeline itself now gets
    the same spreading effect from fine-grained keys + AQE rebalance;
    salted_repartition remains the manual K1 operator for conv-hot UDF
    stages.)"""
    from mongo2neo_spark.operators import extract, ingest, materialize, skew

    df = spark.createDataFrame(fixtures.turns_to_pandas(small_rows))
    outs = []
    for salt in (1, 8):
        turns = skew.salted_repartition(ingest.ingest(df), 8, salt=salt)
        ex = extract.extract(turns)
        ments = extract.mentions(ex)
        comp = materialize.norm_components(ments)
        canon = materialize.canonical_names(ments, comp)
        t = materialize.triples(
            materialize.resolve_triples(extract.raw_triples(ex), comp, canon)
        )
        outs.append({tuple(r) for r in t.collect()})
    assert outs[0] == outs[1]


def test_nodes_and_edges_consistent(spark, pipeline_out):
    _, paths = pipeline_out
    nodes = spark.read.parquet(paths["nodes"])
    edges = spark.read.parquet(paths["edges"])
    node_names = {r.entity for r in nodes.collect()}
    for r in edges.collect():
        assert r.subj in node_names and r.obj in node_names
        assert r.weight >= 1 and len(r.provenance) >= 1


def test_driver_link_venue_matches_distributed(spark, small_rows, tmp_path):
    """The size-adaptive driver-side linking (driver_link_max) and the
    distributed LSH/CC path must produce identical components, triples,
    and lineage drop audits — same shared hashing/rules code, different
    venue only."""
    from mongo2neo_spark import fixtures

    df = spark.createDataFrame(fixtures.turns_to_pandas(small_rows))
    df.write.parquet(str(tmp_path / "in"))
    pa = run_pipeline(
        spark, str(tmp_path / "in"), str(tmp_path / "drv"),
        PipelineConfig(n_buckets=4, run_id="drv"), resume=False,
    )
    pb = run_pipeline(
        spark, str(tmp_path / "in"), str(tmp_path / "dist"),
        PipelineConfig(n_buckets=4, run_id="dist", driver_link_max=0),
        resume=False,
    )
    comp_a = sorted(map(tuple, spark.read.parquet(pa["components"]).collect()))
    comp_b = sorted(map(tuple, spark.read.parquet(pb["components"]).collect()))
    assert comp_a == comp_b and len(comp_a) > 0
    tri_a = sorted(
        (r.subj, r.pred, r.obj)
        for r in spark.read.parquet(pa["triples"]).collect()
    )
    tri_b = sorted(
        (r.subj, r.pred, r.obj)
        for r in spark.read.parquet(pb["triples"]).collect()
    )
    assert tri_a == tri_b
