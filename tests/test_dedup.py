"""Dedup operators: exact, MinHash-LSH near-dup, SimHash."""

import pandas as pd
import pytest

from mongo2neo_spark.operators import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_exact_dedup_keeps_min_id(spark):
    df = _docs(spark, ["aaa", "bbb", "aaa", "aaa", "ccc"])
    out = sorted(r.doc_id for r in dedup.exact_dedup(df).collect())
    assert out == [0, 1, 4]


def test_exact_dedup_hash_collision_does_not_merge(spark):
    """Two DISTINCT texts forced into one hash group (constant hash_fn)
    must both survive — the text column in the grouping key is the
    in-group equality verify that defuses 64-bit birthday collisions."""
    from pyspark.sql import functions as F

    df = _docs(spark, ["first document", "second document", "first document"])
    out = sorted(
        r.doc_id
        for r in dedup.exact_dedup(df, hash_fn=lambda c: F.lit(0)).collect()
    )
    assert out == [0, 1]  # true dup (id 2) gone; colliding distinct kept


def test_minhash_dedup_merges_near_duplicates(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " x1 x2"  # ~93% shingle overlap
    other = " ".join(f"zzz{i}" for i in range(60))
    df = _docs(spark, [base, near, other])
    comp = {r.id: r.component for r in
            dedup.minhash_dedup_components(df, threshold=0.7).collect()}
    assert comp[0] == comp[1]  # near-dups merged
    assert comp[2] != comp[0]  # unrelated doc stays apart
    kept = sorted(r.doc_id for r in dedup.minhash_dedup(df, threshold=0.7).collect())
    assert kept == [0, 2]


def test_minhash_dedup_identical_texts(spark):
    t = "alpha beta gamma delta epsilon zeta"
    df = _docs(spark, [t, t, t])
    kept = sorted(r.doc_id for r in dedup.minhash_dedup(df).collect())
    assert kept == [0]


def test_jvm_shingle_jaccard_equals_python_spec(spark):
    """The JVM-side verify (array_intersect/array_union over
    transform-built shingle arrays) must produce bit-identical jaccard
    values to the pure-Python spec, including the edge cases: empty
    text, whitespace-only, fewer-than-n tokens, runs of whitespace."""
    from pyspark.sql import functions as F

    texts = [
        "", "   ", "one", "one two", "one two three",
        "one two three four five", "one  two\tthree  four",
        "a b c d e f g", "a b c d e f g",
    ]
    pairs = [(a, b) for a in texts for b in texts]
    df = spark.createDataFrame(
        pd.DataFrame({"a_t": [p[0] for p in pairs],
                      "b_t": [p[1] for p in pairs]})
    )
    out = df.select(
        "a_t", "b_t",
        dedup.shingle_jaccard_col(F.col("a_t"), F.col("b_t")).alias("jvm"),
        dedup._shingle_jaccard_udf(F.col("a_t"), F.col("b_t")).alias("py"),
    ).collect()
    for r in out:
        sa, sb = dedup._word_shingles(r.a_t), dedup._word_shingles(r.b_t)
        u = len(sa | sb)
        spec = len(sa & sb) / u if u else 1.0
        assert r.jvm == r.py == spec, (r.a_t, r.b_t, r.jvm, r.py, spec)


def test_minhash_components_jvm_matches_python_verify(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " x1 x2"
    other = " ".join(f"zzz{i}" for i in range(60))
    df = _docs(spark, [base, near, other, base])
    jvm = sorted(tuple(r) for r in
                 dedup.minhash_dedup_components(df, verify="jvm").collect())
    py = sorted(tuple(r) for r in
                dedup.minhash_dedup_components(df, verify="python").collect())
    assert jvm == py


def test_simhash_components_cluster_hamming_close(spark):
    base = " ".join(f"w{i}" for i in range(200))
    near = " ".join(f"w{i}" for i in range(198)) + " q1 q2"
    far = " ".join(f"v{i}" for i in range(200))
    df = _docs(spark, [base, near, far])
    comp = {r.id: r.component for r in
            dedup.simhash_dedup_components(df, max_hamming=12).collect()}
    assert comp[0] == comp[1]
    assert comp[2] != comp[0]


def test_simhash_deterministic(spark):
    df = _docs(spark, ["hello world foo bar"])
    a = dedup.simhash_groups(df).collect()[0].simhash
    b = dedup.simhash_groups(df).collect()[0].simhash
    assert a == b
