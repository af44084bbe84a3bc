"""Deterministic sampling: mixture rates, hash uniformity, shuffle order."""

import hashlib

import pandas as pd
import pytest

from mongo2neo_spark.operators import sampling


def _docs(spark, n=2000):
    langs = ["en", "de", "fr", "zh"]
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(n), "lang": [langs[i % 4] for i in range(n)]}
        )
    )


def _py_hash(doc_id, seed=42):
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % sampling.RESOLUTION


def test_sample_hash_matches_pure_python(spark):
    df = _docs(spark, 200)
    rows = df.select(
        "doc_id", sampling.sample_hash("doc_id", seed=7).alias("h")
    ).collect()
    for r in rows:
        assert r.h == _py_hash(r.doc_id, seed=7)


def test_mixture_rates_converge(spark):
    df = _docs(spark, 4000)  # 1000 per lang
    kept = sampling.mixture_sample(
        df, {"en": 1.0, "de": 0.5, "fr": 0.1}, seed=42
    ).groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in kept}
    assert by_lang["en"] == 1000
    assert 400 <= by_lang["de"] <= 600
    assert 60 <= by_lang["fr"] <= 150
    assert "zh" not in by_lang  # default_rate=0


def test_mixture_deterministic_and_stable_under_repartition(spark):
    df = _docs(spark, 1000)
    a = sorted(
        r.doc_id
        for r in sampling.mixture_sample(df, {"en": 0.3, "de": 0.7}).collect()
    )
    b = sorted(
        r.doc_id
        for r in sampling.mixture_sample(
            df.repartition(13), {"en": 0.3, "de": 0.7}
        ).collect()
    )
    assert a == b and len(a) > 0


def test_mixture_seed_changes_selection(spark):
    df = _docs(spark, 1000)
    a = {r.doc_id for r in sampling.mixture_sample(df, {"en": 0.5}, seed=1).collect()}
    b = {r.doc_id for r in sampling.mixture_sample(df, {"en": 0.5}, seed=2).collect()}
    assert a != b


def test_deterministic_shuffle_is_permutation(spark):
    df = _docs(spark, 500)
    out = sampling.deterministic_shuffle(df, seed=9).collect()
    assert sorted(r.doc_id for r in out) == list(range(500))
    # order matches the pure-python md5 sort and is not the identity
    ids = [r.doc_id for r in out]
    expect = sorted(
        range(500),
        key=lambda i: (hashlib.md5(f"9:{i}".encode()).hexdigest(), i),
    )
    assert ids == expect
    assert ids != list(range(500))


def test_deterministic_shuffle_partition_invariant(spark):
    df = _docs(spark, 300)
    a = [r.doc_id for r in sampling.deterministic_shuffle(df).collect()]
    b = [
        r.doc_id
        for r in sampling.deterministic_shuffle(df.repartition(17)).collect()
    ]
    assert a == b


def test_quota_sample_exact_counts(spark):
    df = _docs(spark, 4000)  # 1000 per lang
    out = sampling.quota_sample(
        df, {"en": 100, "de": 2000, "fr": 0}, seed=5
    )
    by_lang = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert by_lang.get("en") == 100
    assert by_lang.get("de") == 1000   # quota above domain size -> all
    assert "fr" not in by_lang
    assert "zh" not in by_lang         # default quota 0


def test_quota_sample_matches_pure_python_and_is_stable(spark):
    df = _docs(spark, 800)
    got = sorted(
        r.doc_id
        for r in sampling.quota_sample(df, {"en": 17}, seed=3).collect()
    )
    # pure-python replica: first 17 'en' ids by (md5('3:'+id), id)
    en_ids = [i for i in range(800) if i % 4 == 0]
    expect = sorted(sorted(
        en_ids, key=lambda i: (hashlib.md5(f"3:{i}".encode()).hexdigest(), i)
    )[:17])
    assert got == expect
    # partition-invariant
    got2 = sorted(
        r.doc_id
        for r in sampling.quota_sample(
            df.repartition(11), {"en": 17}, seed=3
        ).collect()
    )
    assert got2 == got
