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


def test_quota_sample_zipf_straggler_is_rank_limited(spark):
    """The docstring's scale claim, made structural: on a corpus where
    ONE domain holds 90% of all rows, the per-domain window must carry
    Spark's WindowGroupLimit pushdown in BOTH Partial (map-side, before
    the shuffle) and Final mode — that is the mechanism that caps the
    hot domain's task at ~k rows per upstream partition instead of
    sorting 90% of the corpus in one task.  Plus exact counts + the
    pure-python replica staying correct under the skew."""
    import hashlib as _hl

    import pandas as pd

    n = 20_000
    langs = ["hot" if i % 10 != 9 else ["de", "fr", "zh"][i % 3]
             for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n), "lang": langs})
    )
    out = sampling.quota_sample(df, {"hot": 25, "de": 5}, seed=11)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit")[0] or \
        plan.count("WindowGroupLimit") >= 2, plan
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert len(by_lang["hot"]) == 25
    assert len(by_lang["de"]) == 5
    assert set(by_lang) == {"hot", "de"}
    hot_ids = [i for i in range(n) if langs[i] == "hot"]
    expect = sorted(sorted(
        hot_ids, key=lambda i: (_hl.md5(f"11:{i}".encode()).hexdigest(), i)
    )[:25])
    assert sorted(by_lang["hot"]) == expect
