"""Similarity search: brute-force exactness vs numpy, LSH approximation
properties."""

import numpy as np
import pandas as pd
import pytest

from mongo2neo_spark.operators import similarity


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(50), "embedding": [list(map(float, v)) for v in vecs]}
    )
    return spark.createDataFrame(pdf), vecs


def test_brute_force_matches_numpy(spark, emb_df):
    df, vecs = emb_df
    out = similarity.brute_force_topk(df, df.filter("vec_id < 3"), k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos))
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    for q in range(3):
        cos = (v @ v[q]) / (norms * norms[q])
        order = sorted(
            (i for i in range(50) if i != q), key=lambda i: (-cos[i], i)
        )[:5]
        mine = sorted(got[q])
        assert [n for _, n, _ in mine] == order
        for (_, n, c) in mine:
            assert c == pytest.approx(cos[n], abs=1e-9)


def test_lsh_results_subset_of_bruteforce_scores(spark, emb_df):
    df, vecs = emb_df
    out = similarity.lsh_bucketed_topk(
        df, df.filter("vec_id < 3"), k=5, dim=16, n_planes=4
    ).collect()
    # every returned neighbor must share the query's bucket -> ranks are
    # contiguous from 1 and scores match exact cosine
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
        cos = float(v[r.query_id] @ v[r.neighbor_id] / (norms[r.query_id] * norms[r.neighbor_id]))
        assert r.cos == pytest.approx(cos, abs=1e-9)
    for q, rows in per_q.items():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))


def test_multi_table_recall_beats_single_table(spark, emb_df):
    """More hash tables -> monotonically growing candidate union; with
    enough tables the measured recall must clear 0.9 on this fixture."""
    df, _ = emb_df
    rec1 = similarity.ann_recall(
        df, df.filter("vec_id < 5"), k=5, n_planes=4, n_tables=1
    ).collect()
    rec16 = similarity.ann_recall(
        df, df.filter("vec_id < 5"), k=5, n_planes=4, n_tables=16
    ).collect()
    mean1 = sum(r.recall for r in rec1) / len(rec1)
    mean16 = sum(r.recall for r in rec16) / len(rec16)
    assert mean16 >= mean1
    assert mean16 >= 0.9


def test_infer_dim(spark, emb_df):
    df, vecs = emb_df
    assert similarity.infer_dim(df) == vecs.shape[1]


def test_ivf_recall_perfect_on_clustered_data(spark):
    """When embeddings actually cluster (the real-encoder case), IVF
    with probe=1 finds every true neighbor: each cluster maps onto one
    centroid cell."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((3, 16)) * 10
    vecs, ids = [], []
    for i in range(60):
        c = centers[i % 3]
        vecs.append([float(x) for x in c + rng.standard_normal(16) * 0.05])
        ids.append(i)
    df = spark.createDataFrame(pd.DataFrame({"vec_id": ids, "embedding": vecs}))
    rec = similarity.ivf_recall(
        df, df.filter("vec_id < 6"), k=5, n_centroids=3, n_probe=1
    ).collect()
    assert all(r.recall == 1.0 for r in rec)


def test_ivf_results_are_exact_cosines(spark, emb_df):
    df, vecs = emb_df
    out = similarity.ivf_topk(
        df, df.filter("vec_id < 3"), k=5, n_centroids=4, n_probe=2
    ).collect()
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    assert out
    for r in out:
        cos = float(v[r.query_id] @ v[r.neighbor_id]
                    / (norms[r.query_id] * norms[r.neighbor_id]))
        assert r.cos == pytest.approx(cos, abs=1e-9)
        assert r.query_id != r.neighbor_id


def test_embedding_dedup_clusters_near_duplicates(spark):
    """Identical and nearly-identical vectors must cluster (same bucket
    in every table, cosine ~1); orthogonal-ish vectors must not."""
    rng = np.random.default_rng(9)
    base = rng.standard_normal(16)
    near = base + rng.standard_normal(16) * 1e-3
    far = rng.standard_normal(16)
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                [float(x) for x in base],
                [float(x) for x in base],
                [float(x) for x in near],
                [float(x) for x in far],
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    comp = {
        r.id: r.component
        for r in similarity.embedding_dedup_components(
            df, threshold=0.99
        ).collect()
    }
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == 3


def test_self_excluded(spark, emb_df):
    df, _ = emb_df
    out = similarity.brute_force_topk(df, df.filter("vec_id < 3"), k=5).collect()
    assert all(r.query_id != r.neighbor_id for r in out)


def test_lsh_indexed_probe_matches_direct_path(spark, emb_df, tmp_path):
    """build_lsh_bucket_index persisted to parquet + index= probe must
    return EXACTLY the direct path's rows (same plane family, same
    cosines) — the build-once/probe-many service contract, including
    the bkey IN-filter pruning the driver query venue adds."""
    df, _ = emb_df
    idx_path = str(tmp_path / "lsh_idx")
    similarity.build_lsh_bucket_index(
        df, n_planes=4, n_tables=6
    ).write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    q = df.filter("vec_id < 4")
    direct = sorted(
        tuple(r)
        for r in similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=4, n_tables=6
        ).collect()
    )
    probed = sorted(
        tuple(r)
        for r in similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=4, n_tables=6, index=idx
        ).collect()
    )
    assert probed == direct and len(direct) > 0


def test_ivf_indexed_probe_matches_direct_path(spark, emb_df, tmp_path):
    df, _ = emb_df
    cents = similarity.train_ivf_centroids(df, n_centroids=4)
    idx_path = str(tmp_path / "ivf_idx")
    similarity.build_ivf_cell_index(df, cents).write.mode(
        "overwrite"
    ).parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    q = df.filter("vec_id < 4")
    direct = sorted(
        tuple(r)
        for r in similarity.ivf_topk(
            df, q, k=5, centroids=cents, n_probe=2
        ).collect()
    )
    probed = sorted(
        tuple(r)
        for r in similarity.ivf_topk(
            df, q, k=5, centroids=cents, n_probe=2, index=idx
        ).collect()
    )
    assert probed == direct and len(direct) > 0


def test_write_index_writers_match_build_layout(spark, emb_df, tmp_path):
    """write_lsh_bucket_index / write_ivf_cell_index (the persist-once
    DISK_ONLY writers the scaling job uses) must produce indexes whose
    probes return exactly the direct path's rows, and the parquet must
    be key-sorted within files (the row-group pruning precondition)."""
    from pyspark.sql import functions as F

    df, _ = emb_df
    lsh_path = str(tmp_path / "lsh_w")
    similarity.write_lsh_bucket_index(df, lsh_path, n_planes=4, n_tables=6)
    idx = spark.read.parquet(lsh_path)
    q = df.filter("vec_id < 4")
    direct = sorted(
        tuple(r) for r in similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=4, n_tables=6
        ).collect()
    )
    probed = sorted(
        tuple(r) for r in similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=4, n_tables=6, index=idx
        ).collect()
    )
    assert probed == direct and len(direct) > 0
    # sorted-within-file: bkey must be non-decreasing inside each file
    rows = idx.select(
        F.input_file_name().alias("f"), "bkey",
        F.monotonically_increasing_id().alias("ord"),
    ).orderBy("ord").collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.f, []).append(r.bkey)
    assert all(ks == sorted(ks) for ks in by_file.values())

    cents = similarity.train_ivf_centroids(df, n_centroids=4)
    ivf_path = str(tmp_path / "ivf_w")
    similarity.write_ivf_cell_index(df, cents, ivf_path)
    ivf_idx = spark.read.parquet(ivf_path)
    d2 = sorted(
        tuple(r) for r in similarity.ivf_topk(
            df, q, k=5, centroids=cents, n_probe=2
        ).collect()
    )
    p2 = sorted(
        tuple(r) for r in similarity.ivf_topk(
            df, q, k=5, centroids=cents, n_probe=2, index=ivf_idx
        ).collect()
    )
    assert p2 == d2 and len(d2) > 0


def test_index_meta_roundtrip_path_probe(spark, emb_df, tmp_path):
    """Path-form index= loads the metadata sidecar; probing by path with
    matching params returns exactly the direct rows, and the IVF path
    probe needs NO explicit centroids — the quantizer rides the index
    (json float round-trip is exact, so cosines are bit-identical)."""
    df, _ = emb_df
    q = df.filter("vec_id < 4")

    lsh_path = str(tmp_path / "lsh_m")
    similarity.write_lsh_bucket_index(df, lsh_path, n_planes=4, n_tables=6)
    meta = similarity.read_index_meta(lsh_path)
    assert meta == {"kind": "lsh", "n_planes": 4, "n_tables": 6,
                    "dim": 16, "plane_seed": similarity._PLANE_SEED}
    direct = sorted(
        tuple(r) for r in similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=4, n_tables=6
        ).collect()
    )
    probed = sorted(
        tuple(r) for r in similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=4, n_tables=6, index=lsh_path
        ).collect()
    )
    assert probed == direct and len(direct) > 0

    cents = similarity.train_ivf_centroids(df, n_centroids=4)
    ivf_path = str(tmp_path / "ivf_m")
    similarity.write_ivf_cell_index(df, cents, ivf_path)
    _, loaded, m2 = similarity.read_ivf_cell_index(spark, ivf_path)
    assert (loaded == cents).all() and m2["n_centroids"] == 4
    d2 = sorted(
        tuple(r) for r in similarity.ivf_topk(
            df, q, k=5, centroids=cents, n_probe=2
        ).collect()
    )
    p2 = sorted(
        tuple(r) for r in similarity.ivf_topk(
            df, q, k=5, n_probe=2, index=ivf_path  # no centroids passed
        ).collect()
    )
    assert p2 == d2 and len(d2) > 0


def test_mismatched_index_params_fail_loudly(spark, emb_df, tmp_path):
    """Probing a persisted index with a different plane family or a
    different quantizer must raise, never silently return wrong
    neighbors (the ADVICE medium finding)."""
    import numpy as np
    import pytest

    df, _ = emb_df
    q = df.filter("vec_id < 2")

    lsh_path = str(tmp_path / "lsh_bad")
    similarity.write_lsh_bucket_index(df, lsh_path, n_planes=4, n_tables=6)
    with pytest.raises(ValueError, match="n_planes"):
        similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=3, n_tables=6, index=lsh_path
        )
    with pytest.raises(ValueError, match="n_tables"):
        similarity.lsh_bucketed_topk(
            df, q, k=5, n_planes=4, n_tables=8, index=lsh_path
        )

    cents = similarity.train_ivf_centroids(df, n_centroids=4)
    ivf_path = str(tmp_path / "ivf_bad")
    similarity.write_ivf_cell_index(df, cents, ivf_path)
    other = np.asarray(cents) + 0.5
    with pytest.raises(ValueError, match="centroid_hash"):
        similarity.ivf_topk(
            df, q, k=5, centroids=other, n_probe=2, index=ivf_path
        )
    # a probe pointed at the wrong index KIND fails too
    with pytest.raises(ValueError, match="lsh"):
        similarity.ivf_topk(df, q, k=5, n_probe=2, index=lsh_path)


def test_empty_queries_with_index_returns_empty(spark, emb_df, tmp_path):
    """index= + an empty query frame returns an empty result (matching
    the direct path, which infers dim from the corpus) instead of
    raising from infer_dim(queries)."""
    df, _ = emb_df
    none = df.filter("vec_id < 0")

    lsh_path = str(tmp_path / "lsh_e")
    similarity.write_lsh_bucket_index(df, lsh_path, n_planes=4, n_tables=6)
    assert similarity.lsh_bucketed_topk(
        df, none, k=5, n_planes=4, n_tables=6, index=lsh_path
    ).count() == 0
    # DataFrame-form index (no sidecar): dim falls back to index rows
    assert similarity.lsh_bucketed_topk(
        df, none, k=5, n_planes=4, n_tables=6,
        index=spark.read.parquet(lsh_path),
    ).count() == 0

    cents = similarity.train_ivf_centroids(df, n_centroids=4)
    ivf_path = str(tmp_path / "ivf_e")
    similarity.write_ivf_cell_index(df, cents, ivf_path)
    assert similarity.ivf_topk(
        df, none, k=5, n_probe=2, index=ivf_path
    ).count() == 0
    # direct paths stay consistent
    assert similarity.brute_force_topk(df, none, k=5).count() == 0


def test_unroll_strategies_bit_identical(spark, emb_df):
    """The size-adaptive cosine unroll is an expression-strategy choice
    only: forced-unrolled and forced-fold runs return bit-identical
    rows on every path (the IEEE fold-order-preservation contract)."""
    df, _ = emb_df
    q = df.filter("vec_id < 3")
    for fn, kw in (
        (similarity.brute_force_topk, {}),
        (similarity.lsh_bucketed_topk, {"n_planes": 4, "n_tables": 6}),
        (similarity.ivf_topk, {"n_centroids": 4, "n_probe": 2}),
    ):
        a = sorted(tuple(r) for r in fn(df, q, k=5, unroll=True, **kw).collect())
        b = sorted(tuple(r) for r in fn(df, q, k=5, unroll=False, **kw).collect())
        assert a == b and len(a) > 0


def test_float32_index_storage_bit_identical_to_double(spark, tmp_path):
    """Round-6 at-scale fix contract: indexes store ``_cv`` in the
    SOURCE element type (a float32 corpus must NOT be widened to
    double before the xn_tables explode — it doubled every byte the
    12M-vector build shuffled/sorted/wrote), and probes cast to double
    AFTER the pruned scan, so every probe row is bit-identical to
    building from the same values pre-cast to double."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": list(vecs)})
    f32 = spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>"
    )
    assert isinstance(f32.schema["embedding"].dataType.elementType,
                      T.FloatType)
    f64 = f32.select("vec_id",
                     F.col("embedding").cast("array<double>")
                     .alias("embedding"))
    q32, q64 = f32.filter("vec_id < 4"), f64.filter("vec_id < 4")

    p32, p64 = str(tmp_path / "lsh32"), str(tmp_path / "lsh64")
    similarity.write_lsh_bucket_index(f32, p32, n_planes=4, n_tables=6)
    similarity.write_lsh_bucket_index(f64, p64, n_planes=4, n_tables=6)
    i32, i64 = spark.read.parquet(p32), spark.read.parquet(p64)
    # source dtype preserved in the persisted layout
    assert isinstance(i32.schema["_cv"].dataType.elementType, T.FloatType)
    assert isinstance(i64.schema["_cv"].dataType.elementType, T.DoubleType)
    r32 = sorted(tuple(r) for r in similarity.lsh_bucketed_topk(
        f32, q32, k=5, n_planes=4, n_tables=6, index=i32).collect())
    r64 = sorted(tuple(r) for r in similarity.lsh_bucketed_topk(
        f64, q64, k=5, n_planes=4, n_tables=6, index=i64).collect())
    assert r32 == r64 and len(r32) > 0  # scores bit-identical, not approx

    # IVF: quantizer trained once, both storage dtypes probe identically
    cents = similarity.train_ivf_centroids(f64, n_centroids=4)
    v32, v64 = str(tmp_path / "ivf32"), str(tmp_path / "ivf64")
    similarity.write_ivf_cell_index(f32, cents, v32)
    similarity.write_ivf_cell_index(f64, cents, v64)
    j32 = spark.read.parquet(v32)
    assert isinstance(j32.schema["_cv"].dataType.elementType, T.FloatType)
    s32 = sorted(tuple(r) for r in similarity.ivf_topk(
        f32, q32, k=5, centroids=cents, n_probe=2, index=j32).collect())
    s64 = sorted(tuple(r) for r in similarity.ivf_topk(
        f64, q64, k=5, centroids=cents, n_probe=2,
        index=spark.read.parquet(v64)).collect())
    assert s32 == s64 and len(s32) > 0
