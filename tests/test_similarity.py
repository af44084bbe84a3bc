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
