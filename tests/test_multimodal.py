"""Multimodal plumbing: mapInPandas feature extraction over binary
columns (decode stubbed; Spark-side schema/batching real)."""

import numpy as np
import pytest

from mongo2neo_spark.operators import multimodal


def test_feature_extraction_deterministic(spark):
    media = multimodal.synthesize_media(spark, n=12, seed=42)
    a = {r.media_id: r.feature for r in multimodal.extract_features(media).collect()}
    b = {r.media_id: r.feature for r in multimodal.extract_features(media).collect()}
    assert a == b
    assert all(len(v) == multimodal.FEATURE_DIM for v in a.values())
    # unit vectors
    for v in a.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_n_bytes_and_kinds(spark):
    media = multimodal.synthesize_media(spark, n=9, seed=1)
    rows = multimodal.extract_features(media).collect()
    assert {r.kind for r in rows} == {"image", "audio", "video"}
    assert all(r.n_bytes > 0 for r in rows)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00\x01")


def test_same_bytes_same_features():
    a = multimodal.deterministic_fake_features(b"hello")
    b = multimodal.deterministic_fake_features(b"hello")
    c = multimodal.deterministic_fake_features(b"other")
    assert np.allclose(a, b)
    assert not np.allclose(a, c)


def test_media_features_chain_into_embedding_dedup(spark):
    """VERDICT item: the multimodal column must flow through the
    similarity stack — planted byte-duplicate payloads end up in the
    same embedding-dedup component."""
    from mongo2neo_spark import entry_oracle as eo
    from mongo2neo_spark.operators.multimodal import MEDIA_SCHEMA, extract_features
    from mongo2neo_spark.operators.similarity import embedding_dedup_components

    payloads = eo.media_payloads(n=24, n_unique=16)
    media = spark.createDataFrame(
        [(i, eo.MEDIA_KINDS[i % 3], bytearray(p),
          ("application/octet-stream", 64, 64, 1000))
         for i, p in enumerate(payloads)],
        MEDIA_SCHEMA,
    )
    comp = embedding_dedup_components(
        extract_features(media), id_col="media_id", vec_col="feature",
        threshold=0.9, n_planes=6, n_tables=8, dim=16,
    )
    got = {(r.id, r.component) for r in comp.collect()}
    vecs = eo.media_feature_vectors(payloads)
    exp = set(eo.embedding_cluster_rows(
        threshold=0.9, data=(list(range(24)), vecs)))
    assert got == exp
    # the 8 planted dups (16..23 reuse 0..7) share their source's component
    by_id = dict(got)
    for i in range(16, 24):
        assert by_id[i] == by_id[i - 16]
