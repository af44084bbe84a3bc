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
