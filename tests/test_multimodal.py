"""Multimodal plumbing: binary payload schema, mapInPandas batch shape,
header parsing, deterministic fake features, stub behavior."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import multimodal


def test_metadata_parses_real_headers(spark):
    media = multimodal.media_table(spark, n_rows=120)
    meta = multimodal.extract_metadata(media)
    rows = meta.collect()
    assert len(rows) == 120
    for r in rows:
        assert r["magic_ok"] is True
        assert 16 <= r["width"] <= 512
        assert 16 <= r["height"] <= 512
        assert r["payload_bytes"] >= 13 + 64


def test_features_deterministic_and_normalized(spark):
    media = multimodal.media_table(spark, n_rows=60).repartition(7)
    f1 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    assert f1 == f2  # partitioning-independent, deterministic
    assert len(f1) == 60
    for v in f1.values():
        assert len(v) == multimodal.FEATURE_DIM
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)


def test_resize_plan(spark):
    media = multimodal.media_table(spark, n_rows=80)
    plan = multimodal.resize_plan(media, max_side=128).collect()
    for r in plan:
        assert max(r["target_w"], r["target_h"]) <= 129  # ceil rounding slack
        if max(r["width"], r["height"]) <= 128:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])


def test_ppm_codec_round_trip():
    import numpy as np

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(9, 13, 3)).astype(np.uint8)
    assert (multimodal.decode_image(multimodal.encode_ppm(rgb)) == rgb).all()
    gray = rng.randint(0, 256, size=(5, 7)).astype(np.uint8)
    assert (multimodal.decode_image(multimodal.encode_ppm(gray)) == gray).all()
    # header comments + arbitrary whitespace are NetPBM-legal
    with_comment = b"P5\n# a comment\n 7\t5\n255\n" + gray.tobytes()
    assert (multimodal.decode_image(with_comment) == gray).all()


def test_real_decode_on_ppm_payloads(spark):
    media = multimodal.ppm_table(spark, n_rows=40).repartition(5)
    feats = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media, real_decode=True).collect()
    }
    assert len(feats) == 40
    for v in feats.values():
        assert len(v) == multimodal.FEATURE_DIM
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
    # deterministic across partitionings
    feats2 = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(
            multimodal.ppm_table(spark, n_rows=40).repartition(2), real_decode=True
        ).collect()
    }
    assert feats == feats2


def test_real_decode_rejects_compressed_formats(spark):
    media = multimodal.media_table(spark, n_rows=5)  # BMM1 magic, not NetPBM
    with pytest.raises(Exception, match="codec for magic"):
        multimodal.extract_features(media, real_decode=True).collect()
