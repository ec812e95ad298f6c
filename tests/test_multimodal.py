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


def test_real_decode_is_stubbed(spark):
    media = multimodal.media_table(spark, n_rows=5)
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, real_decode=True)
