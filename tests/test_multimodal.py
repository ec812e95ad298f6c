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


def test_wav_codec_round_trip():
    import numpy as np

    rng = np.random.RandomState(5)
    samples = rng.randint(-32768, 32768, size=333).astype(np.int16)
    out, rate = multimodal.decode_audio(multimodal.encode_wav(samples, 16000))
    assert rate == 16000
    assert (out == samples).all()
    # chunk walking: a LIST chunk (odd size → even-padded) before data
    wav = multimodal.encode_wav(samples, 8000)
    injected = (
        wav[:12]
        + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
        + wav[12:]
    )
    out2, rate2 = multimodal.decode_audio(injected)
    assert rate2 == 8000 and (out2 == samples).all()
    # non-RIFF magic (e.g. an MP3 frame header) must raise with guidance
    with pytest.raises(NotImplementedError, match="codec for magic"):
        multimodal.decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    # non-PCM fmt code must raise, not misdecode
    bad = bytearray(wav)
    bad[20:22] = (85).to_bytes(2, "little")  # MP3-in-WAV fmt code
    with pytest.raises(NotImplementedError, match="only PCM16 mono"):
        multimodal.decode_audio(bytes(bad))


def test_audio_features_real_decode(spark):
    media = multimodal.wav_table(spark, n_rows=30).repartition(4)
    feats = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_audio_features(media).collect()
    }
    assert len(feats) == 30
    for v in feats.values():
        assert len(v) == multimodal.FEATURE_DIM
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
    # features discriminate across rows (different pitch/length)
    assert len({tuple(round(x, 9) for x in v) for v in feats.values()}) == 30
    feats2 = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_audio_features(
            multimodal.wav_table(spark, n_rows=30).repartition(11)
        ).collect()
    }
    assert feats == feats2  # deterministic across partitionings


def test_video_codec_round_trip():
    import numpy as np

    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, size=(6, 4, 5, 3)).astype(np.uint8)
    out, fps = multimodal.decode_video(multimodal.encode_rawvideo(frames, fps=24))
    assert fps == 24
    assert (out == frames).all()
    with pytest.raises(NotImplementedError, match="codec for magic"):
        multimodal.decode_video(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32)


def test_frame_sampling_fan_out(spark):
    import numpy as np

    media = multimodal.video_table(spark, n_rows=20).repartition(3)
    stride = 4
    sampled = multimodal.sample_frames(media, stride=stride).collect()
    # expected row count: ceil(n_frames / stride) per clip, computed locally
    rng = np.random.RandomState(13)
    expect = {}
    for i in range(20):
        frames, _ = multimodal.decode_video(multimodal.rawvideo(i, rng))
        expect[i] = len(range(0, frames.shape[0], stride))
    got = {}
    for r in sampled:
        got[r["media_id"]] = got.get(r["media_id"], 0) + 1
        assert r["frame_idx"] % stride == 0
        assert len(r["feature"]) == multimodal.FEATURE_DIM
    assert got == expect
    # the brightness ramp makes frames within a clip distinct: sampled
    # frame features must differ between the first and last kept frame
    by_clip = {}
    for r in sampled:
        by_clip.setdefault(r["media_id"], []).append((r["frame_idx"], r["feature"]))
    n_checked = 0
    for frames_list in by_clip.values():
        frames_list.sort()
        if len(frames_list) >= 2:
            assert frames_list[0][1] != frames_list[-1][1]
            n_checked += 1
    assert n_checked > 0


def test_media_fixtures_deterministic(tmp_path):
    """The committed parquet fixtures are pure functions of the seed: a
    regeneration into a fresh root produces byte-identical payload sets."""
    import pandas as pd

    for kind in ["bmm", "ppm", "wav", "bmv"]:
        committed = pd.read_parquet(multimodal.media_fixture_path(kind))
        fresh = pd.read_parquet(
            multimodal.ensure_media_fixture(kind, root=str(tmp_path))
        )
        assert list(committed.columns) == list(fresh.columns)
        assert len(committed) == len(fresh)
        assert [bytes(p) for p in committed["payload"]] == [
            bytes(p) for p in fresh["payload"]
        ]


def test_feature_oracles_match(spark, duck):
    """Every media query hash-matches its DuckDB oracle — the oracle
    re-decodes the SAME fixture bytes independently (BLOB hex slicing +
    SQL aggregates; no numpy, no shared decode code)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tools.oracle_sweep import frame_hash

    oracles = multimodal.oracle_sqls()
    assert set(oracles) == set(multimodal.QUERIES)
    for name, q in multimodal.QUERIES.items():
        sdf = q(spark, "unused").toPandas()
        odf = duck.execute(oracles[name]).df()
        assert len(sdf) == len(odf), name
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert frame_hash(sdf) == frame_hash(odf), name


def test_exploded_feature_queries_scalar_only(spark):
    """Driver-canonicalizer contract: no array-typed output columns —
    every media query emits scalar cells only (the round-2 err fix)."""
    for name, q in multimodal.QUERIES.items():
        df = q(spark, "unused")
        for f in df.schema.fields:
            assert not f.dataType.typeName().startswith("array"), (
                f"{name}.{f.name} is array-typed"
            )
