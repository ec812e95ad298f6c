"""Multimodal column plumbing: opaque ``binary`` payloads (image / audio /
video frames) with typed metadata, processed through Arrow-batched
``mapInPandas`` — the pattern a training-data pipeline uses to decode,
feature-extract, resize or frame-sample media at 100 TB scale.

Codecs — one REAL zero-dependency decoder per modality, each round-trip
tested against its encoder: ``decode_image`` (NetPBM binary P5 grayscale /
P6 RGB), ``decode_audio`` (RIFF/WAVE PCM16 mono, chunk-walking), and
``decode_video`` (raw BMV1 frame stacks). Compressed formats (JPEG/PNG,
MP3/OGG, MP4/WebM) raise ``NotImplementedError`` with guidance — on a real
deployment they dispatch to pillow/ffmpeg from the same entry points, so
the Spark-side plumbing (schema, batch iteration, per-partition
processing, metadata extraction from real byte headers, 1→many frame
fan-out) is identical and fully tested (tests/test_multimodal.py).

Synthetic corpus: ``media_table`` generates deterministic payloads whose
headers follow a tiny TLV layout::

    bytes 0-3   magic  b"BMM1"
    byte  4     modality (0=image, 1=audio, 2=video)
    bytes 5-8   width / sample-rate (uint32 BE)
    bytes 9-12  height / n-samples  (uint32 BE)
    bytes 13+   payload (pseudo-random, seeded per row)

so metadata extraction parses REAL bytes, not a fixture column.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark.parity import r6 as _r6

MAGIC = b"BMM1"
MODALITIES = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = (
    "media_id long, doc_id long, modality string, payload binary"
)

META_SCHEMA = (
    "media_id long, modality string, width long, height long, "
    "payload_bytes long, magic_ok boolean"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, feature array<double>"


def synth_payload(media_id: int, modality: int, rng: np.random.RandomState) -> bytes:
    w = int(rng.randint(16, 513))
    h = int(rng.randint(16, 513))
    body_len = int(rng.randint(64, 257))
    header = (
        MAGIC
        + bytes([modality])
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
    )
    body = rng.randint(0, 256, size=body_len, dtype=np.int64).astype(np.uint8)
    return header + body.tobytes()


def _media_rows(n_rows: int = 300, seed: int = 42) -> list[tuple]:
    """Row tuples for the BMM1 corpus — pure function of (n_rows, seed), so
    the Spark table and the committed parquet fixture are byte-identical.
    Row-by-row driver-side synthesis is fixture-only; a real corpus arrives
    as a table (e.g. parquet of crawled payloads) and never touches the
    driver."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_rows):
        modality = int(rng.randint(3))
        rows.append(
            (i, i % 97, MODALITIES[modality], synth_payload(i, modality, rng))
        )
    return rows


def media_table(spark: SparkSession, n_rows: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (one binary payload per row)."""
    rows = [(a, b, c, bytearray(p)) for a, b, c, p in _media_rows(n_rows, seed)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Metadata extraction (real byte parsing, vectorized per Arrow batch)
# ---------------------------------------------------------------------------

def _extract_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        out = {
            "media_id": pdf["media_id"],
            "modality": pdf["modality"],
            "width": [
                int.from_bytes(bytes(p[5:9]), "big") if len(p) >= 13 else None
                for p in payloads
            ],
            "height": [
                int.from_bytes(bytes(p[9:13]), "big") if len(p) >= 13 else None
                for p in payloads
            ],
            "payload_bytes": [len(p) for p in payloads],
            "magic_ok": [bytes(p[:4]) == MAGIC for p in payloads],
        }
        yield pd.DataFrame(out)


def extract_metadata(media: DataFrame) -> DataFrame:
    """binary header → typed metadata columns via mapInPandas (no payload
    leaves the executor; only the parsed scalars shuffle)."""
    return media.mapInPandas(_extract_meta_batches, META_SCHEMA)


# ---------------------------------------------------------------------------
# Decode / feature-extract (stub + deterministic fake)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 array (H×W grayscale → P5, H×W×3 RGB → P6) → NetPBM bytes."""
    if img.ndim == 2:
        magic = b"P5"
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"expected HxW or HxWx3 uint8, got {img.shape}")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decoder for the NetPBM family — binary P5 (grayscale)
    and P6 (RGB), the formats decodable with zero external codecs: header
    tokens (whitespace-separated, ``#`` comments) then a raw raster.
    Returns uint8 (H, W) or (H, W, 3). Compressed formats (JPEG/PNG)
    still raise: on a real deployment they dispatch to pillow/opencv from
    this same entry point — the Spark-side plumbing is identical."""
    buf = bytes(payload)
    magic = buf[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"codec for magic {magic!r} not available in this environment "
            "(pure-python NetPBM P5/P6 only; JPEG/PNG need pillow/opencv)"
        )
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(buf):
        c = buf[i : i + 1]
        if c == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(buf) and not buf[j : j + 1].isspace():
                j += 1
            tokens.append(buf[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated NetPBM header")
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError("only maxval=255 NetPBM supported")
    i += 1  # single whitespace byte after maxval, then the raster
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=i)
    return raster.reshape((h, w, 3)) if channels == 3 else raster.reshape((h, w))


def ppm_image(media_id: int, rng: np.random.RandomState) -> bytes:
    """Deterministic synthetic P6 image: per-channel gradient + seeded
    noise, so decoded statistics vary smoothly per row."""
    w = int(rng.randint(8, 65))
    h = int(rng.randint(8, 65))
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
    img = np.stack(
        [
            base,
            ((yy * 255) // max(h - 1, 1)).astype(np.uint8),
            rng.randint(0, 256, size=(h, w)).astype(np.uint8),
        ],
        axis=2,
    )
    return encode_ppm(img)


def _ppm_rows(n_rows: int = 120, seed: int = 7) -> list[tuple]:
    rng = np.random.RandomState(seed)
    return [(i, i % 31, "image", ppm_image(i, rng)) for i in range(n_rows)]


def ppm_table(spark: SparkSession, n_rows: int = 120, seed: int = 7) -> DataFrame:
    """Synthetic media table whose payloads are REAL decodable P6 images."""
    rows = [(a, b, c, bytearray(p)) for a, b, c, p in _ppm_rows(n_rows, seed)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→embed: bucket byte histogram of
    the body, unit-normalized. Exercises the same batch shape and output
    schema a real vision encoder would."""
    body = np.frombuffer(bytes(payload[13:]), dtype=np.uint8)
    if body.size == 0:
        return np.zeros(FEATURE_DIM)
    hist, _ = np.histogram(body, bins=FEATURE_DIM, range=(0, 256))
    v = hist.astype(np.float64)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _real_feature(payload: bytes) -> np.ndarray:
    """decode→embed over a genuinely decoded image: 2×2 spatial grid ×
    3 channel means (12 dims) + 4 global gray stats, unit-normalized —
    the mean-pooling shape a real vision encoder's head produces."""
    img = decode_image(payload)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w, _ = img.shape
    f = np.empty(FEATURE_DIM, dtype=np.float64)
    k = 0
    for gy in range(2):
        for gx in range(2):
            cell = img[gy * h // 2:(gy + 1) * h // 2 or 1,
                       gx * w // 2:(gx + 1) * w // 2 or 1]
            for c in range(3):
                f[k] = float(cell[:, :, c].mean()) if cell.size else 0.0
                k += 1
    gray = img.mean(axis=2)
    f[12:16] = [gray.mean(), gray.std(), gray.min(), gray.max()]
    n = np.linalg.norm(f)
    return f / n if n > 0 else f


def _feature_batches(real: bool):
    fn = _real_feature if real else _fake_feature

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return gen


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """payload → FEATURE_DIM embedding per row. ``real_decode=True`` runs
    the REAL codec (NetPBM P5/P6; other formats raise NotImplementedError
    executor-side with guidance); the default uses the deterministic fake
    over the opaque BMM1 payloads so the distributed plumbing is testable
    independent of codec availability."""
    return media.mapInPandas(_feature_batches(real_decode), FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: REAL RIFF/WAVE PCM16 codec (zero external libraries)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → canonical RIFF/WAVE PCM bytes (fmt + data)."""
    pcm = samples.astype("<i2").tobytes()
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")     # byte rate
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits/sample
    )
    data = b"data" + len(pcm).to_bytes(4, "little") + pcm
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decoder for RIFF/WAVE PCM16 mono — the one audio format
    decodable with zero external codecs: walks the chunk list (skipping
    unknown chunks, even-padded per spec), reads ``fmt `` + ``data``.
    Returns (int16 samples, sample_rate). Compressed audio (MP3/OGG/FLAC)
    raises: on a real deployment it dispatches to ffmpeg/soundfile from
    this same entry point — the Spark-side plumbing is identical."""
    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError(
            f"codec for magic {buf[:4]!r} not available in this environment "
            "(pure-python RIFF/WAVE PCM only; MP3/OGG/FLAC need ffmpeg)"
        )
    rate = channels = bits = fmt_code = None
    pcm = None
    i = 12
    while i + 8 <= len(buf):
        cid = buf[i : i + 4]
        size = int.from_bytes(buf[i + 4 : i + 8], "little")
        body = buf[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_code = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            pcm = body
        i += 8 + size + (size & 1)  # chunks are even-padded
    if fmt_code is None or pcm is None:
        raise ValueError("truncated WAVE: missing fmt or data chunk")
    if fmt_code != 1 or bits != 16 or channels != 1:
        raise NotImplementedError(
            f"only PCM16 mono supported (got fmt={fmt_code}, bits={bits}, "
            f"channels={channels}); other encodings need ffmpeg/soundfile"
        )
    return np.frombuffer(pcm, dtype="<i2"), int(rate)


def wav_audio(media_id: int, rng: np.random.RandomState) -> bytes:
    """Deterministic synthetic WAV: seeded sine + noise, varying length
    and pitch per row so decoded statistics differ smoothly."""
    rate = int(rng.choice([8000, 16000]))
    n = int(rng.randint(256, 2049))
    freq = float(rng.uniform(80.0, 2000.0))
    t = np.arange(n, dtype=np.float64) / rate
    wave = 0.6 * np.sin(2 * np.pi * freq * t)
    wave += 0.05 * rng.standard_normal(n)
    return encode_wav(np.clip(wave, -1, 1) * 32767, rate)


def _wav_rows(n_rows: int = 80, seed: int = 11) -> list[tuple]:
    rng = np.random.RandomState(seed)
    return [(i, i % 23, "audio", wav_audio(i, rng)) for i in range(n_rows)]


def wav_table(spark: SparkSession, n_rows: int = 80, seed: int = 11) -> DataFrame:
    """Synthetic media table whose payloads are REAL decodable WAVs."""
    rows = [(a, b, c, bytearray(p)) for a, b, c, p in _wav_rows(n_rows, seed)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _audio_feature(payload: bytes) -> np.ndarray:
    """decode→embed over genuinely decoded audio: 8 frame-RMS values
    (time envelope) + zero-crossing rate, global RMS, peak, mean, std,
    spectral proxy (abs first difference mean), duration, log rate —
    unit-normalized; the pooled-stats shape an audio encoder head yields."""
    samples, rate = decode_audio(payload)
    x = samples.astype(np.float64) / 32768.0
    if x.size == 0:
        return np.zeros(FEATURE_DIM)
    frames = np.array_split(x, 8)
    f = np.empty(FEATURE_DIM, dtype=np.float64)
    f[:8] = [np.sqrt((fr * fr).mean()) if fr.size else 0.0 for fr in frames]
    f[8] = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    f[9] = float(np.sqrt((x * x).mean()))
    f[10] = float(np.abs(x).max())
    f[11] = float(x.mean())
    f[12] = float(x.std())
    f[13] = float(np.abs(np.diff(x)).mean()) if x.size > 1 else 0.0
    f[14] = x.size / rate
    f[15] = np.log10(rate)
    n = np.linalg.norm(f)
    return f / n if n > 0 else f


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "feature": [_audio_feature(p).tolist() for p in pdf["payload"]],
            }
        )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """WAV payload → FEATURE_DIM embedding per row (real decode), same
    mapInPandas shape as the image path — payloads never leave the
    executor, only the 16-dim vectors shuffle."""
    return media.mapInPandas(_audio_feature_batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: raw-frame container + frame sampling (the mapInPandas fan-out op)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"BMV1"
FRAME_SCHEMA = "media_id long, frame_idx long, feature array<double>"


def encode_rawvideo(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 (n, H, W, 3) frame stack → BMV1 bytes: magic, fps, n, w, h
    (uint32 BE each) + concatenated raw RGB rasters — the decodable
    zero-dependency stand-in for a real container."""
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError(f"expected (n,H,W,3) uint8, got {frames.shape}")
    header = (
        VIDEO_MAGIC
        + fps.to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
    )
    return header + frames.astype(np.uint8).tobytes()


def decode_video(payload: bytes) -> tuple[np.ndarray, int]:
    """BMV1 → (uint8 (n,H,W,3) frames, fps). Compressed containers
    (MP4/WebM) raise — they'd dispatch to ffmpeg from this entry point."""
    buf = bytes(payload)
    if buf[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            f"codec for magic {buf[:4]!r} not available in this environment "
            "(raw BMV1 only; MP4/WebM need ffmpeg)"
        )
    fps = int.from_bytes(buf[4:8], "big")
    n = int.from_bytes(buf[8:12], "big")
    w = int.from_bytes(buf[12:16], "big")
    h = int.from_bytes(buf[16:20], "big")
    raster = np.frombuffer(buf, dtype=np.uint8, count=n * h * w * 3, offset=20)
    return raster.reshape((n, h, w, 3)), fps


def rawvideo(media_id: int, rng: np.random.RandomState) -> bytes:
    """Deterministic synthetic clip: a brightness ramp over seeded noise,
    so per-frame statistics change monotonically through the clip."""
    n = int(rng.randint(4, 17))
    w = int(rng.randint(8, 33))
    h = int(rng.randint(8, 33))
    base = rng.randint(0, 128, size=(h, w, 3))
    ramp = np.linspace(0, 127, n)[:, None, None, None]
    return encode_rawvideo(
        np.clip(base[None, ...] + ramp, 0, 255).astype(np.uint8), fps=10
    )


def _video_rows(n_rows: int = 40, seed: int = 13) -> list[tuple]:
    rng = np.random.RandomState(seed)
    return [(i, i % 17, "video", rawvideo(i, rng)) for i in range(n_rows)]


def video_table(spark: SparkSession, n_rows: int = 40, seed: int = 13) -> DataFrame:
    """Synthetic media table whose payloads are REAL decodable BMV1 clips."""
    rows = [(a, b, c, bytearray(p)) for a, b, c, p in _video_rows(n_rows, seed)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _frame_sample_batches(stride: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                frames, _ = decode_video(p)
                for k in range(0, frames.shape[0], stride):
                    ids.append(mid)
                    idxs.append(k)
                    feats.append(_real_feature(encode_ppm(frames[k])).tolist())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "feature": feats})

    return gen


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling — the 1→many media op: decode each clip executor-side,
    keep every ``stride``-th frame, emit one (media_id, frame_idx, feature)
    row per kept frame through the image feature head. The fan-out happens
    INSIDE mapInPandas, so raw rasters never shuffle; downstream sees only
    16-dim vectors. At 100 TB this is the shape that keeps video tractable:
    payload-partition parallelism in, small typed rows out."""
    return media.mapInPandas(_frame_sample_batches(stride), FRAME_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-metadata resize planning (the shuffle-free part of a resize
    stage): target dims preserving aspect ratio, computed from parsed
    headers — JVM-side arithmetic once metadata is extracted."""
    from pyspark.sql import functions as F

    meta = extract_metadata(media)
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return meta.select(
        "media_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("width") * scale).cast("long").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("long").alias("target_h"),
    )


# ---------------------------------------------------------------------------
# Committed parquet fixtures: the four deterministic corpora persisted once
# (the ensure_fixture pattern, blink_spark/fixtures.py), so the Spark query
# and the DuckDB oracle read the SAME payload bytes and the header parse is
# hash-verifiable end to end.
# ---------------------------------------------------------------------------

_MEDIA_ROW_BUILDERS = {
    "bmm": _media_rows,
    "ppm": _ppm_rows,
    "wav": _wav_rows,
    "bmv": _video_rows,
}


def media_fixture_path(kind: str, root: str | None = None) -> str:
    root = root or os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")
    return os.path.join(root, f"media_{kind}.parquet")


def ensure_media_fixture(kind: str, root: str | None = None) -> str:
    """Write (once) and return the committed media corpus parquet."""
    path = media_fixture_path(kind, root)
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rows = _MEDIA_ROW_BUILDERS[kind]()
        pdf = pd.DataFrame(
            rows, columns=["media_id", "doc_id", "modality", "payload"]
        )
        pdf.to_parquet(path, index=False)
    return path


def load_media(spark: SparkSession, kind: str) -> DataFrame:
    return spark.read.parquet(ensure_media_fixture(kind))


def _explode_feature(df: DataFrame, *keys: str) -> DataFrame:
    """(keys..., feature array<double>) → (keys..., pos, value) scalar rows —
    the emb_label_centroids shape every downstream harness digests (array
    columns defeat order-insensitive canonicalization)."""
    return df.select(
        *keys, F.posexplode("feature").alias("pos", "value")
    ).select(
        *keys, F.col("pos").cast("long").alias("pos"), _r6("value", 6).alias("value")
    )


# ---------------------------------------------------------------------------
# Driver-contract queries. All four read the committed parquet fixtures and
# emit scalar rows only, and all four carry full DuckDB oracles: the codecs'
# fixture layouts (BMM1/NetPBM/RIFF-WAVE/BMV1) are plain bytes, so the
# oracle re-decodes them INDEPENDENTLY via BLOB hex slicing + SQL aggregates
# — no numpy, no shared code path with the Spark kernels.
# ---------------------------------------------------------------------------

def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata parsed from real BMM1 byte headers (width/height/
    magic check), via mapInPandas — payloads never leave the executor."""
    del sf_dir
    return extract_metadata(load_media(spark, "bmm"))


def q_media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL NetPBM decode → 16-dim pooled feature per image, exploded to
    (media_id, pos, value) scalar rows."""
    del sf_dir
    return _explode_feature(
        extract_features(load_media(spark, "ppm"), real_decode=True), "media_id"
    )


def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE PCM16 decode → 16-dim pooled feature per clip,
    exploded to (media_id, pos, value) scalar rows."""
    del sf_dir
    return _explode_feature(
        extract_audio_features(load_media(spark, "wav")), "media_id"
    )


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMV1 decode → every-4th-frame sample → per-frame feature
    (the 1→many fan-out inside mapInPandas), exploded to scalar rows."""
    del sf_dir
    return _explode_feature(
        sample_frames(load_media(spark, "bmv"), stride=4), "media_id", "frame_idx"
    )


QUERIES = {
    "media_metadata": q_media_metadata,
    "media_image_features": q_media_image_features,
    "media_audio_features": q_media_audio_features,
    "media_frame_sample": q_media_frame_sample,
}


def _hex_be_u32(byte_off: int) -> str:
    """DuckDB SQL: uint32 big-endian at 0-based byte offset of `payload`."""
    return f"('0x' || substring(hex(payload), {2 * byte_off + 1}, 8))::BIGINT"


def _hexpair(byte_off) -> str:
    """DuckDB SQL: hex pair of the byte at 0-based offset (expr allowed)."""
    if isinstance(byte_off, int):
        return f"substring(hx, {2 * byte_off + 1}, 2)"
    return f"substring(hx, 2*({byte_off}) + 1, 2)"


# DuckDB mirror of _real_feature over a raw RGB raster: 2×2 grid × channel
# means + 4 gray stats, L2-normalized. `{pix}` must provide
# (media_id, {extra} w, h, y, x, c, v) — byte-exact decode supplied by the
# caller (NetPBM for images, BMV1 frame slab for video).
_RASTER_FEATURE_SQL = """
cellf AS (
  SELECT media_id, {extra}
    (CASE WHEN y < h//2 THEN 0 ELSE 1 END)*6
      + (CASE WHEN x < w//2 THEN 0 ELSE 1 END)*3 + c AS pos,
    avg(v::DOUBLE) AS raw
  FROM pix GROUP BY ALL
),
gray AS (
  SELECT media_id, {extra} y, x, sum(v)::DOUBLE / 3.0 AS g
  FROM pix GROUP BY ALL
),
grayf AS (
  SELECT media_id, {extra} 12 AS pos, avg(g) AS raw FROM gray GROUP BY ALL
  UNION ALL SELECT media_id, {extra} 13, sqrt(var_pop(g)) FROM gray GROUP BY ALL
  UNION ALL SELECT media_id, {extra} 14, min(g) FROM gray GROUP BY ALL
  UNION ALL SELECT media_id, {extra} 15, max(g) FROM gray GROUP BY ALL
),
feats AS (SELECT * FROM cellf UNION ALL SELECT * FROM grayf),
nrm AS (SELECT media_id, {extra} sqrt(sum(raw*raw)) AS nn FROM feats GROUP BY ALL)
"""


def oracle_sqls() -> dict[str, str]:
    """DuckDB mirrors over the SAME committed fixtures — independent
    formulations of each codec (BLOB hex slicing + SQL aggregates vs the
    Spark kernels' python struct/numpy decode), verified value-exact at
    6 dp in tests/test_multimodal.py::test_feature_oracles_match."""
    bmm = ensure_media_fixture("bmm")
    ppm = ensure_media_fixture("ppm")
    wav = ensure_media_fixture("wav")
    bmv = ensure_media_fixture("bmv")
    sql: dict[str, str] = {}

    sql["media_metadata"] = f"""
SELECT media_id, modality,
  CASE WHEN octet_length(payload) >= 13 THEN {_hex_be_u32(5)} END AS width,
  CASE WHEN octet_length(payload) >= 13 THEN {_hex_be_u32(9)} END AS height,
  octet_length(payload)::BIGINT AS payload_bytes,
  substring(hex(payload), 1, 8) = '{MAGIC.hex().upper()}' AS magic_ok
FROM read_parquet('{bmm}')"""

    # NetPBM P6: ASCII header parsed by regexp over the hex image ("P6\\n"
    # = 50360A, digit d = 3d, " " = 20, "\\n255\\n" = 0A3235350A), then one
    # row per raster byte via unnest(range(w*h*3)).
    raster = _RASTER_FEATURE_SQL.format(extra="")
    sql["media_image_features"] = f"""
WITH m AS (SELECT media_id, hex(payload) AS hx FROM read_parquet('{ppm}')),
hdr AS (
  SELECT media_id, hx,
    regexp_extract(hx, '^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A', 1) AS wd,
    regexp_extract(hx, '^50360A((?:3[0-9])+)20((?:3[0-9])+)0A3235350A', 2) AS hd
  FROM m
),
dims AS (
  SELECT media_id, hx,
    array_to_string(list_transform(range(1, length(wd)//2 + 1),
                                   i -> substring(wd, 2*i, 1)), '')::INT AS w,
    array_to_string(list_transform(range(1, length(hd)//2 + 1),
                                   i -> substring(hd, 2*i, 1)), '')::INT AS h,
    9 + length(wd)//2 + length(hd)//2 AS hlen
  FROM hdr
),
idx AS (SELECT media_id, hx, w, h, hlen, unnest(range(0, w*h*3)) AS k FROM dims),
pix AS (
  SELECT media_id, w, h,
    k // (w*3) AS y, (k % (w*3)) // 3 AS x, k % 3 AS c,
    ('0x' || {_hexpair("hlen + k")})::INT AS v
  FROM idx
),
{raster}
SELECT f.media_id, f.pos::BIGINT AS pos,
  round(CASE WHEN nn > 0 THEN raw / nn ELSE raw END, 6) + 0.0 AS value
FROM feats f JOIN nrm USING (media_id)"""

    # BMV1: fixed 20-byte header (n/w/h u32 BE at offsets 8/12/16); frame
    # fi's raster slab starts at 20 + fi*h*w*3; sample every 4th frame.
    raster_fi = _RASTER_FEATURE_SQL.format(extra="fi, ")
    sql["media_frame_sample"] = f"""
WITH m AS (SELECT media_id, hex(payload) AS hx FROM read_parquet('{bmv}')),
dims AS (
  SELECT media_id, hx,
    ('0x' || substring(hx, 17, 8))::BIGINT AS n,
    ('0x' || substring(hx, 25, 8))::BIGINT AS w,
    ('0x' || substring(hx, 33, 8))::BIGINT AS h
  FROM m
),
fr AS (SELECT media_id, hx, w, h, unnest(range(0, n, 4)) AS fi FROM dims),
idx AS (
  SELECT media_id, hx, w, h, fi, 20 + fi*h*w*3 AS base,
         unnest(range(0, w*h*3)) AS k
  FROM fr
),
pix AS (
  SELECT media_id, fi, w, h,
    k // (w*3) AS y, (k % (w*3)) // 3 AS x, k % 3 AS c,
    ('0x' || {_hexpair("base + k")})::INT AS v
  FROM idx
),
{raster_fi}
SELECT f.media_id, f.fi::BIGINT AS frame_idx, f.pos::BIGINT AS pos,
  round(CASE WHEN nn > 0 THEN raw / nn ELSE raw END, 6) + 0.0 AS value
FROM feats f JOIN nrm USING (media_id, fi)"""

    # RIFF/WAVE PCM16 mono, canonical chunk layout (fmt at 12, data at 36,
    # samples at 44): rate u32 LE at 24, int16 LE samples; 8 frame-RMS
    # buckets follow numpy array_split boundaries (first n%8 parts one
    # longer), zero-crossing/diff stats via lag windows.
    sql["media_audio_features"] = f"""
WITH m AS (SELECT media_id, hex(payload) AS hx, octet_length(payload) AS nb
           FROM read_parquet('{wav}')),
hdr AS (
  SELECT media_id, hx,
    ('0x' || {_hexpair(27)} || {_hexpair(26)} || {_hexpair(25)} || {_hexpair(24)})::BIGINT AS rate,
    (nb - 44) // 2 AS n
  FROM m
),
si AS (SELECT media_id, hx, rate, n, unnest(range(0, n)) AS i FROM hdr),
samp0 AS (
  SELECT media_id, rate, n, i,
    ('0x' || {_hexpair("45 + 2*i")} || {_hexpair("44 + 2*i")})::INT AS raw
  FROM si
),
samp AS (
  SELECT media_id, rate, n, i,
    (CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END) / 32768.0 AS x,
    n // 8 AS q, n % 8 AS r
  FROM samp0
),
sf AS (
  SELECT *, CASE WHEN i < r*(q+1) THEN i // (q+1)
                 ELSE r + (i - r*(q+1)) // q END AS j
  FROM samp
),
framef AS (
  SELECT media_id, j::INT AS pos, sqrt(avg(x*x)) AS raw FROM sf GROUP BY media_id, j
),
lagd AS (
  SELECT media_id, i, x,
    lag(x) OVER (PARTITION BY media_id ORDER BY i) AS px,
    CASE WHEN x < 0 THEN 1 ELSE 0 END AS s,
    lag(CASE WHEN x < 0 THEN 1 ELSE 0 END)
      OVER (PARTITION BY media_id ORDER BY i) AS ps
  FROM samp
),
globalf AS (
  SELECT media_id, 8 AS pos, avg(abs(s - ps)::DOUBLE) AS raw
    FROM lagd WHERE i >= 1 GROUP BY media_id
  UNION ALL SELECT media_id, 9, sqrt(avg(x*x)) FROM samp GROUP BY media_id
  UNION ALL SELECT media_id, 10, max(abs(x)) FROM samp GROUP BY media_id
  UNION ALL SELECT media_id, 11, avg(x) FROM samp GROUP BY media_id
  UNION ALL SELECT media_id, 12, sqrt(var_pop(x)) FROM samp GROUP BY media_id
  UNION ALL SELECT media_id, 13, avg(abs(x - px)) FROM lagd WHERE i >= 1 GROUP BY media_id
  UNION ALL SELECT media_id, 14, any_value(n::DOUBLE / rate) FROM samp GROUP BY media_id
  UNION ALL SELECT media_id, 15, any_value(log10(rate::DOUBLE)) FROM samp GROUP BY media_id
),
feats AS (SELECT * FROM framef UNION ALL SELECT * FROM globalf),
nrm AS (SELECT media_id, sqrt(sum(raw*raw)) AS nn FROM feats GROUP BY media_id)
SELECT f.media_id, f.pos::BIGINT AS pos,
  round(CASE WHEN nn > 0 THEN raw / nn ELSE raw END, 6) + 0.0 AS value
FROM feats f JOIN nrm USING (media_id)"""
    return sql
