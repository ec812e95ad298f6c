"""Multimodal column plumbing: opaque ``binary`` payloads (image / audio /
video frames) with typed metadata, processed through Arrow-batched
``mapInPandas`` — the pattern a training-data pipeline uses to decode,
feature-extract, resize or frame-sample media at 100 TB scale.

Codecs: ``decode_image`` REALLY decodes the NetPBM family (binary P5
grayscale / P6 RGB — parseable with zero external libraries; round-trip
tested against ``encode_ppm``), and raises ``NotImplementedError`` for
compressed formats (JPEG/PNG), which need pillow/opencv on a real
deployment — they dispatch from the same entry point, so the Spark-side
plumbing (schema, batch iteration, per-partition processing, metadata
extraction from real byte headers) is identical and fully tested
(tests/test_multimodal.py).

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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

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


def media_table(spark: SparkSession, n_rows: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (one binary payload per row)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_rows):
        modality = int(rng.randint(3))
        rows.append(
            (i, i % 97, MODALITIES[modality], bytearray(synth_payload(i, modality, rng)))
        )
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


def ppm_table(spark: SparkSession, n_rows: int = 120, seed: int = 7) -> DataFrame:
    """Synthetic media table whose payloads are REAL decodable P6 images."""
    rng = np.random.RandomState(seed)
    rows = [
        (i, i % 31, "image", bytearray(ppm_image(i, rng))) for i in range(n_rows)
    ]
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
