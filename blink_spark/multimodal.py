"""Multimodal column plumbing: opaque ``binary`` payloads (image / audio /
video frames) with typed metadata, processed through Arrow-batched
``mapInPandas`` — the pattern a training-data pipeline uses to decode,
feature-extract, resize or frame-sample media at 100 TB scale.

The actual codec work is STUBBED (this environment ships no image/audio
libraries): ``decode_image`` raises ``NotImplementedError`` unless the
deterministic fake-decoder is selected. Everything around the stub — the
schema, the batch iteration shape, the per-partition processing, the
metadata extraction from real byte headers — is real Spark plumbing and is
tested (tests/test_multimodal.py).

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

def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real decoder entry point. The sandbox has no image libraries; on a
    real deployment this dispatches to pillow/opencv inside the UDF."""
    raise NotImplementedError(
        "no image codec in this environment — use fake_decode_features "
        "(deterministic) or install a codec and implement decode_image"
    )


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


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [
            _fake_feature(p).tolist() for p in pdf["payload"]
        ]
        yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """payload → FEATURE_DIM embedding per row. ``real_decode=True`` routes
    through the (stubbed) codec and raises; the default uses the
    deterministic fake so the distributed plumbing is testable."""
    if real_decode:
        decode_image(b"")  # raises NotImplementedError with guidance
    return media.mapInPandas(_feature_batches, FEATURE_SCHEMA)


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
