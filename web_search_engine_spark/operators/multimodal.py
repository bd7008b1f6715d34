"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this
environment, so the DECODE step is stubbed (try-import; deterministic
fake fallback) — but everything Spark-side is real and tested: the
binary-column schema, Arrow batch shape through mapInPandas, partition
sizing, and the feature-table contract a downstream trainer would read.

Fake payload format (deterministic, seeded by media_id):
  bytes 0-3   magic b"FMM1"
  byte  4     kind (0=image, 1=audio, 2=video)
  bytes 5-8   width / sample_rate (little-endian u32)
  bytes 9-12  height / n_samples (little-endian u32)
  bytes 13+   md5-derived filler
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, "
    "n_frames int, feature array<float>, decoder string"
)


def synthesize_media(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: (media_id, doc_id, kind, payload)."""
    rows = []
    for i in range(n):
        kind_idx = i % 3
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        w = 64 + (h[0] % 64)
        ht = 64 + (h[1] % 64)
        payload = b"FMM1" + struct.pack("<BII", kind_idx, w, ht) + h * 4
        rows.append((i, i % 50, KINDS[kind_idx], bytearray(payload)))
    pdf = pd.DataFrame(rows, columns=["media_id", "doc_id", "kind", "payload"])
    return spark.createDataFrame(
        pdf, schema="media_id long, doc_id long, kind string, payload binary"
    )


def _real_decode(payload: bytes):  # pragma: no cover - no codec libs here
    """Real decoder hook. Wire PIL/librosa/av here on a cluster image."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decode libraries not installed in this environment"
        ) from exc
    raise NotImplementedError("real decode path not implemented in sandbox")


def _fake_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in for decode+feature-extract: parses the
    fake header and hashes the body into an 8-dim float feature."""
    if payload[:4] != b"FMM1":
        raise ValueError("bad magic")
    kind_idx, w, h = struct.unpack("<BII", payload[4:13])
    body = np.frombuffer(payload[13:45], dtype=np.uint8).astype(np.float32)
    feat = body.reshape(4, 8).mean(axis=0) / 255.0
    n_frames = 1 if kind_idx == 0 else int(w % 16) + 1
    return w, h, n_frames, feat


def extract_media_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column in columnar batches; each batch is
    decoded in one Python hop. Repartition upstream so a batch of
    payloads fits executor memory (payload sizes times
    maxRecordsPerBatch).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if use_real_decoder:
                    _real_decode(payload)  # raises NotImplementedError here
                w, h, n_frames, feat = _fake_decode(payload)
                out.append((r.media_id, r.kind, w, h, n_frames, feat.tolist(), "fake"))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "kind", "width", "height",
                    "n_frames", "feature", "decoder",
                ],
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(features: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plan for video rows: one row per kept frame index.

    -> (media_id, frame_idx). Pure-JVM explode over a sequence — the
    decode of the sampled frame would happen in a later mapInPandas.
    """
    vids = features.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
