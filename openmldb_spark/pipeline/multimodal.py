"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested: schemas, partition-size
control, UDF signatures, batch shapes. The *decoders* are stubs — the
image/audio libraries are not in this container — with a deterministic fake
path so the plumbing has testable, reproducible outputs. Swap
``_decode_image_stub`` for a real PIL/ffmpeg call in production; nothing
else changes.

Scale notes: binary payloads dominate partition size — ``mapInPandas``
receives Arrow batches, so per-batch peak memory ≈ batch_rows × payload.
Control it with ``spark.sql.execution.arrow.maxRecordsPerBatch`` and keep
``spark.sql.files.maxPartitionBytes`` at 128–256 MB so a partition of
binaries fits executor memory comfortably.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal record schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, mime string, n_bytes long, sha1 string, "
    "width int, height int, feat array<float>"
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake (no image libs in this container).

    Derives (width, height, 8-dim feature) from a sha1 of the payload, so
    tests are reproducible. Replace with PIL/torchvision for real decoding:

        from PIL import Image; img = Image.open(io.BytesIO(payload)) ...

    Raises NotImplementedError for empty payloads (a real decoder would too).
    """
    if not payload:
        raise NotImplementedError("empty payload: real decoder required")
    h = hashlib.sha1(payload).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feat = [b / 255.0 for b in h[2:10]]
    return width, height, feat


def extract_image_features(df: DataFrame) -> DataFrame:
    """payload -> (dims, feature vector) via Arrow-batched mapInPandas.

    Input must have media_id/mime/payload columns (MEDIA_SCHEMA subset).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"] or b""
                try:
                    w, h, feat = _decode_image_stub(bytes(payload))
                except NotImplementedError:
                    w, h, feat = None, None, None
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "mime": r["mime"],
                        "n_bytes": len(payload),
                        "sha1": hashlib.sha1(bytes(payload)).hexdigest(),
                        "width": w,
                        "height": h,
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "mime", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).

    The decode itself is stubbed; the row explosion (the part that matters
    for partitioning: a 2-hour video = 7200 rows) is real Spark.
    """
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(1))),
        )
        .withColumn("frame_ts_ms", F.col("frame_ts_ms") * every_ms)
        .select("media_id", "mime", "frame_ts_ms")
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id string, mime string, n_bytes long, duration_ms int, "
    "mfcc array<float>"
)


def _decode_audio_stub(payload: bytes) -> tuple[int, list[float]]:
    """STUB audio decoder — deterministic fake (no audio libs here).
    Derives (duration_ms, 13-dim mfcc-shaped vector) from a sha1 of the
    payload. Replace with soundfile/librosa in production:

        import soundfile as sf; data, rate = sf.read(io.BytesIO(payload)) ...
    """
    if not payload:
        raise NotImplementedError("empty payload: real decoder required")
    h = hashlib.sha1(payload).digest()
    duration_ms = 1000 + int.from_bytes(h[:2], "big")
    mfcc = [b / 255.0 - 0.5 for b in h[2:15]]
    return duration_ms, mfcc


def extract_audio_features(df: DataFrame) -> DataFrame:
    """payload -> (duration, mfcc-shaped vector) via Arrow-batched
    mapInPandas — same batch/memory profile as the image path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"] or b"")
                try:
                    dur, mfcc = _decode_audio_stub(payload)
                except NotImplementedError:
                    dur, mfcc = None, None
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "mime": r["mime"],
                        "n_bytes": len(payload),
                        "duration_ms": dur,
                        "mfcc": mfcc,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "mime", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


RESIZED_SCHEMA = "media_id string, mime string, width int, height int, payload binary"


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plan: payload -> resized payload, via mapInPandas.

    The pixel work is stubbed (deterministic truncate-or-pad so output
    size tracks the target dims); the Spark-side contract is real: binary
    in, binary out, one row per image, output partition sizing inherited
    from the input (control with arrow.maxRecordsPerBatch as in the
    module docstring). Swap the stub body for PIL's ``Image.resize``.
    """
    target = width * height // 8  # stub: bytes proportional to pixel count

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"] or b"")
                if not payload:
                    out = None
                else:
                    reps = -(-target // len(payload))  # ceil
                    out = (payload * reps)[:target]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "mime": r["mime"],
                        "width": width,
                        "height": height,
                        "payload": out,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "mime", "payload").mapInPandas(run, RESIZED_SCHEMA)
