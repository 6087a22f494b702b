"""Multimodal column support (north-star surface): image/audio/video as
opaque BINARY payloads with typed metadata, processed via Arrow-batched
mapInPandas.

The decode step is STUBBED — this container has no image/audio libraries —
but the Spark-side plumbing is real and tested: schema, batch iteration,
partition-preserving transforms, and the deterministic fake feature extractor
used by tests (mirroring how the reference tests embedding providers with a
deterministic hash embedder, tests/integration/test_rag_integration.py:38-46).

Scale notes: payloads stay in executor memory one Arrow batch at a time
(spark.sql.execution.arrow.maxRecordsPerBatch bounds peak memory); metadata
filters (media_type, n_bytes) push down to parquet so a "decode all JPEGs
under 1 MB" pipeline scans only matching row groups.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..util import _LIGHT_TASK_BYTES, ensure_parallelism

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("metadata", T.StringType(), True),  # JSON
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_media(payload: bytes, media_type: str):
    """Real decode entry point — requires PIL/ffmpeg/librosa, none of which
    ship in this container. Kept as the single integration seam."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use fake_features (deterministic) for pipeline tests"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: md5-chained floats in [0,1)."""
    out, seed = [], payload
    while len(out) < dim:
        seed = hashlib.md5(seed).digest()
        out.extend(b / 256.0 for b in seed)
    return [float(x) for x in out[:dim]]


def extract_features(media: DataFrame, *, use_fake: bool = True, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The Arrow batch shape (pd.DataFrame with a bytes column) is exactly what
    a real decoder (PIL.Image.open(io.BytesIO(b))) consumes — swapping
    fake_features for decode_media is a one-line change.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_features(b) if use_fake else decode_media(b, mt)
                for b, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
                }
            )

    # light per-row transform: bytes-sized fan-out (r16, guide §2 — the
    # fake decoder is per-row trivial; driver core-ratio 0.22 at full fan-out)
    return ensure_parallelism(media, per_task_bytes=_LIGHT_TASK_BYTES).mapInPandas(
        run, schema=_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame index list.

    With a real decoder the sequence length comes from the container header;
    here it derives deterministically from payload size so the explode/
    partition shape is real.
    """
    n_frames = (F.octet_length("payload") % 100 + 1).alias("n_frames")
    return (
        media.where(F.col("media_type") == "video")
        .select("media_id", n_frames)
        .select("media_id", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"))
    )
