"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages.  The actual codecs are NOT available in this
container, so the decode kernel is a clearly-marked deterministic stub —
the Spark-side plumbing (schemas, batch iteration, partition sizing,
column pruning before the Python stage) is real and tested.

Scale notes (100 TB of media): binary payloads dominate partition size —
``spark.sql.files.maxPartitionBytes`` should be sized so one Arrow batch of
payloads fits executor memory; metadata-only predicates (width/height/
mime) are plain columns and prune *before* the Python stage, so filtered
decode pipelines never ship rejected bytes through Arrow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

FEATURE_DIM = 16


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque payload with
    synthesized image-ish metadata (deterministic from content)."""
    payload = F.col("text").cast("binary")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.crc32(payload) % 1920).cast("int").alias("width"),
            (F.crc32(payload) % 1080).cast("int").alias("height"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """STUB: real image/audio decode is unavailable in this container
    (no PIL/ffmpeg).  Deterministic fake: fixed-dim byte-histogram feature.
    Swap for a real codec by replacing this function only — the Spark
    plumbing around it is production-shaped."""
    if payload is None:
        raise NotImplementedError("real decoder not bundled; payload missing")
    acc = [0.0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[b % FEATURE_DIM] += 1.0
    n = max(len(payload), 1)
    return [v / n for v in acc]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Column pruning: only (media_id, payload) cross the Arrow boundary."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": [True] * len(pdf),
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def resize(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' stand-in: a real pixel resample needs codecs (stubbed, like
    ``_decode_stub``); the Spark plumbing is the production shape — payload
    transformed in an Arrow-batched kernel, metadata rebuilt to the target
    dimensions JVM-side afterwards.

    Deterministic fake kernel: stride-decimate payload bytes down to
    <= ``target_bytes`` (byte j survives iff j % stride == 0)."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            small = []
            for p in pdf["payload"]:
                stride = max(1, len(p) // target_bytes) if p else 1
                small.append(bytes(p[::stride]) if p else b"")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": small,
                    "n_bytes": [len(s) for s in small],
                }
            )

    resized = media.select("media_id", "payload").mapInPandas(kernel, out_schema)
    side = int(target_bytes**0.5)
    return resized.select(
        "media_id",
        "payload",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(side).cast("int").alias("width"),
            F.lit(side).cast("int").alias("height"),
            F.col("n_bytes").alias("n_bytes"),
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (the same
    substring/stride plumbing a video frame sampler needs), JVM-side only."""
    return media.select(
        "media_id",
        F.expr(
            f"transform(sequence(1, greatest(octet_length(payload), 1), {every_n_bytes}), "
            f"i -> substring(payload, i, 8))"
        ).alias("frames"),
    )
