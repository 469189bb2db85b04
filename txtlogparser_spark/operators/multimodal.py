"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
output contracts) is real and tested; the media DECODE step is stubbed —
the runtime container ships no image/audio codecs — behind
`decoder=` hooks. `deterministic_fake_decoder` provides a seeded,
content-derived stand-in so the full distributed path (including feature
aggregation downstream) is exercisable end-to-end.

Schema conventions:
  media(doc_id string, modality string, payload binary,
        meta struct<mime:string, width:int, height:int, duration_ms:int>)
  features(doc_id string, modality string, feature array<float>, n_bytes long)
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("modality", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def real_decoder(payload: bytes, meta) -> np.ndarray:
    """Decode media bytes → feature vector. NOT available in this
    container (no PIL/ffmpeg); wire in an actual codec in production."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use deterministic_fake_decoder for plumbing tests"
    )


def deterministic_fake_decoder(dim: int = 8) -> Callable[[bytes, object], np.ndarray]:
    """Content-derived fake features: md5(payload) → dim floats in [0,1).
    Deterministic across runs/executors — keeps resume/e2e tests exact."""

    def decode(payload: bytes, meta) -> np.ndarray:
        if payload is None:
            payload = b""
        h = hashlib.md5(payload).digest()
        raw = (h * ((dim * 2) // len(h) + 1))[: dim * 2]
        vals = np.frombuffer(raw, dtype=np.uint16).astype(np.float32)
        return vals[:dim] / 65536.0

    return decode


def extract_features(
    media: DataFrame,
    decoder: Optional[Callable] = None,
    dim: int = 8,
    batch_size_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction: streams Arrow batches of binary
    payloads through the decoder; never materializes a full partition.

    For real media, payloads are large — pair this with
    `spark.sql.files.maxPartitionBytes` sizing and the `batch_size_hint`
    (maxRecordsPerBatch) so executor memory holds decode workspace for
    only one batch at a time.
    """
    dec = decoder or deterministic_fake_decoder(dim)

    # inherit the caller's key type (string here, int64 in e.g. the driver
    # `documents` table) instead of forcing a cast
    out_schema = StructType(
        [media.schema["doc_id"]]
        + [f for f in FEATURE_SCHEMA.fields if f.name != "doc_id"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the DECODER owns the null-payload policy (the default
            # fake maps None to md5(b"") features) — bypassing it with
            # [0.0]*dim produced wrong-length features whenever a custom
            # decoder's output dim differed from the `dim` argument
            feats = [
                dec(p, m).tolist()
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (JVM sequence — the decode of each frame is the stubbed
    step). Yields (doc_id, frame_ms) rows, partition-friendly."""
    return media.where(F.col("modality") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
