"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque BINARY columns with a typed metadata struct;
all Spark-side mechanics (schema, partition sizing, Arrow batch shape,
UDF signatures) are real and tested. The actual codec step is STUBBED
— image/audio libraries are not in this container — behind
`register_decoder`: the default "decoder" derives a deterministic
fake feature vector from the payload bytes, and a real deployment
registers e.g. a Pillow/torchaudio decoder with the same signature.

Scale notes: payloads dominate row size, so
- keep `spark.sql.files.maxPartitionBytes` small enough that one
  partition of payload rows fits executor memory;
- decode via mapInPandas (per-partition Arrow batches) so the codec
  amortizes per batch, not per row;
- project metadata-only (column pruning) wherever the payload is not
  needed — the schema splits payload from metadata for exactly this.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

# decoder registry: media_type -> bytes -> list[float] (FEATURE_DIM)
_DECODERS: dict = {}


def register_decoder(media_type: str, fn: Callable[[bytes], List[float]]):
    _DECODERS[media_type] = fn


def _fake_decode(payload: bytes) -> List[float]:
    """Deterministic stand-in for a real codec: md5-derived features.
    A real deployment replaces this via register_decoder('image', ...)
    with e.g. a Pillow resize->pool pipeline; the Spark plumbing is
    identical."""
    h = hashlib.md5(payload or b"").digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(FEATURE_DIM)]


def decode_features(
    media: DataFrame,
    media_type_col: str = "media_type",
    payload_col: str = "payload",
) -> DataFrame:
    """payload binary -> features array<float>, via mapInPandas (one
    Python invocation per Arrow batch; payload never crosses as
    per-row pickles)."""
    out_schema = StructType(
        [f for f in media.schema.fields if f.name != payload_col]
        + [StructField("features", ArrayType(FloatType()), True)]
    )
    cols = [f.name for f in media.schema.fields if f.name != payload_col]

    def decode_batches(it: Iterator) -> Iterator:
        for pdf in it:
            feats = []
            for mt, payload in zip(pdf[media_type_col], pdf[payload_col]):
                fn = _DECODERS.get(mt, _fake_decode)
                feats.append(fn(bytes(payload) if payload is not None else b""))
            out = pdf[cols].copy()
            out["features"] = feats
            yield out

    from jvst_spark.ops._parallel import ensure_min_parallelism

    return ensure_min_parallelism(media).mapInPandas(
        decode_batches, out_schema
    )


def synthetic_media(spark, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: payload =
    UTF-8 bytes of the text (an opaque blob as far as the pipeline is
    concerned), typed metadata from its length."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("media-"), F.col("doc_id").cast("string")).alias(
            "media_ref"
        ),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    timestamp (the decode of each frame is the stubbed step). Shows the
    explode shape a real sampler uses."""
    n_frames = (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )
