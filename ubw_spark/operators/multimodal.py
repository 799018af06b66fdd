"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested: schemas, partitioning, UDF
signatures, batch shapes.  The actual media decode is STUBBED — codec
libraries (PIL/ffmpeg/librosa) are not in this container — behind
``decode_batches(..., codec="real")`` raising NotImplementedError, with
a deterministic fake (``codec="fake"``) driving the tests.

Scale: payloads stay in executor memory one Arrow batch at a time
(bound via spark.sql.execution.arrow.maxRecordsPerBatch for fat rows);
feature extraction emits small fixed-size vectors, so downstream
shuffles carry features, never payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def with_payload_metadata(
    df: DataFrame, payload_col: str, media_type: str = "image", fmt: str | None = None
) -> DataFrame:
    """Attach the typed metadata struct next to a binary payload column."""
    return df.withColumn(
        "payload_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


DECODED_SCHEMA = "id bigint, n_bytes bigint, feature array<float>"


def decode_batches(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    codec: str = "fake",
    feature_dim: int = 16,
) -> DataFrame:
    """Decode payloads and emit fixed-size feature vectors via
    mapInPandas (per-partition Arrow batch iterator — the pattern for
    any custom scan/transform the SQL layer can't express).

    codec="real" is the integration point for actual media libraries;
    in this environment it raises NotImplementedError by design.
    codec="fake" derives a deterministic feature vector from the payload
    bytes, keeping every Spark-side mechanism (schema, batching,
    partition parallelism) real and testable."""

    def _decode(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "plug PIL/ffmpeg here"
                )
            feats = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(raw).digest()
                vec = np.frombuffer(
                    (digest * ((feature_dim * 4) // len(digest) + 1))[: feature_dim * 4],
                    dtype=np.uint32,
                ).astype(np.float32)
                feats.append((vec / np.float32(2**32)).tolist())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(
                        lambda p: len(bytes(p)) if p is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, feature_dim: int = 16
) -> DataFrame:
    """decode + L2-normalize features (ready for the similarity ops)."""
    decoded = decode_batches(
        df, id_col, payload_col, codec="fake", feature_dim=feature_dim
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("feature"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return decoded.select(
        "id",
        "n_bytes",
        F.transform(
            F.col("feature"), lambda x: (x / norm).cast("float")
        ).alias("feature"),
    )
