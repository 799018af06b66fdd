"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested: schemas, partitioning, UDF
signatures, batch shapes.  Image decode/resize under ``codec="real"``
uses PIL via an optional executor-side import (NotImplementedError with
install guidance where pillow is absent — as in this container; the
tests skip accordingly).  Video frame sampling stays gated the same way
pending an ffmpeg binding.  A deterministic fake (``codec="fake"``)
drives the always-on tests and the DuckDB oracles.

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

        if codec == "real":
            # Optional-import INSIDE the worker function: the import must
            # happen on executors, and absence must fail with the same
            # clear gate message the stub used to raise.
            try:
                from PIL import Image
            except ImportError as e:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "codec='real' requires PIL (pillow), which is not "
                    "available in this environment; use codec='fake' or "
                    "install pillow"
                ) from e

        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if codec == "real":
                    # real decode: grayscale thumbnail row as the feature
                    # vector; undecodable payloads yield NULL (dirty bytes
                    # are routine at corpus scale — route, don't crash)
                    import io

                    try:
                        img = Image.open(io.BytesIO(raw)).convert("L")
                        px = list(img.resize((feature_dim, 1)).getdata())
                        feats.append([p / 255.0 for p in px])
                    except Exception:
                        feats.append(None)
                    continue
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    width: int = 64,
    height: int = 64,
    codec: str = "fake",
) -> DataFrame:
    """Resize image payloads to width×height via mapInPandas.

    codec="real" is the PIL integration point (NotImplementedError
    here); codec="fake" emits a deterministic RGB-sized byte payload
    (width·height·3 bytes streamed from the payload digest) so the
    Spark-side contract — binary in, binary out, one Arrow batch at a
    time, output size bound known up front — is real and tested."""

    def _resize(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        if codec == "real":
            try:
                from PIL import Image
            except ImportError as e:  # pragma: no cover - env-dependent
                raise NotImplementedError(
                    "codec='real' requires PIL (pillow), which is not "
                    "available in this environment; use codec='fake' or "
                    "install pillow"
                ) from e

        out_len = width * height * 3
        for pdf in batches:
            payloads = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if codec == "real":
                    # real resize: raw interleaved RGB bytes, exactly
                    # width*height*3 long; undecodable payloads → NULL
                    import io

                    try:
                        img = Image.open(io.BytesIO(raw)).convert("RGB")
                        payloads.append(img.resize((width, height)).tobytes())
                    except Exception:
                        payloads.append(None)
                    continue
                digest = hashlib.sha256(raw).digest()
                payloads.append((digest * (out_len // len(digest) + 1))[:out_len])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                }
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    n_frames: int = 3,
    frame_interval_ms: int = 1000,
    codec: str = "fake",
) -> DataFrame:
    """Sample ``n_frames`` frames per video payload — mapInPandas with
    ROW FAN-OUT (one input row → n output rows), the pattern for any
    decode that explodes a container into parts.

    codec="real" is the ffmpeg integration point; codec="fake" derives
    frame ``i`` as sha256(payload || '#i') — deterministic AND
    reproducible in plain SQL, so the whole fan-out path is
    oracle-checkable (see the multimodal_frame_sample query)."""

    def _frames(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "video codecs not available in this environment; "
                    "plug ffmpeg frame extraction here"
                )
            ids, idxs, tss, frames = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    tss.append(i * frame_interval_ms)
                    frames.append(
                        hashlib.sha256(raw + b"#" + str(i).encode()).digest()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.mapInPandas(_frames, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def synthesize_wav(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic PCM16 WAV payloads derived from the id column —
    the audio-pipeline test/oracle generator (every feature of the
    synthesized clip is a closed-form function of the id, so
    :func:`extract_audio_features` is value-checkable in plain SQL).

    Clip spec: mono, 8 kHz, ``400 + id % 100`` samples, every sample
    equal to ``100 + id % 900`` — so peak == rms == that amplitude
    exactly (constant signal; all quantities < 2^53 keep the float math
    exact)."""

    def _synth(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for rid in pdf[id_col]:
                amp = 100 + int(rid) % 900
                n = 400 + int(rid) % 100
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(
                        np.full(n, amp, dtype=np.int16).tobytes()
                    )
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        _synth, schema="id bigint, payload binary"
    )


def extract_audio_features(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """REAL audio decode: parse PCM WAV payloads with the stdlib
    ``wave`` module (no third-party codec needed, so — unlike the
    PIL/ffmpeg-gated image/video paths — this runs everywhere) and emit
    per-clip features: channel count, sample rate, sample count,
    duration, integer peak, RMS.

    mapInPandas, one Arrow batch at a time; multi-channel clips are
    analyzed over interleaved samples (peak/RMS are channel-agnostic).
    Undecodable or non-WAV payloads yield NULL features — at corpus
    scale dirty bytes are routine, so they are routed, not raised."""

    def _extract(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "n_channels", "sample_rate", "n_samples", "duration_ms",
                "peak", "rms",
            )}
            for payload in pdf[payload_col]:
                try:
                    raw = bytes(payload) if payload is not None else b""
                    with wave.open(io.BytesIO(raw)) as w:
                        nch = w.getnchannels()
                        sw = w.getsampwidth()
                        sr = w.getframerate()
                        n = w.getnframes()
                        frames = w.readframes(n)
                    if sw == 1:  # 8-bit WAV is unsigned, centered at 128
                        x = np.frombuffer(frames, dtype=np.uint8).astype(
                            np.float64
                        ) - 128.0
                    elif sw == 2:
                        x = np.frombuffer(frames, dtype="<i2").astype(np.float64)
                    elif sw == 4:
                        x = np.frombuffer(frames, dtype="<i4").astype(np.float64)
                    else:
                        raise ValueError(f"unsupported sample width {sw}")
                    peak = int(np.max(np.abs(x))) if x.size else 0
                    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                    out["n_channels"].append(nch)
                    out["sample_rate"].append(sr)
                    out["n_samples"].append(n)
                    out["duration_ms"].append(n * 1000 // sr if sr else 0)
                    out["peak"].append(peak)
                    out["rms"].append(rms)
                except Exception:
                    for k in out:
                        out[k].append(None)
            yield pd.DataFrame({"id": pdf[id_col], **out})

    return df.mapInPandas(_extract, schema=AUDIO_SCHEMA)
