"""Multimodal column pattern: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas UDFs (north-star surface).

The container has no image/audio codecs, so the DECODE step is stubbed
(NotImplementedError unless PIL/soundfile import succeeds) — but the
Spark-side plumbing is real and tested: schema, partitioning, Arrow
batch shape, and a deterministic feature extractor (byte-bucket
histogram) that runs through mapInPandas exactly like a production
decoder would.

Scale notes: binary payloads ride in the same row as metadata —
filters on metadata prune before any Python is invoked; mapInPandas
processes Arrow record batches (vectorized, no per-row pickling);
batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("data", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

N_BUCKETS = 4  # byte-value histogram buckets: [0,64) [64,128) [128,192) [192,256)


def attach_media(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque media struct (deterministic stand-in
    for real image/audio bytes)."""
    return docs.withColumn(
        "media",
        F.struct(
            F.col(payload_col).cast("binary").alias("data"),
            F.lit("application/octet-stream").alias("mime"),
            # octet_length, not length: the metadata claims BYTES and
            # multibyte payloads have more UTF-8 bytes than characters
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def decode_image(data: bytes):
    """Decode an image payload.  STUB: codecs are not available in this
    environment; gate on import so real deployments light it up."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(data))
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires PIL; this container has no codecs"
        ) from exc


def sample_frames(data: bytes, every_n: int = 10):
    """Video frame sampling.  STUB — same gating pattern as decode_image."""
    raise NotImplementedError("video codecs not available in this container")


_HIST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("byte_hist", ArrayType(LongType())),
    ]
)


def byte_histogram(media_docs: DataFrame) -> DataFrame:
    """Deterministic feature extraction over binary payloads via
    mapInPandas: per-row histogram of byte values into 4 buckets.

    This is the production decoder's plumbing with a codec-free kernel:
    Arrow batches in, vectorized numpy per batch, Arrow batches out.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            hists = []
            for data in pdf["data"]:
                # NULL payload -> empty buffer (zero histogram), the
                # same zero contribution the SQL oracle's NULL-skipping
                # sums produce
                arr = (
                    np.frombuffer(data, dtype=np.uint8)
                    if data is not None
                    else np.zeros(0, np.uint8)
                )
                hist = np.bincount(arr >> 6, minlength=N_BUCKETS)[:N_BUCKETS]
                hists.append(hist.astype("int64").tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "byte_hist": hists,
                }
            )

    flat = media_docs.select("doc_id", "lang", F.col("media.data").alias("data"))
    return flat.mapInPandas(_extract, schema=_HIST_SCHEMA)


FRAME_BYTES = 32  # bytes sampled per frame
FRAME_STRIDE = 64  # stride between frame starts

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_frames", LongType()),
        StructField("frame_energy", LongType()),
    ]
)


def frame_sample_stats(media_docs: DataFrame) -> DataFrame:
    """Strided frame sampling over binary payloads via mapInPandas —
    the video-frame-extraction plumbing with a codec-free kernel:
    every FRAME_STRIDE bytes, sample a FRAME_BYTES window; emit the
    frame count and the summed byte values ("energy") of the sampled
    windows.  A real deployment swaps the numpy kernel for a decoder
    (see sample_frames stub) — schema, Arrow batching, and the
    metadata-first projection stay identical.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n_frames, energy = [], []
            for data in pdf["data"]:
                arr = (
                    np.frombuffer(data, dtype=np.uint8)
                    if data is not None
                    else np.zeros(0, np.uint8)
                )
                mask = (np.arange(arr.size) % FRAME_STRIDE) < FRAME_BYTES
                n_frames.append((arr.size + FRAME_STRIDE - 1) // FRAME_STRIDE)
                energy.append(int(arr[mask].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "n_frames": n_frames,
                    "frame_energy": energy,
                }
            )

    flat = media_docs.select("doc_id", "lang", F.col("media.data").alias("data"))
    return flat.mapInPandas(_extract, schema=_FRAME_SCHEMA)


def frame_stats_by_lang(media_docs: DataFrame) -> DataFrame:
    """decode→frame-sample→rollup pipeline shape, per language."""
    s = frame_sample_stats(media_docs)
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_frames").alias("total_frames"),
        F.sum("frame_energy").alias("total_energy"),
    )


def byte_histogram_by_lang(media_docs: DataFrame) -> DataFrame:
    """Aggregate the pandas-UDF features per language — the typical
    decode→extract→rollup pipeline shape."""
    h = byte_histogram(media_docs)
    return h.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum(F.element_at("byte_hist", i + 1)).alias(f"b{i}")
            for i in range(N_BUCKETS)
        ],
    )


PCM_CENTER = 64  # deterministic fake-PCM convention: amplitude = byte - 64
# (ASCII payloads span ~32..122, so both signs occur — centering at 128
# would leave every sample negative and zero-crossing degenerate)

_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_samples", LongType()),
        StructField("sq_power", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_signal_stats(media_docs: DataFrame) -> DataFrame:
    """Audio-DSP plumbing with a codec-free kernel: interpret the binary
    payload as PCM samples (amplitude = byte - PCM_CENTER), compute the
    exact integer sum of squared amplitudes and the zero-crossing count
    per payload via vectorized numpy inside mapInPandas.  A real
    deployment decodes with soundfile/librosa in the same kernel slot;
    the Arrow batch shape, metadata-first projection, and integer
    outputs (hash-checkable, no float DSP) stay identical.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n_samples, power, zcr = [], [], []
            for data in pdf["data"]:
                a = (
                    np.frombuffer(data, dtype=np.uint8)
                    if data is not None
                    else np.zeros(0, np.uint8)
                ).astype(np.int64)
                a -= PCM_CENTER
                n_samples.append(a.size)
                power.append(int((a * a).sum()))
                neg = a < 0
                zcr.append(int((neg[:-1] != neg[1:]).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "n_samples": n_samples,
                    "sq_power": power,
                    "zero_crossings": zcr,
                }
            )

    flat = media_docs.select("doc_id", "lang", F.col("media.data").alias("data"))
    return flat.mapInPandas(_extract, schema=_AUDIO_SCHEMA)


def audio_stats_by_lang(media_docs: DataFrame) -> DataFrame:
    """decode→signal-stats→rollup pipeline shape, per language; the
    mean power is the one double division, rounded in both engines."""
    s = audio_signal_stats(media_docs)
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_samples").alias("total_samples"),
        F.sum("sq_power").alias("total_sq_power"),
        F.sum("zero_crossings").alias("total_zero_crossings"),
    ).select(
        "lang",
        "n_docs",
        "total_samples",
        "total_sq_power",
        "total_zero_crossings",
        F.when(
            F.col("total_samples") > 0,
            F.round(
                F.col("total_sq_power").cast("double")
                / F.col("total_samples"),
                4,
            ),
        ).alias("mean_sq_power"),
    )
