"""Multimodal column plumbing (SURVEY.md UD8 / north star): images,
audio, and video ride in DataFrames as opaque ``binary`` payloads with
a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing here — schema, partition sizing, UDF iterator
signature, batch shape — is real and tested.  The actual codec calls
are STUBS: the image/audio libraries are not in this container, so
``decode_image`` raises ``NotImplementedError`` unless a deterministic
fake decoder is requested (tests use the fake).

Scale notes: binary payloads make rows wide — ``mapInPandas``
processes one Arrow batch at a time, so peak executor memory is
``maxRecordsPerBatch × payload size`` regardless of partition row
count; repartition by a size-aware key (e.g. ``bytes // 128MiB``
buckets) before heavy decode stages.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),      # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media(df: DataFrame, payload: Column, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary payload column with the typed metadata struct."""
    return df.withColumn("media", payload.alias("payload")).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col("media")).alias("n_bytes"),
        ),
    )


def _fake_feature(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a real image/audio embedding: byte
    histogram folded into ``dims`` buckets, L1-normalized."""
    acc = [0] * dims
    for i, b in enumerate(payload):
        acc[(b + i) % dims] += b
    total = sum(acc) or 1
    return [v / total for v in acc]


def extract_features(
    df: DataFrame,
    payload_col: str = "media",
    id_col: str = "doc_id",
    dims: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder='fake'`` → deterministic byte-histogram features (tests).
    ``decoder='image'`` → STUB, unconditionally ``NotImplementedError``:
    the real PIL decode path is not written, so it must never silently
    hand back stand-in features as if they were image embeddings.  The
    iterator/batch plumbing below is the real, tested surface.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} decode path is not implemented (stub); "
            "use decoder='fake' for the deterministic stand-in"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_feature(bytes(p) if p is not None else b"", dims)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ]
)


def _require_codec(decoder: str, lib: str) -> None:
    """Non-fake decoders are STUBS: raise unconditionally (a present
    ``lib`` must not flip the operator into silently returning fake
    output as if it were a real decode)."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} decode path is not implemented (stub; "
            f"a real implementation would use {lib}); use decoder='fake' "
            "for the deterministic stand-in"
        )


def resize_images(
    df: DataFrame,
    payload_col: str = "media",
    id_col: str = "doc_id",
    width: int = 32,
    height: int = 32,
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched image resize.  ``decoder='fake'`` produces a
    deterministic stride-sampled byte payload of exactly
    ``width × height`` bytes (padding with zeros when the source is
    smaller) and stamps the target dimensions into the metadata struct
    — the real-codec path (PIL) is stubbed in this container, the batch
    plumbing is identical."""
    _require_codec(decoder, "PIL")
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payload, out_meta = [], []
            for p in pdf[payload_col]:
                raw = bytes(p) if p is not None else b""
                if len(raw) >= target:
                    step = len(raw) / target
                    resized = bytes(raw[int(i * step)] for i in range(target))
                else:
                    resized = raw + b"\x00" * (target - len(raw))
                out_payload.append(resized)
                out_meta.append(
                    {
                        "media_type": "image",
                        "format": "raw",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                        "n_bytes": len(resized),
                    }
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "media": out_payload, "media_meta": out_meta}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str = "media",
    id_col: str = "doc_id",
    n_frames: int = 4,
    decoder: str = "fake",
) -> DataFrame:
    """Video frame sampling: one input row fans out to ``n_frames``
    rows (the UDTF shape, UD4).  ``decoder='fake'`` slices the payload
    into ``n_frames`` contiguous chunks — deterministic byte ranges
    standing in for uniformly-spaced decoded frames; real codecs (
    ffmpeg/av) are stubbed.

    Scale note: the fan-out happens inside ``mapInPandas``, so the
    per-batch memory bound is ``maxRecordsPerBatch × payload``, and no
    shuffle is introduced — downstream per-frame operators see an
    ordinary DataFrame."""
    _require_codec(decoder, "av")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p) if p is not None else b""
                chunk = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc)
                    idxs.append(i)
                    frames.append(raw[i * chunk : (i + 1) * chunk])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)
