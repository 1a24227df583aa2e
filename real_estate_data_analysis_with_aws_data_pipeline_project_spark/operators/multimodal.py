"""Multimodal column plumbing ([ext] — SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signature, partitioning — is real and tested; the actual
media decoding is stubbed (the image/audio libraries are not in this
container): ``decode_payload`` raises NotImplementedError for media
formats and implements the deterministic ``utf8-text`` codec, which is
enough to exercise the full pipeline shape end-to-end.

At scale: payloads live in parquet binary columns (or object-store
pointers for >100 MB blobs); feature extraction is an Arrow-batched
mapInPandas over whatever partitioning the upstream scan has — no
shuffle, embarrassingly parallel, the decode library is imported once
per executor, not per row.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HISTOGRAM_BINS = 16

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


# --- decoder registry ------------------------------------------------------


def _decode_utf8_text(payload: bytes) -> np.ndarray:
    """The one real codec: byte stream → byte array (stands in for
    pixels/samples)."""
    return np.frombuffer(payload, dtype=np.uint8)


def _decode_stub(media_format: str) -> Callable[[bytes], np.ndarray]:
    def _raise(payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"decode for media format {media_format!r} requires the "
            f"corresponding media library (not in this container); "
            f"plug a decoder into DECODERS to enable it"
        )

    return _raise


DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "utf8-text": _decode_utf8_text,
    "image/png": _decode_stub("image/png"),
    "image/jpeg": _decode_stub("image/jpeg"),
    "audio/wav": _decode_stub("audio/wav"),
    "video/mp4": _decode_stub("video/mp4"),
}


# --- operators -------------------------------------------------------------


def pack_payloads(docs: DataFrame) -> DataFrame:
    """documents → multimodal payload table: text encoded as the
    binary payload plus a typed metadata struct (n_bytes, md5
    checksum, source). Pure column expressions."""
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.lit("utf8-text").alias("media_format"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for doc_id, fmt, payload in zip(
        pdf["doc_id"], pdf["media_format"], pdf["payload"]
    ):
        decoder = DECODERS.get(fmt)
        if decoder is None:
            raise KeyError(f"no decoder registered for {fmt!r}")
        arr = decoder(bytes(payload))
        # deterministic fake feature vector: 16-bin byte histogram
        # (density) + mean/std byte value — the plumbing contract any
        # real extractor (resnet embedding, mel spectrogram stats,
        # frame sample hashes) would follow
        hist, _ = np.histogram(arr, bins=N_HISTOGRAM_BINS, range=(0, 256))
        n = max(len(arr), 1)
        features = np.concatenate(
            [hist / n, [float(arr.mean()) if len(arr) else 0.0,
                        float(arr.std()) if len(arr) else 0.0]]
        )
        rows.append((int(doc_id), fmt, int(len(arr)), features.tolist()))
    return pd.DataFrame(
        rows, columns=["doc_id", "media_format", "n_bytes", "features"]
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload partitions
    (mapInPandas: batch iterator in, batch iterator out — decode
    state initialized once per partition)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    cols = payloads.select("doc_id", "media_format", "payload")
    return cols.mapInPandas(fn, schema=FEATURES_SCHEMA)


# --- frame sampling --------------------------------------------------------

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(
    payloads: DataFrame,
    frame_bytes: int = 32,
    every_k: int = 4,
    resize_to: int | None = 16,
) -> DataFrame:
    """Frame sampling + resize over opaque media payloads: the payload
    is chunked into fixed-size 'frames' (stand-in for video frame
    decode — a real codec plugs into DECODERS), every k-th frame is
    kept, and each kept frame is 'resized' (truncated/zero-padded) to
    `resize_to` bytes. One input row explodes into O(payload/frame/k)
    output rows — mapInPandas streams Arrow batches, so a huge payload
    column never materializes on any single buffer."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for idx in range(0, max(len(data), 1) // frame_bytes + 1):
                    if idx % every_k:
                        continue
                    frame = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    if not frame:
                        continue
                    if resize_to is not None:
                        frame = frame[:resize_to].ljust(resize_to, b"\x00")
                    rows.append(
                        (
                            int(doc_id),
                            idx,
                            frame,
                            hashlib.md5(frame).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame", "frame_checksum"]
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        fn, schema=FRAMES_SCHEMA
    )
