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


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Real pure-stdlib image decoder: uncompressed BMP. Parses the
    BITMAPFILEHEADER ('BM', pixel-array offset at byte 10) and
    BITMAPINFOHEADER (width/height/bpp), strips per-row padding (rows
    are 4-byte aligned), and returns the pixel bytes bottom-up as
    stored. Supports the uncompressed 8/24/32-bpp encodings."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    height = abs(height)
    bytes_per_row = width * (bpp // 8)
    stride = (bytes_per_row + 3) // 4 * 4  # rows are 4-byte aligned
    rows = []
    for r in range(height):
        start = pixel_offset + r * stride
        row = payload[start : start + bytes_per_row]
        if len(row) < bytes_per_row:
            raise ValueError("truncated BMP pixel array")
        rows.append(np.frombuffer(row, dtype=np.uint8))
    return np.concatenate(rows) if rows else np.array([], dtype=np.uint8)


def _decode_wav(payload: bytes) -> np.ndarray:
    """Real pure-stdlib audio decoder: PCM WAV. Walks the RIFF chunk
    list, reads the fmt chunk (PCM only), and returns the data chunk's
    samples mapped to uint8 (8-bit passes through; 16-bit is scaled to
    the 0-255 range) so downstream histogram features share one
    domain across codecs."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, fmt_code, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt_code, _channels = struct.unpack_from("<HH", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_code is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt_code != 1:
        raise ValueError(f"non-PCM WAV (format {fmt_code}) unsupported")
    if bits == 8:
        return np.frombuffer(data, dtype=np.uint8)
    if bits == 16:
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        return ((samples.astype(np.int32) + 32768) // 256).astype(np.uint8)
    raise ValueError(f"unsupported WAV bit depth {bits}")


def _decode_png(payload: bytes) -> np.ndarray:
    """Real pure-stdlib image decoder: PNG (VERDICT r2 #5). Parses the
    chunk list, inflates the concatenated IDAT stream with stdlib
    zlib, reverses the per-scanline filters (None/Sub/Up/Average/
    Paeth), and returns the raw pixel bytes top-down — the same uint8
    domain as the BMP/WAV decoders. Supports 8-bit depth in greyscale,
    RGB, palette-indexed (indices returned as-is), grey+alpha, and
    RGBA color types; interlacing is rejected."""
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    if len(payload) < 8 or payload[:8] != sig:
        raise ValueError("not a PNG payload (missing signature)")
    pos, width = 8, None
    idat = bytearray()
    first_chunk = True
    while pos + 8 <= len(payload):
        size, ctype = struct.unpack_from(">I4s", payload, pos)
        if pos + 8 + size > len(payload):
            raise ValueError(
                f"PNG chunk {ctype!r} length {size} overruns payload "
                f"({len(payload)} bytes)"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if first_chunk and ctype != b"IHDR":
            raise ValueError(f"PNG first chunk must be IHDR, got {ctype!r}")
        first_chunk = False
        if ctype == b"IHDR":
            if size < 13:
                raise ValueError(f"truncated PNG IHDR ({size} bytes)")
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack_from(">IIBBBBB", body, 0)
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in (0, 2, 3, 4, 6):
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + body + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    bpp = channels  # bytes per pixel at 8-bit depth
    stride = width * bpp
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.empty(height * stride, dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        base = r * (stride + 1)
        filt = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1)
        cur = line.astype(np.int32)
        if filt == 0:  # None
            cur = cur % 256
        elif filt == 1:  # Sub: left neighbor, sequential per pixel
            cur = cur.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) % 256
        elif filt == 2:  # Up
            cur = (cur + prev) % 256
        elif filt == 3:  # Average
            cur = cur.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (left + int(prev[i])) // 2) % 256
        elif filt == 4:  # Paeth
            cur = cur.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {filt}")
        prev = cur.astype(np.uint8)
        out[r * stride : (r + 1) * stride] = prev
    return out


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
    "image/bmp": _decode_bmp,
    "audio/wav": _decode_wav,
    "image/png": _decode_png,
    # genuinely need external codec libraries — stubbed, registry stays
    # pluggable
    "image/jpeg": _decode_stub("image/jpeg"),
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
