"""Deeper semantic tests for the [ext] operators beyond the oracle
hash: invariants the SQL comparison can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.multimodal import (
    DECODERS,
    N_HISTOGRAM_BINS,
)


def test_minhash_candidates_superset_of_high_jaccard(spark, sf_dir):
    """Every exact-Jaccard≥0.5 pair (within the baseline's cap) must be
    found by the MinHash-LSH path: LSH recall on clear near-dups."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    missed = exact - lsh
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    """Near-dup doc pairs (jaccard≥0.5) should land within hamming≤3
    on the 16-bit simhash."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    sim = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_simhash_pairs"].fn(spark, sf_dir).collect()
    }
    assert exact
    found = exact & sim
    assert len(found) >= len(exact) * 0.8, (
        f"simhash found {len(found)}/{len(exact)} near-dup pairs"
    )


def test_ann_lsh_results_subset_of_bruteforce_candidates(spark, sf_dir):
    """ANN results must be genuine corpus vectors with correct cosine:
    every (query, neighbor, cos) from the LSH path must appear in the
    brute-force scored set with the same cosine value."""
    brute = QUERIES["similarity_topk_bruteforce"].fn(spark, sf_dir)
    ann = QUERIES["similarity_ann_lsh"].fn(spark, sf_dir)
    assert ann.count() > 0
    # ANN top-1-per-query cosine can't exceed brute-force top-1
    b1 = {
        r.query_id: r.cos_sim
        for r in brute.filter("cos_sim is not null").groupBy("query_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .collect()
    }
    a1 = {
        r.query_id: r.cos_sim
        for r in ann.groupBy("query_id").agg(F.max("cos_sim").alias("cos_sim")).collect()
    }
    for q, cos in a1.items():
        assert cos <= b1[q] + 1e-9


@pytest.mark.parametrize(
    "ann_name,floor",
    [
        ("similarity_ann_lsh", 0.5),
        ("similarity_ivf_topk", 0.8),
        ("similarity_pq_topk", 0.6),
        # int8 SQ is near-lossless on this corpus (measured 1.0)
        ("similarity_sq_int8_topk", 0.9),
    ],
)
def test_ann_recall_floor_at_sf01(spark, ann_name, floor):
    """VERDICT r1 #3/#4: the ANN paths must hold a recall floor vs the
    exact brute-force top-k at sf0.1 (deterministic: measured 0.80 for
    the 12-table Gaussian sign-LSH, 0.96 for the Lloyd-trained IVF,
    0.74 for PQ with ADC shortlist + exact re-rank)."""
    sf = "/root/testdata/sf0.1"
    brute = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_topk_bruteforce"].fn(spark, sf).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES[ann_name].fn(spark, sf).collect()
    }
    recall = len(ann & brute) / len(brute)
    assert recall >= floor, f"{ann_name} recall {recall:.2f} < floor {floor}"


def _tiny_bmp() -> bytes:
    """2x2 24-bpp BMP, rows padded to 4 bytes, known pixel values."""
    import struct

    width, height, bpp = 2, 2, 24
    stride = (width * 3 + 3) // 4 * 4
    pixels = bytes([10, 20, 30, 40, 50, 60]) + b"\x00\x00"  # bottom row + pad
    pixels += bytes([70, 80, 90, 100, 110, 120]) + b"\x00\x00"  # top row + pad
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0,
                       len(pixels), 0, 0, 0, 0)
    return header + info + pixels


def _tiny_wav(bits: int = 16) -> bytes:
    """PCM WAV with 4 known samples."""
    import struct

    if bits == 16:
        data = struct.pack("<4h", -32768, 0, 256, 32767)
    else:
        data = bytes([0, 128, 200, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * bits // 8, bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_media_decoders_bmp_and_wav():
    """VERDICT r1 #9: two real stdlib codecs behind the registry."""
    import numpy as np

    bmp = DECODERS["image/bmp"](_tiny_bmp())
    assert bmp.tolist() == [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    wav = DECODERS["audio/wav"](_tiny_wav(16))
    assert wav.tolist() == [0, 128, 129, 255]  # int16 → uint8 scaling
    wav8 = DECODERS["audio/wav"](_tiny_wav(8))
    assert wav8.tolist() == [0, 128, 200, 255]
    with pytest.raises(ValueError):
        DECODERS["image/bmp"](b"NOTABMP")
    with pytest.raises(ValueError):
        DECODERS["audio/wav"](b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        DECODERS["image/jpeg"](b"\xff\xd8\xff")  # SOI but no SOF/SOS
    assert isinstance(bmp, np.ndarray) and bmp.dtype == np.uint8


def _encode_png(pixels, width, height, color, filters):
    """Minimal PNG writer for the roundtrip test: encodes ``pixels``
    (row-major uint8) with the given per-row filter types, so the
    decoder's un-filtering of every filter (0-4) is exercised against
    a known image."""
    import struct
    import zlib

    import numpy as np

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = width * channels
    px = np.asarray(pixels, dtype=np.uint8).reshape(height, stride).astype(int)
    raw = bytearray()
    prev = np.zeros(stride, dtype=int)
    for r in range(height):
        cur = px[r]
        enc = np.empty(stride, dtype=int)
        f = filters[r % len(filters)]
        for i in range(stride):
            a = cur[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (cur[i] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype("uint8").tobytes())
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("color,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_decoder_roundtrip_all_filters(color, channels):
    """VERDICT r2 #5: the stdlib-zlib PNG decoder reverses every
    scanline filter type (None/Sub/Up/Average/Paeth) across the 8-bit
    color types, returning the same uint8 domain as BMP/WAV."""
    import numpy as np

    rng = np.random.RandomState(7 + color)
    width, height = 5, 6
    pixels = rng.randint(0, 256, size=height * width * channels).astype(np.uint8)
    for filters in [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]]:
        png = _encode_png(pixels, width, height, color, filters)
        out = DECODERS["image/png"](png)
        assert out.dtype == np.uint8
        assert out.tolist() == pixels.tolist(), (color, filters)


def test_png_decoder_rejects_malformed():
    with pytest.raises(ValueError):
        DECODERS["image/png"](b"\x89PNG")  # truncated signature
    with pytest.raises(ValueError):
        DECODERS["image/png"](b"NOTAPNGPAYLOAD")
    import struct
    import zlib as _z

    # 16-bit depth is rejected loudly, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    body = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", _z.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(ValueError):
        DECODERS["image/png"](b"\x89PNG\r\n\x1a\n" + body)


def test_png_decoder_rejects_chunk_order_and_bounds():
    """ADVICE r3: IDAT-before-IHDR, truncated IHDR, and oversized chunk
    lengths must raise the registry's ValueError contract, never
    NameError/struct.error or a silent truncated slice."""
    import struct
    import zlib as _z

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", _z.crc32(ctype + body))
        )

    # IDAT before IHDR: channels/height would be unbound without the guard
    with pytest.raises(ValueError, match="first chunk must be IHDR"):
        DECODERS["image/png"](sig + chunk(b"IDAT", _z.compress(b"\x00\x00")))

    # truncated IHDR body (5 of 13 bytes)
    with pytest.raises(ValueError, match="truncated PNG IHDR"):
        DECODERS["image/png"](sig + chunk(b"IHDR", b"\x00" * 5))

    # declared chunk length overruns the payload
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    oversized = struct.pack(">I", 10_000) + b"IDAT" + b"\x01\x02"
    with pytest.raises(ValueError, match="overruns payload"):
        DECODERS["image/png"](sig + chunk(b"IHDR", ihdr) + oversized)


def test_extract_features_across_six_codecs(spark):
    """The mapInPandas feature extractor handles heterogeneous media
    formats in one batch — utf8 text, BMP image, PCM WAV audio,
    zlib-inflated PNG (r3), and baseline JPEG + MP4-demuxed sample
    bytes (r4)."""
    import struct as _struct

    import numpy as np

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.multimodal import (
        extract_features,
    )

    png_px = np.arange(2 * 2 * 3, dtype=np.uint8) * 9
    jpg_px = np.tile(np.arange(8, dtype=np.uint8) * 30, (8, 1)).reshape(8, 8, 1)
    mp4 = (
        _struct.pack(">I4s", 8 + 16, b"ftyp") + b"isom\x00\x00\x02\x00isomiso2"
        + _struct.pack(">I4s", 8 + 4, b"moov") + b"mvhd"
        + _struct.pack(">I4s", 8 + 6, b"mdat") + b"\x01\x02\x03\x04\x05\x06"
    )
    rows = [
        (1, "utf8-text", bytearray(b"hello world")),
        (2, "image/bmp", bytearray(_tiny_bmp())),
        (3, "audio/wav", bytearray(_tiny_wav(16))),
        (4, "image/png", bytearray(_encode_png(png_px, 2, 2, 2, [4]))),
        (5, "image/jpeg", bytearray(_encode_jpeg(jpg_px, 8, 8, 1))),
        (6, "video/mp4", bytearray(mp4)),
    ]
    payloads = spark.createDataFrame(
        rows, "doc_id long, media_format string, payload binary"
    )
    out = {r.doc_id: r for r in extract_features(payloads).collect()}
    assert out[1].n_bytes == 11
    assert out[2].n_bytes == 12  # 2x2x3 pixels, padding stripped
    assert out[3].n_bytes == 4
    assert out[4].n_bytes == 12  # 2x2x3 decoded pixels, like the BMP
    assert out[5].n_bytes == 64  # 8x8 grayscale JPEG pixels
    assert out[6].n_bytes == 6  # mdat sample bytes
    for r in out.values():
        assert len(r.features) == N_HISTOGRAM_BINS + 2
        assert abs(sum(r.features[:N_HISTOGRAM_BINS]) - 1.0) < 1e-9


def test_multimodal_features_shape_and_determinism(spark, sf_dir):
    df = QUERIES["multimodal_features"].fn(spark, sf_dir)
    rows = df.collect()
    n_docs = QUERIES["multimodal_payload_meta"].fn(spark, sf_dir).count()
    assert len(rows) == n_docs
    for r in rows[:20]:
        assert len(r.features) == N_HISTOGRAM_BINS + 2
        assert abs(sum(r.features[:N_HISTOGRAM_BINS]) - 1.0) < 1e-9
    again = {r.doc_id: r.features for r in df.collect()}
    for r in rows[:20]:
        assert again[r.doc_id] == r.features


def test_multimodal_media_decoder_malformed_contract():
    """All five registered codecs raise ValueError on malformed
    payloads (png r3; jpeg + mp4 container demux gained real
    implementations in r4)."""
    with pytest.raises(ValueError):
        DECODERS["image/jpeg"](b"\xff\xd8\xff")  # no SOF/SOS
    with pytest.raises(ValueError):
        DECODERS["video/mp4"](b"\x00\x00\x00\x18ftyp")  # box overruns
    with pytest.raises(ValueError):
        DECODERS["video/mp4"](b"\x00\x00\x00\x08free")  # first box not ftyp


def _encode_jpeg(pixels, width, height, ncomp):
    """Minimal baseline JPEG encoder (test-side twin of _decode_jpeg):
    flat quant table, 4:4:4, one shared DC + AC huffman table built
    canonically over the symbols actually emitted."""
    import struct

    import numpy as np

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.multimodal import (
        _ZIGZAG,
        _idct_matrix,
    )

    M = _idct_matrix()
    Q = 16.0
    px = np.asarray(pixels, dtype=np.float64).reshape(height, width, ncomp)
    if ncomp == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        planes = [y, (b - y) / 1.772 + 128.0, (r - y) / 1.402 + 128.0]
    else:
        planes = [px[..., 0]]
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = []
    for p in planes:
        pp = np.zeros((bh * 8, bw * 8))
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]  # edge-replicate padding
        pp[:, width:] = pp[:, width - 1 : width]
        padded.append(pp)

    def block_symbols():
        """Yield per-MCU per-component (dc_size, dc_val, ac_list)."""
        pred = [0] * ncomp
        for by in range(bh):
            for bx in range(bw):
                for ci in range(ncomp):
                    blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    d = M @ (blk - 128.0) @ M.T
                    qc = np.round(d / Q).astype(int)
                    zz = [int(qc.flat[_ZIGZAG[i]]) for i in range(64)]
                    diff = zz[0] - pred[ci]
                    pred[ci] = zz[0]
                    ac = []
                    run = 0
                    last_nz = 0
                    for k in range(1, 64):
                        if zz[k] != 0:
                            last_nz = k
                    for k in range(1, last_nz + 1):
                        if zz[k] == 0:
                            run += 1
                            if run == 16:
                                ac.append((0xF0, 0, 0))  # ZRL
                                run = 0
                        else:
                            s = abs(zz[k]).bit_length()
                            ac.append(((run << 4) | s, zz[k], s))
                            run = 0
                    if last_nz < 63:
                        ac.append((0x00, 0, 0))  # EOB
                    yield ci, diff, ac

    dc_syms, ac_syms = set(), set()
    for _, diff, ac in block_symbols():
        dc_syms.add(abs(diff).bit_length())
        for sym, _, _ in ac:
            ac_syms.add(sym)

    def canonical(symbols):
        """All symbols at one code length L with 2^L > n: prefix-free,
        canonical, and the all-ones maximum code stays unused."""
        syms = sorted(symbols)
        L = max(2, len(syms).bit_length() + 1)
        bits = [0] * 16
        bits[L - 1] = len(syms)
        enc = {s: (L, i) for i, s in enumerate(syms)}
        return bits, syms, enc

    dc_bits, dc_vals, dc_enc = canonical(dc_syms)
    ac_bits, ac_vals, ac_enc = canonical(ac_syms)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (flat table, id 0) — values emitted in zigzag index order
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([int(Q)] * 64)
    # SOF0
    body = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        body += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
    # DHT: DC table 0 then AC table 0
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    body = bytes([ncomp])
    for c in range(ncomp):
        body += bytes([c + 1, 0x00])
    body += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    buf, nbits = 0, 0
    data = bytearray()

    def put(code, length):
        nonlocal buf, nbits
        buf = (buf << length) | code
        nbits += length
        while nbits >= 8:
            byte = (buf >> (nbits - 8)) & 0xFF
            data.append(byte)
            if byte == 0xFF:
                data.append(0x00)
            nbits -= 8
            buf &= (1 << nbits) - 1

    def put_val(v, s):
        if s == 0:
            return
        put(v if v >= 0 else v + (1 << s) - 1, s)

    for _, diff, ac in block_symbols():
        s = abs(diff).bit_length()
        L, code = dc_enc[s]
        put(code, L)
        put_val(diff, s)
        for sym, val, size in ac:
            L, code = ac_enc[sym]
            put(code, L)
            put_val(val, size)
    if nbits:
        put(((1 << (8 - nbits)) - 1), 8 - nbits)  # pad with 1s
    out += data + b"\xff\xd9"
    return bytes(out)


def test_jpeg_decoder_roundtrip():
    """r4: real baseline JPEG decoder — encode a known pattern with the
    minimal test encoder, decode with the registry decoder, and bound
    the reconstruction error by the flat quantization step."""
    import numpy as np

    rng = np.random.RandomState(7)
    w, h = 24, 16
    # smooth gradient + mild noise (JPEG-friendly content)
    yy, xx = np.mgrid[0:h, 0:w]
    gray = (xx * 6 + yy * 4 + rng.randint(0, 8, (h, w))).clip(0, 255)
    payload = _encode_jpeg(gray.reshape(h, w, 1).astype(np.uint8), w, h, 1)
    got = DECODERS["image/jpeg"](payload).reshape(h, w).astype(int)
    err = np.abs(got - gray)
    assert err.max() <= 24, f"gray max err {err.max()}"
    assert err.mean() <= 6, f"gray mean err {err.mean()}"

    rgb = np.stack(
        [
            (xx * 9).clip(0, 255),
            (yy * 11).clip(0, 255),
            ((xx + yy) * 5).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    payload = _encode_jpeg(rgb, w, h, 3)
    got = DECODERS["image/jpeg"](payload).reshape(h, w, 3).astype(int)
    err = np.abs(got - rgb.astype(int))
    assert err.max() <= 32, f"rgb max err {err.max()}"
    assert err.mean() <= 8, f"rgb mean err {err.mean()}"
    # determinism
    assert np.array_equal(
        DECODERS["image/jpeg"](payload), DECODERS["image/jpeg"](payload)
    )


def test_mp4_demux_roundtrip():
    """r4: the ISO-BMFF demuxer returns exactly the mdat sample bytes
    of a synthesized box tree, 64-bit largesize included."""
    import struct

    import numpy as np

    samples = bytes(range(64)) * 3

    def box(btype, body):
        return struct.pack(">I4s", 8 + len(body), btype) + body

    tree = (
        box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + box(b"moov", box(b"mvhd", b"\x00" * 100))
        + box(b"mdat", samples[:100])
        # second mdat via 64-bit largesize
        + struct.pack(">I4sQ", 1, b"mdat", 16 + len(samples) - 100)
        + samples[100:]
    )
    got = DECODERS["video/mp4"](tree)
    assert isinstance(got, np.ndarray) and got.dtype == np.uint8
    assert bytes(got.tobytes()) == samples


def test_mp4_rawvideo_end_to_end():
    """VERDICT r4 #8: one complete video path without external libs —
    demux a synthesized MP4 whose mdat carries the RAW0 uncompressed
    sample stream, decode to pixels, and compare to the source frames.
    The mdat is split across two boxes to prove the decode runs over
    the demuxer's reassembled elementary stream."""
    import struct

    import numpy as np

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (3, 4, 5, 2)).astype(np.uint8)  # 3×(h4,w5,c2)
    stream = (
        b"RAW0" + struct.pack(">HHB", 5, 4, 2) + frames.tobytes()
    )

    def box(btype, body):
        return struct.pack(">I4s", 8 + len(body), btype) + body

    tree = (
        box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + box(b"moov", box(b"mvhd", b"\x00" * 100))
        + box(b"mdat", stream[:17])
        + box(b"mdat", stream[17:])
    )
    got = DECODERS["video/mp4;codecs=raw"](tree)
    assert got.dtype == np.uint8
    assert np.array_equal(got, np.frombuffer(frames.tobytes(), dtype=np.uint8))

    # malformed: wrong magic, zero geometry, ragged frame tail
    with pytest.raises(ValueError):
        DECODERS["video/mp4;codecs=raw"](
            box(b"ftyp", b"isom") + box(b"moov", b"") + box(b"mdat", b"NOPE" + b"\x00" * 9)
        )
    with pytest.raises(ValueError):
        DECODERS["video/mp4;codecs=raw"](
            box(b"ftyp", b"isom")
            + box(b"moov", b"")
            + box(b"mdat", b"RAW0" + struct.pack(">HHB", 0, 4, 2))
        )
    with pytest.raises(ValueError):
        DECODERS["video/mp4;codecs=raw"](
            box(b"ftyp", b"isom")
            + box(b"moov", b"")
            + box(b"mdat", b"RAW0" + struct.pack(">HHB", 5, 4, 2) + b"\x01" * 39)
        )


def test_streaming_matches_batch_tumbling(spark, sf_dir):
    """The streaming tumbling aggregation must agree with the batch
    events_tumbling_window query on the same data."""
    batch = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in QUERIES["events_tumbling_window"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in QUERIES["streaming_tumbling_counts"].fn(spark, sf_dir).collect()
    }
    assert batch == stream


def test_streaming_stateful_totals(spark, sf_dir):
    """VERDICT r2 #8: the applyInPandasWithState job's FULL row
    (count, rounded sum, max — not just the count) must equal the
    batch aggregation of the same events."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    stats = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in QUERIES["streaming_stateful_user_stats"].fn(spark, sf_dir).collect()
    }
    expected = {
        r.user_id: (r.n, r.total, r.mx)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert stats == expected


def test_streaming_matches_batch_session_window(spark, sf_dir):
    """VERDICT r2 #8: streaming session windows (complete mode,
    availableNow) must equal the oracle-green batch
    events_session_window twin row-for-row on the shared columns."""
    batch = {
        (r.user_id, r.session_start_us, r.session_end_us): r.n_events
        for r in QUERIES["events_session_window"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r.user_id, r.session_start_us, r.session_end_us): r.n_events
        for r in QUERIES["streaming_session_window"].fn(spark, sf_dir).collect()
    }
    assert stream == batch


def test_streaming_interval_join_matches_batch(spark, sf_dir):
    """VERDICT r3 #8: the stream-stream interval join (availableNow,
    append mode, watermarked both sides) must emit exactly the rows of
    the equivalent BATCH interval join — pinning the streaming path
    itself, not just the DuckDB oracle of the registered query."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = {
        (r.user_id, r.click_id, r.purchase_id): r.gap_seconds
        for r in clicks.join(
            purchases,
            F.expr(
                "user_id = p_user AND p_ts >= c_ts "
                "AND p_ts <= c_ts + INTERVAL 30 MINUTES"
            ),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000")
            .cast("bigint")
            .alias("gap_seconds"),
        )
        .collect()
    }
    stream = {
        (r.user_id, r.click_id, r.purchase_id): r.gap_seconds
        for r in QUERIES["streaming_click_purchase_join"].fn(spark, sf_dir).collect()
    }
    assert stream == batch


def test_streaming_tws_matches_batch(spark, sf_dir):
    """transformWithStateInPandas (Spark 4.1): the per-user activity
    profile (distinct event types, event count, max event time) must
    equal the batch aggregation — integer-exact, no float channel."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    stream = {
        r.user_id: (r.n_event_types, r.n_events, r.max_ts_us)
        for r in QUERIES["streaming_user_activity_tws"].fn(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.nt, r.n, r.mx)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.countDistinct("event_type").alias("nt"),
            F.count("*").alias("n"),
            F.max(F.unix_micros("ts")).alias("mx"),
        )
        .collect()
    }
    assert stream == batch


def test_streaming_ohlc_matches_batch(spark, sf_dir):
    """VERDICT r6 #6: the watermarked min_by/max_by streaming OHLC job
    must equal the batch events_ohlc_bars twin row-for-row — pinning
    the streaming path itself (not just the shared DuckDB oracle)
    under local testdata regeneration, like the other five
    equals-batch streaming tests."""
    key = lambda r: (r.event_type, r.bar_start)  # noqa: E731
    val = lambda r: (r.open, r.high, r.low, r.close, r.n_events)  # noqa: E731
    batch = {
        key(r): val(r)
        for r in QUERIES["events_ohlc_bars"].fn(spark, sf_dir).collect()
    }
    stream = {
        key(r): val(r)
        for r in QUERIES["streaming_ohlc_bars"].fn(spark, sf_dir).collect()
    }
    assert stream == batch


def test_documents_corpus_ascii_nonempty_invariant(spark, sf_dir):
    """ADVICE r6: the multimodal audit oracles equate DuckDB's
    codepoint-based length()/ascii() with the Spark side's byte-based
    feature extraction over the utf8 payload. That equivalence only
    holds for a non-empty ASCII corpus — pin it so a testdata
    regeneration that breaks it fails HERE with a readable message,
    not as an opaque oracle hash mismatch."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    bad = docs.where(
        (F.length("text") == 0)
        | (F.length("text") != F.octet_length("text"))
    ).count()
    assert bad == 0, (
        f"{bad} documents are empty or non-ASCII; the multimodal audit "
        "oracles (queries_multimodal.py) assume byte==codepoint and "
        "exclude empties — revisit them before trusting the driver row"
    )


def test_frame_sampling_shape(spark, sf_dir):
    df = QUERIES["multimodal_frame_sample"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows, "no frames sampled"
    for r in rows[:50]:
        assert r.frame_idx % 4 == 0  # every_k sampling
        assert len(r.frame) == 16  # resize contract
        assert len(r.frame_checksum) == 32
    # deterministic across runs
    again = df.collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_streaming_foreach_batch_exactly_once_sink(spark, sf_dir, tmp_path):
    """foreachBatch: idempotent parquet sink keyed by epoch — the
    exactly-once pattern for non-transactional sinks."""
    import os

    from pyspark.sql import functions as F
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.streaming.jobs import (
        _events_stream,
    )

    out = str(tmp_path / "fb_out")

    def write_epoch(batch_df, epoch_id):
        # epoch-keyed overwrite => re-delivered batches land in the
        # same directory instead of duplicating rows
        batch_df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_epoch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert os.path.exists(out)
    back = {r.event_type: r.n for r in spark.read.parquet(out).collect()}
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    expected = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert back == expected


def test_ivf_top1_bounded_by_bruteforce(spark, sf_dir):
    """IVF results are genuine neighbors: per-query best cosine can't
    exceed the brute-force best."""
    brute = {
        r.query_id: r.cos_sim
        for r in QUERIES["similarity_topk_bruteforce"].fn(spark, sf_dir)
        .groupBy("query_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .collect()
    }
    ivf = {
        r.query_id: r.cos_sim
        for r in QUERIES["similarity_ivf_topk"].fn(spark, sf_dir)
        .groupBy("query_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .collect()
    }
    assert ivf, "IVF returned nothing"
    for q, cos in ivf.items():
        assert cos <= brute[q] + 1e-9


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermarked aggregation over two micro-batches:
    batch 2 carries an event far older than the advanced watermark —
    its window was already finalized, so the late row must not appear
    in (or alter) the emitted results."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = str(tmp_path / "stream_src")
    on_time = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:05:00", "2024-01-01 00:10:00",
                 "2024-01-01 02:00:00"]
            ),
            "v": [1.0, 2.0, 3.0],
        }
    )
    late = pd.DataFrame(
        {
            # watermark after batch 1 = 02:00 - 10min = 01:50 →
            # the 00:20 event lands in an already-finalized window
            "ts": pd.to_datetime(["2024-01-01 00:20:00",
                                  "2024-01-01 02:30:00"]),
            "v": [100.0, 4.0],
        }
    )
    spark.createDataFrame(on_time).coalesce(1).write.parquet(f"{src}/b1")
    schema = spark.read.parquet(f"{src}/b1").schema
    checkpoint = str(tmp_path / "wm_ckpt")

    def run_once(name):
        collected = {}

        def sink(batch_df, epoch_id):
            for r in batch_df.collect():
                collected[r.h] = r.total

        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.sum("v").alias("total"))
            .select(F.date_format("w.start", "HH:mm").alias("h"), "total")
        )
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(sink)  # memory sink cannot recover checkpoints
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return collected

    # run 1: only on-time data → watermark in the checkpoint advances
    # to 02:00 - 10min = 01:50, past the 00:00-01:00 window's end
    out1 = run_once("wm_out_1")
    # run 2 (same checkpoint): the 00:20 late row targets a window the
    # watermark already finalized → it must be dropped
    spark.createDataFrame(late).coalesce(1).write.parquet(f"{src}/b2")
    out2 = run_once("wm_out_2")

    merged = {**out1, **out2}
    assert merged.get("00:00") == 3.0, (out1, out2)  # late 100 excluded
    for v in list(out1.values()) + list(out2.values()):
        assert v not in (100.0, 103.0), (out1, out2)


def test_quant_sizing_twins_agree_cross_engine():
    """VERDICT r2 #2: the Python quantizer-sizing twins must agree with
    the oracle's SQL forms for every n, INCLUDING power-of-four corpus
    sizes where a float log2 formula could diverge in the last ulp."""
    import duckdb

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _TRAIN_TARGET,
        _quant_k,
        _quant_k_sql,
        _train_thresh_hex,
    )

    con = duckdb.connect()
    ns = [1, 2, 100, 255, 256, 257, 500, 1023, 1024, 1025, 2000, 4096,
          16384, 65536, 1 << 20, 1 << 24, 10**9]
    for n in ns:
        for kmin, kmax in [(16, 4096), (16, 256)]:
            sql_k = con.execute(
                f"SELECT {_quant_k_sql(str(n), kmin, kmax)}"
            ).fetchone()[0]
            py_k = _quant_k(n, kmin, kmax)
            assert sql_k == py_k, (n, kmin, kmax, sql_k, py_k)
            assert py_k * py_k >= min(n, kmax * kmax)  # ≈√n invariant
        sql_th = con.execute(
            f"""SELECT CASE WHEN {n} <= {_TRAIN_TARGET} THEN NULL
                ELSE printf('%04x',
                     CAST(floor(65536.0 * {_TRAIN_TARGET} / {n}) AS INT))
                END"""
        ).fetchone()[0]
        assert sql_th == _train_thresh_hex(n), (n, sql_th)


def test_simhash_band_sizing_twins_agree_cross_engine(spark):
    """Round-3 scale fix: adaptive simhash band width. The Python
    ladder, the oracle's SQL CASE ladder, and both engines' cyclic
    window extraction must agree for every n — including the w>12
    widths no current test corpus reaches (the driver only exercises
    w=12, so this is the only check on the wide-corpus arms)."""
    import duckdb

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_dedup import (
        _SIMHASH_TABLES,
        _simhash_band_bits,
        _simhash_band_bits_sql,
        _simhash_band_starts,
        simhash_band_keys,
    )

    con = duckdb.connect()
    ns = [1, 2, 500, 5000, 8191, 8192, 8193, 10**4, 4 * 10**4, 10**6,
          10**9, 1 << 40, 1 << 49, 1 << 60]
    for n in ns:
        sql_w = con.execute(
            f"SELECT {_simhash_band_bits_sql(str(n))}"
        ).fetchone()[0]
        py_w = _simhash_band_bits(n)
        assert sql_w == py_w, (n, sql_w, py_w)
        assert 12 <= py_w <= 48
        if py_w < 48:
            # bounded-candidates invariant: 5 tables × n²/2^(w+1) ≤ 5n
            assert (1 << (py_w + 1)) >= min(n, 1 << 49)

    sig = format(0x9E3779B97F4A7C15, "064b")  # fixed 64-bit pattern
    for w in (12, 13, 16, 31, 48):
        starts = _simhash_band_starts(w)
        assert len(set(starts)) == _SIMHASH_TABLES, (w, starts)
        expected = [(sig * 2)[s - 1 : s - 1 + w] for s in starts]
        sql_vals = [
            con.execute(
                f"SELECT substr('{sig}' || '{sig}', "
                f"({i} * {w}) % 64 + ({i} * {w}) // 64 + 1, {w})"
            ).fetchone()[0]
            for i in range(_SIMHASH_TABLES)
        ]
        assert sql_vals == expected, (w, sql_vals, expected)
        n_for_w = 1 << (w + 1)  # smallest-w rule maps this n to w
        assert _simhash_band_bits(n_for_w) == w
        spark_rows = (
            simhash_band_keys(
                spark.createDataFrame([(1, sig)], "doc_id int, simhash string"),
                n_for_w,
            )
            .orderBy("band_idx")
            .collect()
        )
        assert [r.band_val for r in spark_rows] == expected, (w, spark_rows)


def test_session_cache_reuses_persisted_relations(spark, sf_dir):
    """ADVICE r3: re-invoking a query that persists an intermediate
    relation (simhash signatures, IVF centroids, PQ codebook, PageRank
    edges, shingles) must reuse the session cache entry, not stack a
    fresh .persist() per call — bench's warm+timed pass and the driver
    both invoke each query at least twice."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        session_cache,
    )

    session_cache._CACHE.clear()
    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        # distinct plan per build: Spark's cache lookup is plan-based, so
        # identical plans would make the eviction assertion see the new
        # entry's storage when probing the old DataFrame
        return spark.range(3 + calls["n"]).toDF("doc_id")

    a = session_cache.session_cached(spark, "probe", sf_dir, builder)
    b = session_cache.session_cached(spark, "probe", sf_dir, builder)
    assert a is b and calls["n"] == 1
    assert a.storageLevel.useMemory  # actually persisted

    # a different sf_dir for the same name evicts the old entry
    c = session_cache.session_cached(spark, "probe", sf_dir + "-other", builder)
    assert calls["n"] == 2 and c is not a
    assert not a.storageLevel.useMemory  # unpersisted on eviction
    live = [k for k in session_cache._CACHE if k[1] == "probe"]
    assert len(live) == 1
    session_cache._CACHE.clear()
    c.unpersist()


def test_query_persist_sites_hit_session_cache(spark, sf_dir):
    """The four ADVICE-flagged persist sites route through the session
    cache: invoking each query twice leaves exactly one cache entry per
    relation name and no duplicate persisted copies."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        session_cache,
    )

    session_cache._CACHE.clear()
    expected = {
        "dedup_simhash_pairs": "simhash_signatures",
        "similarity_ivf_topk": "ivf_centroids",
        "similarity_pq_topk": "pq_codebook",
        "graph_pagerank_orders": "pagerank_edges",
    }
    for qname, relation in expected.items():
        QUERIES[qname].fn(spark, sf_dir)
        QUERIES[qname].fn(spark, sf_dir)
        entries = [k for k in session_cache._CACHE if k[1] == relation]
        assert len(entries) == 1, (qname, relation, entries)


def test_coarse_k_twins_agree_cross_engine():
    """VERDICT r3 #4: the two-level IVF coarse-cell ladder — the Python
    twin and the oracle's SQL CASE must pick the same ck for every k,
    and ck must behave like ~sqrt(k) (ck*ck >= k, monotone)."""
    import duckdb

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _COARSE_LADDER,
        _coarse_k,
        _coarse_k_sql,
    )

    con = duckdb.connect()
    prev = 0
    for k in [1, 2, 4, 15, 16, 17, 63, 64, 65, 255, 256, 1024, 4095, 4096, 10**6]:
        py = _coarse_k(k)
        sql = con.execute(f"SELECT {_coarse_k_sql(str(k))}").fetchone()[0]
        assert py == sql, (k, py, sql)
        if k <= _COARSE_LADDER[-1] ** 2:
            assert py * py >= k, (k, py)
        assert py >= prev
        prev = py


def test_streaming_watermark_drops_late_rows_live_query(spark, tmp_path):
    """r4: REAL late-data semantics, not just single-batch equality —
    two micro-batches through one checkpointed query. Batch 1 fills an
    hour window and advances the watermark past it; batch 2 delivers a
    row for that window older than the watermark. The late row must be
    DROPPED: the window's count never changes."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ).astype({"ts": "datetime64[us]"}).to_parquet(src / name)

    t = pd.Timestamp
    # window [10:00, 11:00): 3 rows; a 12:00 row pushes the watermark
    # (10-min delay) to 11:50 — past the window end
    write_batch("b1.parquet", [
        (1, t("2024-01-01 10:05:00"), 1, "click", 1.0),
        (2, t("2024-01-01 10:20:00"), 1, "click", 1.0),
        (3, t("2024-01-01 10:40:00"), 2, "click", 1.0),
        (4, t("2024-01-01 12:00:00"), 2, "click", 1.0),
    ])
    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE"
    )
    from pyspark.sql import functions as SF

    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(SF.window("ts", "1 hour").alias("w"))
        .agg(SF.count("*").alias("n"))
        .select(
            SF.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "n",
        )
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("wm_late")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.ws: r.n for r in spark.table("wm_late").collect()}
        assert first.get("2024-01-01 10:00:00") == 3
        # batch 2 into the SAME live query: one LATE row for the closed
        # window (10:55 < watermark 11:50) and one fresh row
        write_batch("b2.parquet", [
            (5, t("2024-01-01 10:55:00"), 3, "click", 1.0),
            (6, t("2024-01-01 12:30:00"), 3, "click", 1.0),
        ])
        q.processAllAvailable()
        rows = spark.table("wm_late").collect()
    finally:
        q.stop()
    # update mode re-emits any changed window; the late row must have
    # been dropped, so NO emission shows the 10:00 window at count 4
    counts_10 = [r.n for r in rows if r.ws == "2024-01-01 10:00:00"]
    assert 4 not in counts_10, "late row beyond the watermark was aggregated"
    assert 3 in counts_10  # the on-time emission is present
    # and the fresh 12:00/12:30 rows did land
    assert any(r.ws == "2024-01-01 12:00:00" for r in rows)


def _write_synthetic_events(tmp_path, rows):
    """Minimal events.parquet matching the driver testdata schema, so a
    registered query can run against a synthetic sf_dir."""
    import pandas as pd

    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).astype({"ts": "datetime64[us]"})
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_theta_set_ops_nonzero_difference(spark, tmp_path):
    """ADVICE r4 (high): the shipped testdata is degenerate (every
    clicker also purchases, n_click_only=0), so a NULL-sketch bug that
    scored click_only_est 0.0 passed the envelope trivially. Regression
    data: 100 clickers of which only 20 purchase — the difference
    estimate must track the true 80, and the intersection the true 20."""
    import pandas as pd

    t = pd.Timestamp("2024-01-01 00:00:00")
    rows = [(i, t, i, "click", 1.0, "{}") for i in range(1, 101)]
    rows += [(100 + i, t, i, "purchase", 1.0, "{}") for i in range(1, 21)]
    sf_dir = _write_synthetic_events(tmp_path, rows)

    out = QUERIES["sketch_theta_set_ops"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_click == 100 and r.n_purchase == 20
    assert r.n_both == 20 and r.n_click_only == 80
    # the envelope booleans ARE the assertion: estimates within ±5 %
    assert r.intersect_within_envelope, r
    assert r.difference_within_envelope, r


def test_theta_set_ops_single_segment(spark, tmp_path):
    """ADVICE r4 (low): with only one of the two event types present,
    intersecting a single sketch would return that sketch — the guard
    must emit 0.0 for the intersection, and the difference must equal
    the whole click segment."""
    import pandas as pd

    t = pd.Timestamp("2024-01-01 00:00:00")
    rows = [(i, t, i, "click", 1.0, "{}") for i in range(1, 51)]
    sf_dir = _write_synthetic_events(tmp_path, rows)

    r = QUERIES["sketch_theta_set_ops"].fn(spark, sf_dir).collect()[0]
    assert r.n_click == 50 and r.n_purchase == 0
    assert r.n_both == 0 and r.n_click_only == 50
    assert r.intersect_within_envelope, r
    assert r.difference_within_envelope, r


def test_bitmap_distinct_across_buckets(spark, tmp_path):
    """r5 review finding: n_days must aggregate at the event_type
    level. With user_ids spanning two 32768-wide bitmap buckets, each
    active on a DIFFERENT day, a per-bucket max would report 1 day —
    the true answer is 2 (and distinct users 2)."""
    import pandas as pd

    rows = [
        (1, pd.Timestamp("2024-01-01 00:00:00"), 1, "click", 1.0, "{}"),
        (2, pd.Timestamp("2024-01-02 00:00:00"), 40000, "click", 1.0, "{}"),
    ]
    sf_dir = _write_synthetic_events(tmp_path, rows)
    r = QUERIES["sketch_bitmap_exact_distinct"].fn(spark, sf_dir).collect()[0]
    assert r.event_type == "click"
    assert r.n_distinct_users == 2
    assert r.n_days == 2


def test_semantic_seed_cache_eviction_survives_stale_entry(spark, sf_dir):
    """ADVICE r5 (high): the eviction loop must NOT rebind the seed
    count ``k`` — with a pre-seeded stale fingerprint for the same
    (session, sf_dir), the buggy version crashed on ``.limit(k)`` with
    ``k`` holding a cache-key tuple the first time testdata was
    regenerated within a session."""
    from pyspark.sql import functions as F

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_similarity as qs,
    )

    v = (
        qs._vecs(spark, sf_dir)
        .select("vec_id", "embedding")
        .withColumn("nrm", F.lit(1.0))
    )
    app = spark.sparkContext.applicationId
    stale_key = (app, sf_dir, 0, 0)  # superseded fingerprint
    qs._SEM_SEED_CACHE.clear()
    qs._SEM_SEED_CACHE[stale_key] = [("stale", [0.0], 1.0)]
    try:
        rows = qs._semantic_seed_rows(spark, sf_dir, v, 4)
        assert len(rows) == 4
        assert stale_key not in qs._SEM_SEED_CACHE  # evicted
        assert len(qs._SEM_SEED_CACHE) == 1  # exactly the fresh entry
        again = qs._semantic_seed_rows(spark, sf_dir, v, 4)
        assert again is rows  # served from cache on the second call
    finally:
        qs._SEM_SEED_CACHE.clear()


def test_ivf_model_cache_evicts_stale_fingerprint(spark, sf_dir):
    """Twin of the semantic-seed eviction test for _IVF_MODEL_CACHE
    (ADVICE r5 low): a superseded fingerprint entry for the same
    (session, sf_dir) is evicted, leaving exactly one live model."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_similarity as qs,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
        QUERIES,
    )

    app = spark.sparkContext.applicationId
    # eviction runs only on a cache MISS: drop any model an earlier
    # test already built for this (session, sf_dir) so the query
    # rebuilds and exercises the eviction path
    qs._IVF_MODEL_CACHE.clear()
    stale_key = (app, sf_dir, 0, 0)
    qs._IVF_MODEL_CACHE[stale_key] = ("stale",)
    QUERIES["similarity_ivf_topk"].fn(spark, sf_dir).collect()
    assert stale_key not in qs._IVF_MODEL_CACHE
    live = [k for k in qs._IVF_MODEL_CACHE if k[:2] == (app, sf_dir)]
    assert len(live) == 1


def test_path_fingerprint_recurses_into_part_directories(tmp_path):
    """ADVICE r5: a directory-of-parts table (``events.parquet/``)
    must be fingerprinted by its contained files — rewriting a part in
    place (same size) need not touch the directory inode's metadata,
    so an os.stat-on-the-dir fingerprint could go stale."""
    import os

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.session_cache import (
        _sf_fingerprint,
        path_fingerprint,
    )

    table = tmp_path / "events.parquet"
    table.mkdir()
    part = table / "part-00000.parquet"
    part.write_bytes(b"generation-1")
    fp1 = path_fingerprint(str(table))
    dir_stat1 = os.stat(table)

    # rewrite the part IN PLACE: same name, same size, newer mtime
    part.write_bytes(b"generation-2")
    os.utime(table, ns=(dir_stat1.st_atime_ns, dir_stat1.st_mtime_ns))

    fp2 = path_fingerprint(str(table))
    assert fp2 != fp1  # file-level mtime advanced even though dir didn't
    assert fp2[1] == fp1[1]  # same total size — mtime is what caught it

    # and the sf_dir-level fingerprint sees through the directory too
    sf1 = _sf_fingerprint(str(tmp_path))
    part.write_bytes(b"generation-3!")  # size change this time
    sf2 = _sf_fingerprint(str(tmp_path))
    assert sf2 != sf1 and sf2[1] == sf1[1] + 1


def test_streaming_session_gap_single_definition():
    """ADVICE r5: the session-window oracle's µs gap and the streaming
    job's duration string must come from one constant."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_multimodal as qm,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.streaming import (
        jobs,
    )

    assert qm._STREAM_SESSION_GAP_US == jobs.SESSION_GAP_US
    assert jobs.SESSION_GAP == f"{jobs.SESSION_GAP_MINUTES} minutes"
    assert jobs.SESSION_GAP_US == jobs.SESSION_GAP_MINUTES * 60 * 1_000_000


def test_incremental_minhash_respects_batch_boundary(spark, sf_dir):
    """dedup_incremental_minhash (r6): every emitted pair must be
    (batch doc, indexed doc) — never batch-internal, never
    index-internal — and must agree with the full batch LSH on pairs
    that cross the boundary."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_dedup import (
        _INCR_BATCH_MOD,
        _INCR_BATCH_REM,
    )

    rows = QUERIES["dedup_incremental_minhash"].fn(spark, sf_dir).collect()
    assert rows  # non-degenerate at the smoke scale
    for r in rows:
        assert r.new_doc % _INCR_BATCH_MOD == _INCR_BATCH_REM, r
        assert r.dup_of % _INCR_BATCH_MOD != _INCR_BATCH_REM, r
    # cross-boundary subset of the full batch pairing, both directions
    full = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    incr = {(min(r.new_doc, r.dup_of), max(r.new_doc, r.dup_of)) for r in rows}
    expected = {
        (a, b)
        for a, b in full
        if (a % _INCR_BATCH_MOD == _INCR_BATCH_REM)
        != (b % _INCR_BATCH_MOD == _INCR_BATCH_REM)
    }
    assert incr == expected


def test_global_shuffle_positions_are_contiguous(spark, sf_dir):
    """corpus_global_shuffle (r6): within each shard the positions are
    exactly 1..n (a rank, not a global row_number), every doc appears
    once, and the shard is the first byte of the order key."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_corpus import (
        _SHUFFLE_SHARDS,
    )

    rows = QUERIES["corpus_global_shuffle"].fn(spark, sf_dir).collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < _SHUFFLE_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_late_arrival_audit_rates_bounded(spark, sf_dir):
    """events_late_arrival_audit (r6): late counts are bounded by event
    counts and the rate is their rounded ratio."""
    rows = QUERIES["events_late_arrival_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_late <= r.n_events
        assert abs(r.late_rate - round(r.n_late / r.n_events, 4)) < 1e-9


# --- round-7 operators ------------------------------------------------------


def test_ttr_bounds_and_consistency(spark, sf_dir):
    """quality_ttr_lexical_diversity (r7): TTR and hapax fraction are
    ratios in (0, 1]; types never exceed tokens; hapax never exceeds
    types."""
    rows = QUERIES["quality_ttr_lexical_diversity"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types
        # 4-dp half-up rounding on the query side vs Python's banker's
        # rounding: compare against the unrounded ratio with 5e-5 slack
        assert abs(r.ttr - r.n_types / r.n_tokens) <= 5.001e-5
        assert abs(r.hapax_frac - r.n_hapax / r.n_types) <= 5.001e-5


def test_ngram_novelty_partition_of_shingles(spark, sf_dir):
    """text_ngram_novelty (r7): every shingle has exactly ONE first
    doc, so summing n_novel over docs equals the distinct shingle
    count of the corpus, and doc_id=min sees novelty 1.0."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_dedup import (
        cached_shingles,
    )

    rows = QUERIES["text_ngram_novelty"].fn(spark, sf_dir).collect()
    assert rows
    total_novel = sum(r.n_novel for r in rows)
    distinct_shingles = (
        cached_shingles(spark, sf_dir)
        .select(F.explode("sh").alias("s"))
        .distinct()
        .count()
    )
    assert total_novel == distinct_shingles
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_rate == 1.0


def test_temperature_resample_quota_math(spark, sf_dir):
    """corpus_temperature_resample (r7): per source, kept docs ==
    min(4*isqrt(n), n) and ranks are contiguous from 1."""
    import math

    rows = QUERIES["corpus_temperature_resample"].fn(spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        n = rs[0].n_source_docs
        quota = min(4 * math.isqrt(n), n)
        assert rs[0].quota == quota
        assert len(rs) == quota
        assert sorted(x.rank_in_source for x in rs) == list(range(1, quota + 1))


def test_interleave_stride_schedule(spark, sf_dir):
    """corpus_interleave_sources (r7): vtime = rank * lcm/weight, all
    docs present, and within a source the vtime order equals the rank
    order (stride scheduling is monotone per source)."""
    rows = QUERIES["corpus_interleave_sources"].fn(spark, sf_dir).collect()
    n_docs = QUERIES["multimodal_payload_meta"].fn(spark, sf_dir).count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.weight in (1, 2, 3)
        assert r.vtime == r.rank_in_source * (6 // r.weight)


def test_rolling_zscore_recompute(spark, sf_dir):
    """features_rolling_zscore (r7): recompute a few windows in
    Python from the raw events and match mean/std/z."""
    import statistics

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expected = {}
    for uid, rs in by_user.items():
        for i, r in enumerate(rs):
            win = [x.value for x in rs[max(0, i - 6) : i + 1]]
            if len(win) < 3:
                continue
            m = statistics.fmean(win)
            s = statistics.stdev(win)
            z = round((r.value - m) / s, 4) if s > 0 else None
            expected[r.event_id] = (len(win), round(m, 4), round(s, 4), z)
    got = {
        r.event_id: (r.n_window, r.rolling_mean, r.rolling_std, r.zscore)
        for r in QUERIES["features_rolling_zscore"].fn(spark, sf_dir).collect()
    }
    assert len(got) == len(expected)
    mismatch = [
        k for k in expected
        if any(
            a is not None and b is not None and abs(a - b) > 2e-4 or (a is None) != (b is None)
            for a, b in zip(expected[k], got[k])
        )
    ]
    assert not mismatch, mismatch[:5]


def test_rate_limit_audit_threshold(spark, sf_dir):
    """events_rate_limit_audit (r7): every emitted row is at/above the
    burst threshold, and the count matches a brute-force trailing-hour
    recount on a sample of users."""
    rows = QUERIES["events_rate_limit_audit"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.n_last_hour >= 2 for r in rows)
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    sample_users = {r.user_id for r in rows[:5]}
    ev = [
        r
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts")
        .collect()
        if r.user_id in sample_users
    ]
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    flagged = {(r.user_id, r.event_id): r.n_last_hour for r in rows}
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.ts)
        for i, r in enumerate(rs):
            n = sum(
                1
                for x in rs
                if 0 <= (r.ts - x.ts).total_seconds() <= 3600
            )
            if n >= 2:
                assert flagged.get((uid, r.event_id)) == n


def test_minhash_accuracy_estimator_contract(spark, sf_dir):
    """dedup_minhash_accuracy (r7): estimates are multiples of 1/9 in
    [0,1], the pair set equals the LSH candidate universe (a superset
    of the verified dedup pairs), and err = |est - exact|."""
    rows = QUERIES["dedup_minhash_accuracy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        # est is emitted 4-dp-rounded, so n/9 multiples carry up to
        # 9 * 5e-5 of rounding slack
        assert abs(r.est_jaccard * 9 - round(r.est_jaccard * 9)) < 1e-3
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.exact_jaccard), 4)) <= 1e-4
    verified = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    audited = {(r.doc_a, r.doc_b) for r in rows}
    assert verified <= audited


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """sketch_bloom_prefilter (r7): Bloom filters may over-approximate
    but NEVER miss a member; positives = members + false positives."""
    row = QUERIES["sketch_bloom_prefilter"].fn(spark, sf_dir).collect()[0]
    assert row.n_false_negative == 0
    assert row.n_bloom_positive == row.n_members + row.n_false_positive
    assert row.n_members <= row.n_probed


def test_matryoshka_top1_matches_bruteforce(spark, sf_dir):
    """embedding_matryoshka_recall (r7): the full-dim top-1 agrees
    with similarity_topk_bruteforce's rank-1 rows wherever that
    query's neighbor is outside the query prefix (the audit excludes
    query-vs-query matches by design)."""
    rows = {r.query_id: r for r in QUERIES["embedding_matryoshka_recall"].fn(spark, sf_dir).collect()}
    assert len(rows) == 10
    brute = QUERIES["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    top1 = {}
    for r in brute:
        if r.query_id not in top1 or (r.cos_sim, -r.neighbor_id) > (
            top1[r.query_id][1],
            -top1[r.query_id][0],
        ):
            top1[r.query_id] = (r.neighbor_id, r.cos_sim)
    assert top1
    for qid, (nid, sim) in top1.items():
        if nid >= 10:  # audit corpus excludes the query prefix
            assert rows[qid].top1_full == nid
            assert abs(rows[qid].cos_full - sim) < 1e-9
    for r2 in rows.values():
        assert r2.top1_full >= 10 and r2.top1_trunc >= 10
