"""Round-15 tests.

ADVICE r14 regression cover: the batch Benford gate's empty-corpus
edge (n = 0 → every expected count n·p = 0 → division by zero before
the guard) must stay hash-identical between Spark and DuckDB.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
    QUERIES,
)
from tests.oracle import _norm_rows


def _oracle_on_orders(sql: str, orders_path: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{orders_path}')"
    )
    return con.execute(sql).fetchdf()


def test_benford_gate_empty_orders_matches_oracle(spark, sf_dir, tmp_path):
    """ADVICE r14: with an empty orders table the gate used to divide
    by zero (exp = n·p = 0) and the Inf/NaN→BIGINT cast diverged
    between engines. Both sides now filter n > 0 before the division
    (mirroring the streaming twin), so both aggregate zero term rows
    into one NULL-statistics row with deviates_95 = 0 and the ELSE
    conformity band — and must value-hash identically."""
    src = pq.read_table(f"{sf_dir}/orders.parquet")
    empty = str(tmp_path / "orders.parquet")
    pq.write_table(src.slice(0, 0), empty)

    spec = QUERIES["dq_benford_chi2_gate"]
    sdf = spec.fn(spark, str(tmp_path)).toPandas()
    odf = _oracle_on_orders(spec.oracle, empty)

    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in odf.columns
    )
    assert len(sdf) == len(odf) == 1
    s_rows = _norm_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _norm_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    assert s_rows == o_rows, (s_rows, o_rows)
    row = sdf.iloc[0]
    assert row["deviates_95"] == 0
    assert row["mad_conformity"] == "nonconforming"


def test_benford_gate_subcent_only_matches_oracle(spark, sf_dir, tmp_path):
    """Same edge via the other route the advice names: a table whose
    totals all floor to sub-cent values (cents < 1 filtered out →
    n = 0 despite non-empty input)."""
    import pyarrow as pa

    src = pq.read_table(f"{sf_dir}/orders.parquet")
    tiny = src.slice(0, 8).to_pydict()
    tiny["o_totalprice"] = [0.001] * len(tiny["o_totalprice"])
    empty_cents = str(tmp_path / "orders.parquet")
    pq.write_table(pa.table(tiny, schema=src.schema), empty_cents)

    spec = QUERIES["dq_benford_chi2_gate"]
    sdf = spec.fn(spark, str(tmp_path)).toPandas()
    odf = _oracle_on_orders(spec.oracle, empty_cents)
    assert len(sdf) == len(odf) == 1
    s_rows = _norm_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _norm_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    assert s_rows == o_rows, (s_rows, o_rows)


def test_mp4_encoder_container_layout_and_roundtrip():
    """The documented 57 + n box layout demuxes with BOTH mdat boxes
    concatenated and rawvideo-decodes back to the original bytes —
    including the n = 1 edge where the second mdat carries one byte
    and the multi-frame-width 257-byte case."""
    import struct

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.multimodal import (
        _decode_mp4_rawvideo,
        _demux_mp4,
    )

    for text in ["a", "hello world", "x" * 257]:
        raw = text.encode()
        n = len(raw)
        stream = b"RAW0" + struct.pack(">HHB", n, 1, 1) + raw
        half = 9 + n // 2
        ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
        moov = struct.pack(">I", 16) + b"moov" + struct.pack(">II", n, 1)
        mdat1 = struct.pack(">I", 8 + half) + b"mdat" + stream[:half]
        rest = stream[half:]
        mdat2 = struct.pack(">I", 8 + len(rest)) + b"mdat" + rest
        payload = ftyp + moov + mdat1 + mdat2
        assert len(payload) == 57 + n
        assert _demux_mp4(payload).tobytes() == stream
        assert _decode_mp4_rawvideo(payload).tobytes() == raw


def test_mp4_audit_spark_side_matches_layout(spark, sf_dir):
    """encode_mp4_payloads on the real documents table: every payload
    is 57 + n bytes and decodes back to the document text through the
    registry decoder."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.multimodal import (
        DECODERS,
        encode_mp4_payloads,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where((F.length("text") >= 1) & (F.length("text") <= 65535))
        .limit(20)
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    rows = encode_mp4_payloads(docs).collect()
    assert len(rows) == len(texts)
    dec = DECODERS["video/mp4;codecs=raw"]
    for r in rows:
        raw = texts[r.doc_id].encode()
        assert len(bytes(r.payload)) == 57 + len(raw) == r.meta.n_bytes
        assert dec(bytes(r.payload)).tobytes() == raw
