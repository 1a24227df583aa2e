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


def _cust_spend(spark, sf_dir):
    """Driver-side per-customer order spend in exact cents — the
    Python mirror of _theil_base's cust relation."""
    import math

    spend: dict = {}
    for r in (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        spend[r.o_custkey] = spend.get(r.o_custkey, 0) + math.floor(
            float(r.o_totalprice) * 100.0 + 0.5
        )
    return spend


def test_hoover_index_recompute(spark, sf_dir):
    """Driver-side Hoover recompute with the same pico-term
    quantization: H = ½Σ|x_i/S − 1/n|, and the between-nation value
    obeys the merge-monotonicity clamp (H_b ≤ H)."""
    import math

    spend = _cust_spend(spark, sf_dir)
    n, s = len(spend), sum(spend.values())
    pico = sum(
        math.floor(abs(x / s - 1.0 / n) * 1e12 + 0.5)
        for x in spend.values()
    )
    h = max(math.floor(pico / 2e6 + 0.5), 0) / 1e6
    row = QUERIES["agg_hoover_index"].fn(spark, sf_dir).collect()[0]
    assert row.n_customers == n and row.total_spend_cents == s
    assert abs(row.hoover_total - round(h, 6)) < 1e-9
    assert 0 <= row.hoover_between <= row.hoover_total


def test_lorenz_palma_recompute(spark, sf_dir):
    """Exact global-sort recompute of the Lorenz decile prefix sums
    and the Palma operands — the two-pass bucket-prefix plan must
    reproduce the naive sorted prefix exactly (integer cents), and
    the curve must be monotone and ≤ the diagonal."""
    spend = _cust_spend(spark, sf_dir)
    xs = [x for _, x in sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))]
    n, s = len(xs), sum(xs)
    prefix = [0]
    for x in xs:
        prefix.append(prefix[-1] + x)
    rows = QUERIES["agg_lorenz_deciles"].fn(spark, sf_dir).collect()
    assert [r.decile_pct for r in rows] == list(range(10, 100, 10))
    last = -1
    for r in rows:
        k = (r.decile_pct * n) // 100
        assert r.rank_k == k and r.n_customers == n
        assert r.cum_spend_cents == prefix[k]
        assert r.cum_spend_cents >= last
        # Lorenz curve sits on or below the diagonal
        assert r.cum_spend_cents * 100 <= s * r.decile_pct + s
        last = r.cum_spend_cents
    p = QUERIES["agg_palma_ratio"].fn(spark, sf_dir).collect()[0]
    assert p.bottom40_cents == prefix[(40 * n) // 100]
    assert p.top10_cents == s - prefix[(90 * n) // 100]


def test_range_search_matches_numpy_bruteforce(spark, sf_dir):
    """Exact recompute of the emitted pair set with numpy cosines
    over the same probe-mod subset (threshold applied to the 6dp
    rounded score, the query's hash contract)."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _RANGE_TAU,
        _range_probe_mod,
    )

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(map(float, r.embedding)) for r in rows])
    nrm = np.sqrt((mat * mat).sum(axis=1))
    mod = _range_probe_mod(len(rows))
    expected = set()
    for qi in range(len(rows)):
        if ids[qi] % mod:
            continue
        cos = mat @ mat[qi] / (nrm * nrm[qi])
        for ci in np.nonzero(np.round(cos, 6) >= _RANGE_TAU)[0]:
            if ids[ci] != ids[qi]:
                expected.add((int(ids[qi]), int(ids[ci])))
    got = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["similarity_range_search"].fn(spark, sf_dir).collect()
    }
    assert got == expected and expected  # non-degenerate fixture


def test_obf_boundary_invariants(spark, sf_dir):
    """OBF contract pinned on the query's own cells: z recomputed
    from the reported cumulative cells matches the reported z;
    information fraction is nondecreasing in the look day and ends at
    exactly 1; the boundary is nonincreasing and ends at exactly the
    fixed-n critical value; the crossing flag equals |z| >= boundary
    on the quantized values."""
    import math

    rows = QUERIES["events_obrien_fleming_boundary"].fn(
        spark, sf_dir
    ).collect()
    assert rows == sorted(rows, key=lambda r: r.day)
    assert sum(r.z is not None for r in rows) >= 2  # richness guard
    prev_t, prev_b = -1.0, float("inf")
    n_final = rows[-1].n_a + rows[-1].n_b
    for r in rows:
        # schedule exists on every look
        assert r.info_frac is not None and r.obf_boundary is not None
        assert (
            abs(
                math.floor((r.n_a + r.n_b) / n_final * 1e6 + 0.5) / 1e6
                - r.info_frac
            )
            < 1e-9
        )
        assert r.info_frac >= prev_t - 1e-9
        assert r.obf_boundary <= prev_b + 1e-9
        if r.z is None:
            assert r.crossed_obf is None  # saturated/empty-arm look
        else:
            p = (r.c_a + r.c_b) / (r.n_a + r.n_b)
            v = p * (1 - p) * (1 / r.n_a + 1 / r.n_b)
            z = (r.c_a / r.n_a - r.c_b / r.n_b) / math.sqrt(v)
            assert abs(math.floor(z * 1e6 + 0.5) / 1e6 - r.z) < 1e-9
            assert r.crossed_obf == (1 if abs(r.z) >= r.obf_boundary else 0)
        prev_t, prev_b = r.info_frac, r.obf_boundary
    assert rows[-1].info_frac == 1.0
    assert rows[-1].obf_boundary == 1.959964


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


def test_benford_gate_recompute(spark, sf_dir):
    """Driver-side Benford gate recompute: count-scale chi2 and
    Nigrini MAD from the same half-up cents and micro-quantized
    terms, full 1-9 grid even when a digit never occurs; the gate
    must also agree with the round-8 descriptive audit's digit
    counts."""
    import math
    from collections import Counter

    cents = [
        math.floor(float(r.o_totalprice) * 100.0 + 0.5)
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    ]
    obs = Counter(int(str(c)[0]) for c in cents if c >= 1)
    n = sum(obs.values())
    chi_micro, mad_sum = 0, 0
    for d in range(1, 10):
        p = math.log10(1.0 + 1.0 / d)
        e = n * p
        chi_micro += math.floor((obs.get(d, 0) - e) ** 2 / e * 1e6 + 0.5)
        mad_sum += math.floor(abs(obs.get(d, 0) / n - p) * 1e6 + 0.5)
    mad_micro = (mad_sum + 4) // 9
    r = QUERIES["dq_benford_chi2_gate"].fn(spark, sf_dir).collect()[0]
    assert r.n_orders == n
    assert abs(r.chi2 - round(chi_micro / 1e6, 6)) < 1e-9
    assert r.deviates_95 == (1 if chi_micro > 15_507_313 else 0)
    assert abs(r.nigrini_mad - round(mad_micro / 1e6, 6)) < 1e-9
    bands = [(6000, "close"), (12000, "acceptable"), (15000, "marginal")]
    expect_band = next(
        (b for lim, b in bands if mad_micro < lim), "nonconforming"
    )
    assert r.mad_conformity == expect_band
    # descriptive audit agreement (round-8 query, same digit domain)
    desc = {
        row.digit: row.n
        for row in QUERIES["dq_benford_firstdigit"].fn(spark, sf_dir).collect()
    }
    assert desc == {d: c for d, c in obs.items()}


def test_assortativity_recompute(spark, sf_dir):
    """Exact recompute of Newman's r from the collected capped pair
    relation and degrees — same integer cells, same micro
    quantization; value must sit in [-1, 1]."""
    import math

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_retrieval as R,
    )

    ee = R._cosupp_capped_edges(spark, sf_dir).collect()
    deg: dict = {}
    by_cust: dict = {}
    for r in ee:
        deg[r.supp] = deg.get(r.supp, 0) + 1
        by_cust.setdefault(r.cust, set()).add(r.supp)
    pairs = set()
    for supps in by_cust.values():
        ss = sorted(supps)
        for i in range(len(ss)):
            for jj in range(i + 1, len(ss)):
                pairs.add((ss[i], ss[jj]))
    e_cnt = len(pairs)
    s1 = sum(deg[a] + deg[b] for a, b in pairs)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in pairs)
    sxy = sum(deg[a] * deg[b] for a, b in pairs)
    den = 2.0 * e_cnt * float(s2) - float(s1) * float(s1)
    expect = (
        None
        if den == 0
        else math.floor(
            (2.0 * e_cnt * (2.0 * float(sxy)) - float(s1) * float(s1))
            / den
            * 1e6
            + 0.5
        )
        / 1e6
    )
    row = QUERIES["graph_degree_assortativity"].fn(spark, sf_dir).collect()[0]
    assert row.n_edges == e_cnt
    assert row.sum_endpoint_degrees == s1
    assert row.n_nodes == len({s for p in pairs for s in p})
    if expect is None:
        assert row.assortativity is None
    else:
        assert abs(row.assortativity - round(expect, 6)) < 1e-9
        assert -1.0 - 1e-6 <= row.assortativity <= 1.0 + 1e-6


def test_token_hhi_recompute(spark, sf_dir):
    """Exact driver-side HHI recompute per source from the same
    tokenizer, plus the Cauchy-Schwarz bounds 1/vocab <= HHI <= 1 and
    effective_types <= vocab."""
    import math
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(X.tokens()).alias("tok"))
        .where(F.col("tok") != "")
        .collect()
    )
    by_src: dict = {}
    for r in toks:
        by_src.setdefault(r.source, Counter())[r.tok] += 1
    rows = QUERIES["text_token_hhi"].fn(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        c = by_src[r.source]
        tot, sq = sum(c.values()), sum(v * v for v in c.values())
        assert r.n_tokens == tot and r.vocab == len(c)
        assert r.hhi == round(
            math.floor(sq / (float(tot) * tot) * 1e6 + 0.5) / 1e6, 6
        )
        assert 1.0 / r.vocab - 1e-6 <= r.hhi <= 1.0 + 1e-6
        assert r.effective_types <= r.vocab + 1e-6
        assert r.top1_share >= r.hhi - 1e-6  # max share bounds HHI


def test_qini_recompute(spark, sf_dir):
    """Global-sort recompute of the Qini decile cells: the two-pass
    totals-minus-prefix plan must reproduce the naive (score DESC,
    user_id DESC) top-k cells exactly; decile 10 must cover every
    user and its qini equal the overall incremental conversions."""
    import hashlib
    import math

    evs = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    users: dict = {}
    for r in evs:
        sc, cv = users.get(r.user_id, (0, 0))
        users[r.user_id] = (
            sc + (1 if r.event_type == "click" else 0),
            max(cv, 1 if r.event_type == "purchase" else 0),
        )
    ranked = sorted(
        users.items(), key=lambda kv: (-kv[1][0], -kv[0])
    )
    n = len(ranked)
    rows = QUERIES["events_qini_uplift_deciles"].fn(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    for r in rows:
        k = (r.decile * n) // 10
        top = ranked[:k]
        cells = [0, 0, 0, 0]
        for uid, (sc, cv) in top:
            a = hashlib.md5(str(uid).encode()).hexdigest()[:2] < "80"
            if a:
                cells[0] += 1
                cells[1] += cv
            else:
                cells[2] += 1
                cells[3] += cv
        assert (r.n_t, r.c_t, r.n_c, r.c_c) == tuple(cells), r.decile
        if r.n_c > 0:
            q = math.floor(
                (r.c_t - r.c_c * (float(r.n_t) / r.n_c)) * 1e6 + 0.5
            ) / 1e6
            assert abs(r.qini - round(q, 6)) < 1e-9
    last = rows[-1]
    assert last.n_t + last.n_c == n  # decile 10 covers everyone



def test_qini_empty_events_matches_oracle_shape(spark, sf_dir, tmp_path):
    """r14 review finding: on an empty events table the oracle's
    d CROSS JOIN r yields zero rows — the Spark side must not invent
    a driver-built decile grid."""
    import pyarrow.parquet as pq

    src = pq.read_table(f"{sf_dir}/events.parquet")
    pq.write_table(src.slice(0, 0), str(tmp_path / "events.parquet"))
    out = QUERIES["events_qini_uplift_deciles"].fn(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == [
        "decile", "top_k_users", "n_t", "c_t", "n_c", "c_c",
        "qini", "uplift_rate",
    ]


def test_concentration_curve_recompute(spark, sf_dir):
    """Global-sort recompute: cumulative spend of the k least-frequent
    customers under (order_count, custkey) order — rank variable ≠
    value variable, the kernel-generality contract."""
    import math
    from collections import defaultdict

    agg: dict = defaultdict(lambda: [0, 0])
    for r in (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        a = agg[r.o_custkey]
        a[0] += 1
        a[1] += math.floor(float(r.o_totalprice) * 100.0 + 0.5)
    ranked = sorted(agg.items(), key=lambda kv: (kv[1][0], kv[0]))
    n = len(ranked)
    prefix = [0]
    for _, (_, v) in ranked:
        prefix.append(prefix[-1] + v)
    rows = QUERIES["agg_concentration_curve"].fn(spark, sf_dir).collect()
    assert [r.decile_pct for r in rows] == list(range(10, 100, 10))
    for r in rows:
        k = (r.decile_pct * n) // 100
        assert r.rank_k == k and r.n_customers == n
        assert r.cum_spend_cents == prefix[k], r.decile_pct


def test_bigram_entropy_chain_rule(spark, sf_dir):
    """Driver-side recompute of the bigram/prev entropies with the
    same micro-term quantization, plus the chain-rule bounds
    0 <= H(next|prev) <= H(pairs) and H(prev) <= H(pairs)."""
    import math
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.filter(X.tokens(), lambda x: x != F.lit(""))
                .alias("tk"))
        .collect()
    )
    pair_c: dict = {}
    for r in docs:
        tk = list(r.tk or [])
        for i in range(len(tk) - 1):
            # register a source only once it yields a bigram — both
            # engines exclude bigram-less sources entirely (r14
            # second review)
            pair_c.setdefault(r.source, Counter())[(tk[i], tk[i + 1])] += 1

    def h_micro(counts, tot):
        out = 0
        for nn in counts:
            p = nn / tot
            lg = math.floor(math.log2(p) * 1e6 + 0.5) / 1e6
            out += math.floor(-p * lg * 1e6 + 0.5)
        return out

    rows = QUERIES["text_bigram_entropy_rate"].fn(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(pair_c)
    for r in rows:
        c = pair_c[r.source]
        tot = sum(c.values())
        assert r.n_bigrams == tot and r.distinct_pairs == len(c)
        h2 = h_micro(c.values(), tot)
        prev = Counter()
        for (p_, _), nn in c.items():
            prev[p_] += nn
        h1 = h_micro(prev.values(), tot)
        assert abs(r.h_bigram_bits - round(h2 / 1e6, 6)) < 1e-9
        assert abs(r.h_prev_bits - round(h1 / 1e6, 6)) < 1e-9
        assert abs(r.h_cond_bits - round(max(h2 - h1, 0) / 1e6, 6)) < 1e-9
        assert 0 <= r.h_cond_bits <= r.h_bigram_bits + 1e-9


def test_benford_cube_state_recovers_across_restart(spark, tmp_path):
    """Fifth state shape under the restart gate (r14): the Benford
    leading-digit cube — the PSI fold with the digit bucket column —
    must continue its fold (not rebuild) across a query restart, and
    its final state must equal the batch digit cube exactly. Runs THE
    shared roundtrip (tests/test_r11._cube_restart_roundtrip — r14
    second review: one definition of the gate's assertions) plus the
    digit-domain assert."""
    from tests.test_r11 import _cube_restart_roundtrip
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.streaming.jobs import (
        benford_cube_transform,
        benford_digit_col,
    )

    final = _cube_restart_roundtrip(
        spark, tmp_path, "benrestart", benford_cube_transform,
        benford_digit_col(),
    )
    assert all(b is None or 1 <= b <= 9 for _, _, b in final)


def test_streaming_benford_gate_matches_batch_gate_statistic(spark, sf_dir):
    """Cross-tier consistency: the per-type streamed gate and a
    driver-side batch recompute from raw events must agree on every
    column — the streaming loop adds no arithmetic of its own."""
    import math
    from collections import Counter

    vals = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    obs: dict = {}
    excl: dict = {}
    for r in vals:
        if r.value is None:
            excl[r.event_type] = excl.get(r.event_type, 0) + 1
            continue
        cents = math.floor(float(r.value) * 100.0 + 0.5)
        if cents < 1:
            excl[r.event_type] = excl.get(r.event_type, 0) + 1
            continue
        obs.setdefault(r.event_type, Counter())[int(str(cents)[0])] += 1
    rows = QUERIES["streaming_benford_gate"].fn(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(obs)
    for r in rows:
        c = obs[r.event_type]
        n = sum(c.values())
        chi_micro, mad_sum = 0, 0
        for dgt in range(1, 10):
            p = math.log10(1.0 + 1.0 / dgt)
            e = n * p
            chi_micro += math.floor((c.get(dgt, 0) - e) ** 2 / e * 1e6 + 0.5)
            mad_sum += math.floor(abs(c.get(dgt, 0) / n - p) * 1e6 + 0.5)
        assert r.n_values == n
        assert r.n_excluded == excl.get(r.event_type, 0)
        assert abs(r.chi2 - round(chi_micro / 1e6, 6)) < 1e-9
        assert r.deviates_95 == (1 if chi_micro > 15_507_313 else 0)
        assert abs(r.nigrini_mad - round(((mad_sum + 4) // 9) / 1e6, 6)) < 1e-9


def test_srm_daily_trace_recompute(spark, sf_dir):
    """Driver-side recompute of the daily SRM trace: cumulative
    entrant cells from first-event days, the exact integer chi2
    decomposition, the running max, and the marginal flag; the final
    look's cells must equal events_srm_check's fixed-n cells and its
    chi2 match the fixed-n statistic."""
    import hashlib

    evs = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("e_day"))
        .collect()
    )
    inc: dict = {}
    for r in evs:
        day = r.e_day.strftime("%Y-%m-%d")
        a = hashlib.md5(str(r.user_id).encode()).hexdigest()[:2] < "80"
        na, nb = inc.get(day, (0, 0))
        inc[day] = (na + (1 if a else 0), nb + (0 if a else 1))
    rows = QUERIES["events_srm_daily_trace"].fn(spark, sf_dir).collect()
    # look days come from the shared sequential cells relation, which
    # also contains conversion-only days (no new entrants) — every
    # entry day must appear, and days sort ascending
    assert set(sorted(inc)) <= {r.day for r in rows}
    assert [r.day for r in rows] == sorted(r.day for r in rows)
    mx = None
    for r in rows:
        na = sum(a for d, (a, _) in inc.items() if d <= r.day)
        nb = sum(b for d, (_, b) in inc.items() if d <= r.day)
        assert (r.n_a, r.n_b) == (na, nb)
        d2, tot = (na - nb) * (na - nb), na + nb
        micro = (d2 // tot) * 1_000_000 + ((d2 % tot) * 1_000_000) // tot
        mx = micro if mx is None else max(mx, micro)
        assert abs(r.srm_chi2 - round(micro / 1e6, 6)) < 1e-9
        assert abs(r.srm_chi2_running_max - round(mx / 1e6, 6)) < 1e-9
        assert r.srm_flag_95_unadjusted == (
            1 if d2 > (3_841_459 * tot) // 1_000_000 else 0
        )
    fixed = QUERIES["events_srm_check"].fn(spark, sf_dir).collect()[0]
    assert (rows[-1].n_a, rows[-1].n_b) == (fixed.n_a, fixed.n_b)
    assert rows[-1].srm_chi2 == fixed.srm_chi2
