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


def _doc_tokens(spark, sf_dir):
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.filter(X.tokens(), lambda x: x != F.lit("")).alias("tk"),
        )
        .collect()
    )


def test_gopher_repetition_recompute(spark, sf_dir):
    """Driver-side recompute of both repetition fractions with the
    same micro quantization, plus the gate flag."""
    import math
    from collections import Counter

    docs = {r.doc_id: list(r.tk or []) for r in _doc_tokens(spark, sf_dir)}
    rows = QUERIES["text_gopher_repetition"].fn(spark, sf_dir).collect()
    eligible = {d: tk for d, tk in docs.items() if len(tk) >= 2}
    assert {r.doc_id for r in rows} == set(eligible)
    for r in rows:
        tk = eligible[r.doc_id]
        n = len(tk)
        vocab = len(set(tk))
        pairs = Counter(zip(tk, tk[1:]))
        nb = n - 1
        dup_micro = math.floor((n - vocab) / n * 1e6 + 0.5)
        top_micro = math.floor(max(pairs.values()) / nb * 1e6 + 0.5)
        assert r.n_tokens == n and r.vocab == vocab and r.n_bigrams == nb
        assert abs(r.dup_token_frac - round(dup_micro / 1e6, 6)) < 1e-9
        assert abs(r.top_bigram_frac - round(top_micro / 1e6, 6)) < 1e-9
        assert r.repetition_flag == int(
            dup_micro > 300_000 or top_micro > 180_000
        )


def test_good_turing_recompute(spark, sf_dir):
    """Driver-side recompute of hapax/dis counts and both GT ratios,
    including the N1 = 0 NULL guard."""
    import math
    from collections import Counter, defaultdict

    per_src: dict = defaultdict(Counter)
    for r in _doc_tokens(spark, sf_dir):
        per_src[r.source].update(r.tk or [])
    rows = QUERIES["text_good_turing_unseen"].fn(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(per_src)
    for r in rows:
        c = per_src[r.source]
        tot = sum(c.values())
        n1 = sum(1 for v in c.values() if v == 1)
        n2 = sum(1 for v in c.values() if v == 2)
        assert (r.n_tokens, r.vocab, r.hapax, r.dis_legomena) == (
            tot, len(c), n1, n2,
        )
        assert abs(
            r.gt_unseen_mass - round(math.floor(n1 / tot * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        if n1 > 0:
            assert abs(
                r.gt_singleton_rstar
                - round(math.floor(2.0 * n2 / n1 * 1e6 + 0.5) / 1e6, 6)
            ) < 1e-9
        else:
            assert r.gt_singleton_rstar is None


def test_source_jsd_recompute_and_bounds(spark, sf_dir):
    """Driver-side recompute of the JSD micro arithmetic (shared
    entropy-term quantization, DIV-2, clamp) plus the [0, 1]-bit bound
    and the full s1 < s2 pair grid."""
    import math
    from collections import Counter, defaultdict

    BINS = 20
    hist: dict = defaultdict(Counter)
    for r in _doc_tokens(spark, sf_dir):
        for t in r.tk or []:
            hist[r.source][min(len(t), BINS)] += 1
    tot = {s: sum(c.values()) for s, c in hist.items()}

    def term(n, t):
        if n <= 0:
            return 0
        p = n / t
        lg = math.floor(math.log2(p) * 1e6 + 0.5) / 1e6
        return math.floor(-p * lg * 1e6 + 0.5)

    rows = QUERIES["quality_source_jsd"].fn(spark, sf_dir).collect()
    srcs = sorted(hist)
    assert [(r.source_a, r.source_b) for r in rows] == [
        (a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
    ]
    for r in rows:
        t1, t2 = tot[r.source_a], tot[r.source_b]
        assert (r.n_tokens_a, r.n_tokens_b) == (t1, t2)
        hp = hq = hm = 0
        for b in range(1, BINS + 1):
            n1 = hist[r.source_a].get(b, 0)
            n2 = hist[r.source_b].get(b, 0)
            hp += term(n1, t1)
            hq += term(n2, t2)
            hm += term(n1 * t2 + n2 * t1, 2 * t1 * t2)
        jsd = max(hm - (hp + hq) // 2, 0)
        assert abs(r.jsd_bits - round(jsd / 1e6, 6)) < 1e-9
        assert 0.0 <= r.jsd_bits <= 1.000005  # 1-bit bound + quantization


def test_local_clustering_recompute(spark, sf_dir):
    """Independent adjacency-set recompute of per-node triangles,
    degrees, and the coefficient on the sparsified projection."""
    import math
    from collections import defaultdict

    proj = QUERIES["graph_cosupplier_projection"].fn(spark, sf_dir).collect()
    adj: dict = defaultdict(set)
    for r in proj:
        a, b = sorted((r.supplier, r.partner))
        adj[a].add(b)
        adj[b].add(a)
    tri = {
        v: sum(
            1
            for i, x in enumerate(sorted(ns))
            for y in sorted(ns)[i + 1:]
            if y in adj[x]
        )
        for v, ns in adj.items()
    }
    expect = sorted(
        (
            (
                -math.floor(
                    2.0 * tri[v] / (len(ns) * (len(ns) - 1)) * 1e6 + 0.5
                ),
                v,
            )
            for v, ns in adj.items()
            if len(ns) >= 2
        ),
    )[:20]
    rows = QUERIES["graph_local_clustering"].fn(spark, sf_dir).collect()
    assert [(-e[0], e[1]) for e in expect] == [
        (math.floor(r.clustering_coeff * 1e6 + 0.5), r.supplier) for r in rows
    ]
    for r in rows:
        assert r.degree == len(adj[r.supplier])
        assert r.n_triangles == tri[r.supplier]


def test_basket_rules_recompute(spark, sf_dir):
    """Driver-side recompute of supports, confidence, lift, the 1 %
    integer support gate, and the lift-ordered top-20."""
    import math
    from collections import Counter, defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brand = {r.p_partkey: r.p_brand for r in pt.collect()}
    baskets: dict = defaultdict(set)
    for r in li.collect():
        baskets[r.l_orderkey].add(brand[r.l_partkey])
    n = len(baskets)
    supp: Counter = Counter()
    pair: Counter = Counter()
    for bs in baskets.values():
        ss = sorted(bs)
        supp.update(ss)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                pair[(a, b)] += 1
    scored = []
    for (a, b), sp in pair.items():
        if 100 * sp < n:
            continue
        for ant, con in ((a, b), (b, a)):
            lift = math.floor(sp * n / (supp[ant] * supp[con]) * 1e6 + 0.5)
            conf = math.floor(sp / supp[ant] * 1e6 + 0.5)
            scored.append((-lift, ant, con, sp, conf))
    scored.sort()
    rows = QUERIES["basket_brand_rules"].fn(spark, sf_dir).collect()
    assert len(rows) == min(20, len(scored))
    for r, e in zip(rows, scored[:20]):
        lift, ant, con, sp, conf = -e[0], e[1], e[2], e[3], e[4]
        assert (r.antecedent, r.consequent) == (ant, con)
        assert r.support_pair == sp
        assert (r.support_a, r.support_b) == (supp[ant], supp[con])
        assert r.n_baskets == n
        assert abs(r.confidence - round(conf / 1e6, 6)) < 1e-9
        assert abs(r.lift - round(lift / 1e6, 6)) < 1e-9


def test_changepoint_recompute(spark, sf_dir):
    """Driver-side recompute of the integer CUSUM argmax, both
    segment means, and the Brownian-bridge statistic."""
    import math
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    days: Counter = Counter()
    for r in load_table(spark, sf_dir, "events").select("ts").collect():
        days[r.ts.date()] += 1
    ds = sorted(days)
    n, tot = len(ds), sum(days.values())
    sq = sum(v * v for v in days.values())
    s, best = 0, None
    for k, d in enumerate(ds[:-1], start=1):
        s += days[d]
        cnum = abs(n * s - k * tot)
        if best is None or cnum > best[0]:
            best = (cnum, d, k, s)
    cnum, day, k, s = best
    row = QUERIES["events_volume_changepoint"].fn(spark, sf_dir).collect()[0]
    assert row.split_day == day.isoformat()
    assert (row.n_days, row.days_before) == (n, k)
    assert abs(
        row.mean_before - round(math.floor(s / k * 1e6 + 0.5) / 1e6, 6)
    ) < 1e-9
    assert abs(
        row.mean_after
        - round(math.floor((tot - s) / (n - k) * 1e6 + 0.5) / 1e6, 6)
    ) < 1e-9
    sd = math.sqrt((sq - tot * tot / n) / (n - 1))
    bb = math.floor(cnum / n / (sd * math.sqrt(n)) * 1e6 + 0.5)
    assert abs(row.bb_stat - round(bb / 1e6, 6)) < 1e-9
    assert row.shift_flag_95_unadjusted == int(bb > 1_358_000)


def test_effective_dim_recompute_and_bounds(spark, sf_dir):
    """numpy recompute of the participation ratio from the SAME
    micro-quantized Gramian arithmetic, plus the 1 <= PR <= d bound."""
    import math

    import numpy as np

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    X = np.asarray(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ]
    )
    n, d = X.shape

    def half_away(a):
        f = np.floor(np.abs(a))
        return np.copysign(f + (np.abs(a) - f >= 0.5), a).astype(np.int64)

    sxy = half_away(X[:, :, None] * X[:, None, :] * 1e6).sum(axis=0)
    sx = half_away(X * 1e6).sum(axis=0)
    tr = fr = 0
    for i in range(d):
        for j in range(i, d):
            cov = (sxy[i, j] / 1e6) / n - ((sx[i] / 1e6) / n) * (
                (sx[j] / 1e6) / n
            )
            if i == j:
                tr += math.floor(cov * 1e6 + 0.5)
            fr += (1 if i == j else 2) * math.floor(cov * cov * 1e12 + 0.5)
    row = QUERIES["embedding_effective_dim"].fn(spark, sf_dir).collect()[0]
    assert row.n_vectors == n and row.n_dims == d
    assert abs(row.trace_var - round(tr / 1e6, 6)) < 1e-9
    assert abs(row.frob_norm_sq - round(fr / 1e12, 6)) < 1e-9
    pr = math.floor(tr * tr / fr * 1e6 + 0.5)
    assert abs(row.effective_dim - round(pr / 1e6, 6)) < 1e-9
    assert 1.0 <= row.effective_dim <= d + 1e-6
    # ratio is independently micro-quantized, so ratio*d can differ
    # from effective_dim by up to d * 0.5e-6
    assert abs(row.effective_dim_ratio * d - row.effective_dim) < d * 1e-6


def test_changepoint_zero_variance_matches_oracle(spark, sf_dir, tmp_path):
    """r15 review: with constant daily volume σ̂ = 0 and the 0/0
    Brownian-bridge division diverged between engines (Spark
    NaN→BIGINT 0 vs DuckDB NULL). Both sides now guard on the exact
    integer comparison n·Σc² > (Σc)² — bb_stat NULL, flag 0, and the
    rows must value-hash identically."""
    import pyarrow as pa

    src = pq.read_table(f"{sf_dir}/events.parquet")
    tiny = src.slice(0, 6).to_pydict()
    base = tiny["ts"][0]
    # 2 days x 3 events: equal counts, zero variance, cnum = 0
    days = [0, 0, 0, 1, 1, 1]
    tiny["ts"] = [
        base.replace(year=2024, month=3, day=10 + d, hour=i % 3)
        for i, d in enumerate(days)
    ]
    path = str(tmp_path / "events.parquet")
    pq.write_table(pa.table(tiny, schema=src.schema), path)

    spec = QUERIES["events_volume_changepoint"]
    sdf = spec.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    odf = con.execute(spec.oracle).fetchdf()
    assert len(sdf) == len(odf) == 1
    s_rows = _norm_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _norm_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    assert s_rows == o_rows, (s_rows, o_rows)
    row = sdf.iloc[0]
    assert row["bb_stat"] is None or row["bb_stat"] != row["bb_stat"]  # NULL
    assert row["shift_flag_95_unadjusted"] == 0


def test_rbo_recompute_and_bounds(spark, sf_dir):
    """Driver-side recompute of RBO@k from the two top-k lists with
    the same suffix-sum pico literals, plus 0 <= RBO <= 1 and the
    identical-list upper bound (RBO = S[1]·k-ish only when all ranks
    agree)."""
    import math

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_retrieval import (
        _RBO_K,
        _RBO_SUFFIX_PICO,
        _dual_scored,
        _tf_projection,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    # the SAME unfiltered (score desc, doc_id) top-k lists the query's
    # bmtop/qltop subplans take — retrieval_bm25_topk filters bm25 > 0
    # and would diverge on a corpus with < k positive-scoring docs
    # (r15 second review)
    scored = _dual_scored(
        _tf_projection(load_table(spark, sf_dir, "documents"))
    ).collect()
    bm = [
        r.doc_id
        for r in sorted(scored, key=lambda r: (-r.bm25, r.doc_id))[:_RBO_K]
    ]
    ql = [
        r.doc_id
        for r in sorted(scored, key=lambda r: (-r.qlm, r.doc_id))[:_RBO_K]
    ]
    assert len(bm) == len(ql) == _RBO_K
    ra = {d: i + 1 for i, d in enumerate(bm)}
    rb = {d: i + 1 for i, d in enumerate(ql)}
    common = set(ra) & set(rb)
    pico = sum(_RBO_SUFFIX_PICO[max(ra[d], rb[d])] for d in common)
    row = QUERIES["retrieval_rbo_overlap"].fn(spark, sf_dir).collect()[0]
    assert row.n_common == len(common)
    # the query's own quantization (floor(pico/1e6 + 0.5) micro grid),
    # NOT Python round() — banker's rounding is a third rounding rule
    # (r15 second review)
    expect = round(math.floor(pico / 1e6 + 0.5) / 1e6, 6)
    assert abs(row.rbo_at_k - expect) < 1e-9
    assert 0.0 <= row.rbo_at_k <= 1.0
    # identical lists would score sum over m of S[rank] = full mass
    full = sum(_RBO_SUFFIX_PICO[m] for m in range(1, _RBO_K + 1))
    assert row.rbo_at_k <= math.floor(full / 1e6 + 0.5) / 1e6 + 1e-9


def test_cluster_purity_recompute_and_bounds(spark, sf_dir):
    """Driver-side recompute of purity and NMI from the kmeans
    assignment with identical entropy quantization, plus the
    0 <= purity, NMI <= 1 bounds and contingency consistency with
    the kmeans cluster sizes."""
    import math
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _kmeans_argmin_expr,
        _kmeans_fit,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    q, _c0, cents1, _upd = _kmeans_fit(spark, sf_dir)
    assign = {
        r.vec_id: r.cid
        for r in q.select(
            "vec_id", F.expr(_kmeans_argmin_expr(cents1) + ".c").alias("cid")
        ).collect()
    }
    labels = {
        r.vec_id: int(r.label)
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    ct: Counter = Counter((assign[v], labels[v]) for v in assign)
    n = sum(ct.values())
    rowm: Counter = Counter()
    colm: Counter = Counter()
    maj: dict = {}
    for (c, l), v in ct.items():
        rowm[c] += v
        colm[l] += v
        maj[c] = max(maj.get(c, 0), v)

    def term(x):
        p = x / n
        lg = math.floor(math.log2(p) * 1e6 + 0.5) / 1e6
        return math.floor(-p * lg * 1e6 + 0.5)

    hc = sum(term(v) for v in rowm.values())
    hl = sum(term(v) for v in colm.values())
    hcl = sum(term(v) for v in ct.values())
    mi = max(hc + hl - hcl, 0)
    row = QUERIES["embedding_cluster_purity"].fn(spark, sf_dir).collect()[0]
    assert (row.n_vectors, row.k_clusters, row.n_labels) == (
        n, len(rowm), len(colm),
    )
    pur = math.floor(sum(maj.values()) / n * 1e6 + 0.5)
    assert abs(row.purity - round(pur / 1e6, 6)) < 1e-9
    assert abs(row.mutual_info_bits - round(mi / 1e6, 6)) < 1e-9
    nmi = math.floor(2.0 * mi / (hc + hl) * 1e6 + 0.5)
    assert abs(row.nmi - round(nmi / 1e6, 6)) < 1e-9
    assert 0.0 <= row.purity <= 1.0 and 0.0 <= row.nmi <= 1.000005
    # contingency row sums == the kmeans query's cluster sizes
    km = {
        r.cluster_id: r.n_members
        for r in QUERIES["embedding_kmeans_lloyd"].fn(spark, sf_dir).collect()
    }
    assert dict(rowm) == km
