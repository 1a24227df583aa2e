"""Similarity-search queries over the embeddings table ([ext] —
SURVEY.md §2.11): brute-force cosine top-k (correctness baseline),
sign-LSH-bucketed ANN (scale path), and embedding-cosine near-dup
pairs (dedup completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import similarity as S
from .registry import register
from .sources.catalog import load_table

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 5
_LSH_DIMS = 4  # 16 sign buckets
_NEARDUP_THRESHOLD = 0.3
_NEARDUP_CAP = 2000


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


_BRUTE_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, embedding, {S.norm_sql('embedding')} AS nrm
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({S.cosine_sql('q.embedding', 'c.embedding', 'q.nrm', 'c.nrm')},
                     6) AS cos_sim
        FROM q JOIN v c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
        ) AS rn
        FROM scored
    ) WHERE rn <= {_TOP_K}
"""


@register("similarity_topk_bruteforce", _BRUTE_ORACLE, headline=True)
def similarity_topk_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k: query vectors broadcast against the
    full corpus, per-query window top-k. Exact; O(n·q) — the baseline
    the ANN path is measured against. Norms are precomputed per vector
    (not per pair)."""
    v = _vecs(spark, sf_dir).select(
        "vec_id", "embedding", S.norm(F.col("embedding")).alias("nrm")
    )
    q = v.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                S.cosine(
                    F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


_LSH_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, embedding, {S.norm_sql('embedding')} AS nrm,
               {S.sign_bucket_sql('embedding', _LSH_DIMS)} AS bucket
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({S.cosine_sql('q.embedding', 'c.embedding', 'q.nrm', 'c.nrm')},
                     6) AS cos_sim
        FROM q JOIN v c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
        ) AS rn
        FROM scored
    ) WHERE rn <= {_TOP_K}
"""


@register("similarity_ann_lsh", _LSH_ORACLE)
def similarity_ann_lsh(spark, sf_dir):
    """Approximate top-k via sign-LSH bucketing: candidates share the
    query's sign-bit bucket, turning the O(n·q) cross product into an
    equi-join on the bucket key — the shape that scales (bucket join
    shuffles on a 16-value key; add more bits / multiple tables for
    recall at 100 TB)."""
    v = _vecs(spark, sf_dir).select(
        "vec_id",
        "embedding",
        S.norm(F.col("embedding")).alias("nrm"),
        S.sign_bucket(F.col("embedding"), _LSH_DIMS).alias("bucket"),
    )
    q = v.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                S.cosine(
                    F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


_NEARDUP_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, label, embedding, {S.norm_sql('embedding')} AS nrm
        FROM embeddings WHERE vec_id < {_NEARDUP_CAP}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           round({S.cosine_sql('a.embedding', 'b.embedding', 'a.nrm', 'b.nrm')}, 6)
               AS cos_sim
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({S.cosine_sql('a.embedding', 'b.embedding', 'a.nrm', 'b.nrm')}, 6)
          >= {_NEARDUP_THRESHOLD}
"""


@register("dedup_embedding_cosine", _NEARDUP_ORACLE)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label (the
    partition key stands in for an LSH/IVF blocking key: pairs are
    only scored within a block, never across the full cross product).
    Capped input for the exact baseline."""
    v = (
        _vecs(spark, sf_dir)
        .filter(F.col("vec_id") < _NEARDUP_CAP)
        .select("vec_id", "label", "embedding", S.norm(F.col("embedding")).alias("nrm"))
    )
    a, b = v.alias("a"), v.alias("b")
    cos = F.round(
        S.cosine(
            F.col("a.embedding"),
            F.col("b.embedding"),
            F.col("a.nrm"),
            F.col("b.nrm"),
        ),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _NEARDUP_THRESHOLD)
    )


# --- IVF (inverted-file) ANN ----------------------------------------------

_IVF_N_CENTROIDS = 16  # deterministic coarse quantizer: vec_id < 16
_IVF_NPROBE = 2

_IVF_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, embedding, {S.norm_sql('embedding')} AS nrm
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
        FROM v WHERE vec_id < {_IVF_N_CENTROIDS}
    ),
    ranked AS (
        SELECT v.vec_id, cent.cid,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY {S.cosine_sql('v.embedding', 'cent.c_emb',
                                          'v.nrm', 'cent.c_nrm')} DESC, cent.cid
               ) AS rnk
        FROM v CROSS JOIN cent
    ),
    assign AS (SELECT vec_id, cid FROM ranked WHERE rnk = 1),
    probes AS (
        SELECT vec_id AS query_id, cid FROM ranked
        WHERE vec_id < {_N_QUERIES} AND rnk <= {_IVF_NPROBE}
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               round({S.cosine_sql('q.embedding', 'c.embedding', 'q.nrm', 'c.nrm')},
                     6) AS cos_sim
        FROM probes p
        JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
        JOIN v q ON q.vec_id = p.query_id
        JOIN v c ON c.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
        ) AS rn
        FROM scored
    ) WHERE rn <= {_TOP_K}
"""


@register("similarity_ivf_topk", _IVF_ORACLE)
def similarity_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) approximate top-k: a deterministic coarse
    quantizer (the first 16 vectors as centroids — a stand-in for
    k-means training, which would be seeded and offline) assigns every
    vector to its nearest centroid's inverted list; a query probes its
    nprobe=2 closest lists only. Assignment is an O(n×k) broadcast
    pass; search touches ~nprobe/k of the corpus — the IVF scale path
    next to the sign-LSH variant."""
    v = _vecs(spark, sf_dir).select(
        "vec_id", "embedding", S.norm(F.col("embedding")).alias("nrm")
    )
    cent = (
        v.filter(F.col("vec_id") < _IVF_N_CENTROIDS)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
    )
    ranked = (
        v.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            S.cosine(
                F.col("embedding"), F.col("c_emb"), F.col("nrm"), F.col("c_nrm")
            ).alias("c_cos"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cid"))
            ),
        )
    )
    assign = ranked.filter(F.col("rnk") == 1).select("vec_id", "cid")
    probes = (
        ranked.filter(
            (F.col("vec_id") < _N_QUERIES) & (F.col("rnk") <= _IVF_NPROBE)
        )
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    q = v.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    scored = (
        probes.join(
            assign.withColumnRenamed("vec_id", "neighbor_id"), "cid"
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                S.cosine(
                    F.col("q_emb"), F.col("n_emb"), F.col("q_nrm"), F.col("n_nrm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )
