"""Text-analysis queries over the documents table ([ext] —
SURVEY.md §2.11: language-ID, quality scoring, token counting,
fingerprinting). Spark expressions and oracle SQL are generated from
the shared kernels in operators/text.py, so both engines evaluate the
same formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import text as X
from .registry import register
from .sources.catalog import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- language identification ----------------------------------------------

_LANG_SCORES_SQL = X.lang_scores_sql()
_LANG_ID_ORACLE = f"""
    SELECT doc_id, lang AS declared_lang,
           {X.lang_id_sql(_LANG_SCORES_SQL)} AS predicted_lang,
           {_LANG_SCORES_SQL['en']} AS score_en,
           {_LANG_SCORES_SQL['de']} AS score_de
    FROM documents
"""


@register("text_lang_id", _LANG_ID_ORACLE)
def text_lang_id(spark, sf_dir):
    """Stopword-profile language-ID heuristic: per-language token-hit
    scores, argmax with fixed priority tie-break."""
    scores = X.lang_scores()
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        X.lang_id(scores).alias("predicted_lang"),
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
    )


# --- quality scoring -------------------------------------------------------

_QUALITY_ORACLE = f"""
    SELECT doc_id,
           {X.token_count_sql()} AS n_tokens,
           {X.punct_ratio_sql()} AS punct_ratio,
           {X.mean_token_len_sql()} AS mean_token_len,
           {X.stopword_ratio_sql()} AS stopword_ratio,
           {X.quality_score_sql()} AS quality_score
    FROM documents
"""


@register("text_quality_score", _QUALITY_ORACLE, headline=True)
def text_quality_score(spark, sf_dir):
    """Document quality score from length / punctuation / stopword
    signals — the standard pre-training corpus filter features.
    The score formula lives ONCE in operators/text.quality_score
    (shared with corpus_curriculum_order)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        X.token_count().alias("n_tokens"),
        X.punct_ratio().alias("punct_ratio"),
        X.mean_token_len().alias("mean_token_len"),
        X.stopword_ratio().alias("stopword_ratio"),
        X.quality_score().alias("quality_score"),
    )


# --- token counting --------------------------------------------------------

_TOKEN_COUNT_ORACLE = f"""
    SELECT doc_id,
           {X.token_count_sql()} AS n_tokens,
           {X.bpe_token_estimate_sql()} AS bpe_tokens_est,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
"""


@register("text_token_count", _TOKEN_COUNT_ORACLE)
def text_token_count(spark, sf_dir):
    """Whitespace token count + BPE-ish subword estimate
    (ceil(len/4) per token)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        X.token_count().alias("n_tokens"),
        X.bpe_token_estimate().alias("bpe_tokens_est"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


# --- fingerprinting --------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
    SELECT doc_id,
           {X.fingerprint_sql()} AS fingerprint,
           substr({X.fingerprint_sql()}, 1, 8) AS fp_prefix
    FROM documents
"""


@register("text_fingerprint", _FINGERPRINT_ORACLE)
def text_fingerprint(spark, sf_dir):
    """Content fingerprint: md5 over normalized text (dedup key)."""
    fp = X.fingerprint()
    return _docs(spark, sf_dir).select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
    )


_BPE_REGEX = "[a-z0-9]{1,4}"  # greedy ≤4-char subword pieces

_TOKEN_REGEX_ORACLE = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all({X.norm_text_sql()}, '{_BPE_REGEX}'))
                AS BIGINT) AS bpe_tokens_regex,
           {X.token_count_sql()} AS n_tokens
    FROM documents
"""


@register("text_token_count_regex", _TOKEN_REGEX_ORACLE)
def text_token_count_regex(spark, sf_dir):
    """BPE-ish regex token counting: subword pieces as greedy
    ≤4-char alphanumeric matches over the normalized text
    (regexp_extract_all) — the regex route to the same subword
    estimate as the per-token arithmetic in text_token_count."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        # idx=0 = whole match (Spark defaults to capture group 1)
        F.size(F.regexp_extract_all(X.norm_text(), F.lit(_BPE_REGEX), F.lit(0)))
        .cast("bigint")
        .alias("bpe_tokens_regex"),
        X.token_count().alias("n_tokens"),
    )


_ROLLING_WINDOW = 8  # character window width

_ROLLING_FP_ORACLE = f"""
    WITH n AS (SELECT doc_id, {X.norm_text_sql()} AS norm FROM documents),
    w AS (
        SELECT doc_id,
               CASE WHEN length(norm) >= {_ROLLING_WINDOW}
                    THEN list_transform(
                        generate_series(1, length(norm) - {_ROLLING_WINDOW - 1}),
                        i -> md5(substr(norm, i, {_ROLLING_WINDOW})))
                    ELSE [md5(norm)] END AS hs
        FROM n
    )
    SELECT doc_id,
           list_min(hs) AS winnow_min,
           CAST(len(list_distinct(hs)) AS BIGINT) AS n_distinct_windows
    FROM w
"""


@register("text_rolling_fingerprint", _ROLLING_FP_ORACLE)
def text_rolling_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (winnowing-style): hash every
    8-char sliding window of the normalized text, keep the minimum
    (the robust-to-edits fingerprint) plus the distinct-window count.
    Shares near-dup robustness with minhash but at character
    granularity — catches whitespace/punctuation-level edits."""
    norm = _docs(spark, sf_dir).select("doc_id", X.norm_text().alias("norm"))
    # substring with a Column start position needs the SQL expr form
    hashed = norm.select(
        "doc_id",
        F.when(
            F.length("norm") >= _ROLLING_WINDOW,
            F.expr(
                f"transform(sequence(1, length(norm) - {_ROLLING_WINDOW - 1}), "
                f"i -> md5(cast(substring(norm, i, {_ROLLING_WINDOW}) as binary)))"
            ),
        )
        .otherwise(F.array(F.md5(F.col("norm").cast("binary"))))
        .alias("hs"),
    )
    return hashed.select(
        "doc_id",
        F.array_min("hs").alias("winnow_min"),
        F.size(F.array_distinct("hs")).cast("bigint").alias("n_distinct_windows"),
    )
