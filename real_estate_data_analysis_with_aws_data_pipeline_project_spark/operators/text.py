"""Text-analysis operator kernels ([ext] — SURVEY.md §2.11).

Everything here is pure Catalyst column expressions (no Python UDFs):
normalization, tokenization, stopword counting, language-ID scoring,
quality scoring, token-count estimation, fingerprinting. Each helper
has a mirrored ANSI-SQL fragment builder so the DuckDB oracle runs the
*same* formula — the Spark expression and the SQL are generated from
one definition and cannot drift.

Scale: all per-row, embarrassingly parallel, whole-stage-codegen'd —
no shuffle, no state; this is the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword profiles for the n-gram/stopword language-ID heuristic.
# Priority order (first wins ties) is the dict order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist"),
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "los", "que", "por", "una"),
    "fr": ("le", "et", "les", "des", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3"),  # pinyin-ish tokens
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


# --- normalization / tokenization -----------------------------------------


def norm_text(col: str = "text") -> Column:
    """lower → collapse non-alphanumerics to single spaces → trim."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]+", " "))


def norm_text_sql(col: str = "text") -> str:
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"


def tokens(col: str = "text") -> Column:
    return F.split(norm_text(col), " ")


def tokens_sql(col: str = "text") -> str:
    return f"string_split({norm_text_sql(col)}, ' ')"


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col)).cast("bigint")


def token_count_sql(col: str = "text") -> str:
    return f"CAST(len({tokens_sql(col)}) AS BIGINT)"


# --- stopword / language-ID scoring ---------------------------------------


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in `words` (exact token match)."""
    wordlist = list(words)
    return F.size(F.filter(toks, lambda t: t.isin(wordlist))).cast("bigint")


def stopword_hits_sql(toks_sql: str, words: tuple[str, ...]) -> str:
    cond = " OR ".join(f"t = '{w}'" for w in words)
    return f"CAST(len(list_filter({toks_sql}, t -> {cond})) AS BIGINT)"


def lang_scores(col: str = "text") -> dict[str, Column]:
    t = tokens(col)
    return {lang: stopword_hits(t, words) for lang, words in LANG_STOPWORDS.items()}


def lang_scores_sql(col: str = "text") -> dict[str, str]:
    t = tokens_sql(col)
    return {
        lang: stopword_hits_sql(t, words) for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(score_cols: dict[str, Column]) -> Column:
    """Argmax over language scores; ties resolved by dict (priority)
    order — an explicit when-chain so SQL CASE semantics match."""
    langs = list(score_cols)
    expr = None
    for i, lang in enumerate(langs):
        rest = langs[i + 1 :]
        cond = None
        for other in rest:
            c = score_cols[lang] >= score_cols[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if expr is None:
            expr = F.when(cond, branch) if cond is not None else branch
        elif cond is not None:
            expr = expr.when(cond, branch)
        else:
            expr = expr.otherwise(branch)
    return expr


def lang_id_sql(score_sql: dict[str, str]) -> str:
    langs = list(score_sql)
    parts = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"({score_sql[lang]}) >= ({score_sql[o]})" for o in langs[i + 1 :]
        )
        parts.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(parts) + f" ELSE '{langs[-1]}' END"


# --- quality scoring -------------------------------------------------------


def punct_ratio(col: str = "text") -> Column:
    """Share of characters that are not alphanumeric/space (on the
    lowercased text); 0 for empty text."""
    low = F.lower(F.col(col))
    n = F.length(low)
    junk = F.length(F.regexp_replace(low, "[a-z0-9 ]", ""))
    return F.when(n > 0, junk.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio_sql(col: str = "text") -> str:
    return (
        f"CASE WHEN length(lower({col})) > 0 THEN "
        f"CAST(length(regexp_replace(lower({col}), '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / CAST(length(lower({col})) AS DOUBLE) ELSE 0.0 END"
    )


def stopword_ratio(col: str = "text") -> Column:
    """EN-stopword token share; 0 for token-less text."""
    n = token_count(col)
    hits = stopword_hits(tokens(col), EN_STOPWORDS)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio_sql(col: str = "text") -> str:
    nt = token_count_sql(col)
    hits = stopword_hits_sql(tokens_sql(col), EN_STOPWORDS)
    return (
        f"CASE WHEN {nt} > 0 THEN CAST({hits} AS DOUBLE)"
        f" / CAST({nt} AS DOUBLE) ELSE 0.0 END"
    )


def quality_score(col: str = "text") -> Column:
    """The corpus quality score (length / punctuation / stopword
    blend) — ONE definition shared by text_quality_score and the
    curriculum-ordering query so the two can never drift. Weights:
    0.4·min(n_tokens/100, 1) + 0.3·(1 − punct) + 0.3·min(5·stop, 1)."""
    n_tokens = token_count(col)
    return (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio(col)) * 0.3
        + F.least(stopword_ratio(col) * 5.0, F.lit(1.0)) * 0.3
    )


def quality_score_sql(col: str = "text") -> str:
    nt = token_count_sql(col)
    return (
        f"(least(CAST({nt} AS DOUBLE) / 100.0, 1.0) * 0.4"
        f" + (1.0 - {punct_ratio_sql(col)}) * 0.3"
        f" + least(({stopword_ratio_sql(col)}) * 5.0, 1.0) * 0.3)"
    )


def mean_token_len(col: str = "text") -> Column:
    t = tokens(col)
    total = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n = F.size(t)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_len_sql(col: str = "text") -> str:
    t = tokens_sql(col)
    return (
        f"CASE WHEN len({t}) > 0 THEN "
        f"CAST(list_sum(list_transform({t}, x -> CAST(length(x) AS BIGINT))) AS DOUBLE)"
        f" / CAST(len({t}) AS DOUBLE) ELSE 0.0 END"
    )


# --- token-count estimation (BPE-ish) -------------------------------------


def bpe_token_estimate(col: str = "text") -> Column:
    """Subword-count estimate: ceil(len(token)/4) per token — the
    standard ~4-chars-per-BPE-token heuristic."""
    t = tokens(col)
    return F.aggregate(
        F.transform(t, lambda x: F.ceil(F.length(x) / F.lit(4.0)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def bpe_token_estimate_sql(col: str = "text") -> str:
    t = tokens_sql(col)
    return (
        f"CAST(list_sum(list_transform({t}, "
        f"x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT)"
    )


# --- fingerprinting --------------------------------------------------------


def fingerprint(col: str = "text") -> Column:
    """Content fingerprint: md5 of the normalized text — the exact-dup
    key (engine-portable, lowercase hex both in Spark and DuckDB)."""
    return F.md5(norm_text(col).cast("binary"))


def fingerprint_sql(col: str = "text") -> str:
    return f"md5({norm_text_sql(col)})"


# --- regex run counting (readability building block) -----------------------


def run_count(col: Column, pat: str) -> Column:
    """Number of maximal runs matching `pat` (a character-class+
    pattern): replacing each run with one '#' adds exactly one char
    per run, so runs = len(replace(pat, '#')) − len(replace(pat, '')).
    Greedy character-class runs are engine-independent, so the twin
    SQL below counts identically in DuckDB."""
    return (
        F.length(F.regexp_replace(col, pat, "#"))
        - F.length(F.regexp_replace(col, pat, ""))
    ).cast("bigint")


def run_count_sql(col_sql: str, pat: str) -> str:
    # loud guard (r10 review): a quote breaks the interpolated SQL
    # literal, and a pattern able to match '#' breaks the
    # replace-with-'#' counting identity in BOTH engines
    assert "'" not in pat and "#" not in pat, pat
    return (
        f"CAST(length(regexp_replace({col_sql}, '{pat}', '#', 'g'))"
        f" - length(regexp_replace({col_sql}, '{pat}', '', 'g')) AS BIGINT)"
    )
