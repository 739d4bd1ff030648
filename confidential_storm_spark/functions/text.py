"""Text analysis column functions (SURVEY §2.3 P1 + training-data ops).

Everything here is built-in-function based (JVM-side, codegen) — no
Python UDFs — and each has an exact ANSI-SQL twin for the DuckDB
oracle.  The word split mirrors the reference's sentence-split bolt:
split on ``\\W+``, lowercase, drop empties
(SplitSentenceServiceProvider.java:62-65).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "words",
    "explode_words",
    "token_count",
    "quality_features",
    "lang_id",
    "fingerprint",
    "STOPWORDS",
    "LANG_MARKERS",
    "FP_PRIME",
    "FP_MULTIPLIER",
]

# small deterministic stopword list for quality scoring
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# marker words per language for the keyword language-ID heuristic;
# deterministic tie-break = this ordering.  (The driver corpus shares
# one 31-word vocabulary across lang labels, so markers are drawn from
# that vocabulary — the operator shape is what matters, and accuracy
# is reported against the labeled `lang` column.)
LANG_MARKERS = {
    "en": ("the", "order", "table"),
    "de": ("join", "row", "hash"),
    "fr": ("scan", "data", "query"),
    "es": ("slow", "agg", "merge"),
    "zh": ("small", "column", "value"),
}

# rolling-hash fingerprint parameters (Mersenne prime 2^31-1 keeps all
# intermediates < 2^36, exact in both Spark LONG and DuckDB BIGINT)
FP_PRIME = 2_147_483_647
FP_MULTIPLIER = 31


def words(text: Column) -> Column:
    """Array of lowercase words: split on non-word runs, drop empties."""
    return F.filter(F.split(F.lower(text), "\\W+"), lambda w: F.length(w) > 0)


def explode_words(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """P1: one row per word (the reference emits one tuple per word
    with count=1; SplitSentenceBolt.java:36-56)."""
    return df.withColumn(out_col, F.explode(words(F.col(text_col))))


def token_count(text: Column) -> Column:
    """Whitespace-ish token count (JVM-side)."""
    return F.size(words(text))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features for training-data filtering:
    token count, mean token length, stopword ratio, alpha ratio."""
    ws = words(F.col(text_col))
    n_tokens = F.size(ws)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(
            F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("mean_token_len"),
        F.round(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 6).alias(
            "stopword_ratio"
        ),
        F.round(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias(
            "alpha_ratio"
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keyword-marker language ID: score = number of marker-word hits
    per language; argmax with deterministic tie-break order."""
    ws = words(F.col(text_col))
    scores = [
        F.size(F.filter(ws, lambda w: F.array_contains(F.array(*map(F.lit, markers)), w))).alias(
            f"score_{lang}"
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = df.select("doc_id", "lang", *scores)
    # argmax via greatest + chained when (first language in LANG_MARKERS
    # order wins ties)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return scored.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        pred.alias("pred_lang"),
        best.alias("best_score"),
    )


def _word_hash(w: Column) -> Column:
    """Deterministic word -> int in [0, 2^31): first 8 hex chars of
    md5, identical in DuckDB as CAST('0x'||substr(md5(w),1,8) AS BIGINT),
    folded below FP_PRIME."""
    return F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long") % FP_PRIME


def fingerprint(text: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over the word
    sequence, ``h = (h * 31 + hash(w)) mod (2^31 - 1)``."""
    return F.aggregate(
        words(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * FP_MULTIPLIER + _word_hash(w)) % FP_PRIME,
    )


# ---------------------------------------------------------------------------
# ANSI-SQL twins (DuckDB oracle fragments)
# ---------------------------------------------------------------------------

WORDS_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '\\W+'), w -> len(w) > 0)"
)


def words_sql(col: str = "text") -> str:
    return WORDS_SQL.format(col=col)


def fingerprint_sql(col: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({words_sql(col)}, "
        f"w -> CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {FP_PRIME})), "
        f"(acc, h) -> (acc * {FP_MULTIPLIER} + h) % {FP_PRIME})"
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenizer (training-data token counting)
# ---------------------------------------------------------------------------

# GPT-2-style pretokenization pattern, restricted to a lookahead-free
# ASCII form so Java regex (Spark), RE2 (DuckDB) and Python `re` all
# match identically: contraction suffixes, space-prefixed letter runs,
# space-prefixed digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9']+|\s+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pretokens (whitespace-run matches dropped) — the token
    unit an LLM-data pipeline budgets by."""
    return F.filter(
        F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0),
        lambda t: F.trim(t) != "",
    )


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def bpe_tokens_sql(col: str = "text") -> str:
    """DuckDB twin (identical RE2-compatible pattern)."""
    pat = BPE_PATTERN.replace("'", "''")
    return f"list_filter(regexp_extract_all({col}, '{pat}'), t -> trim(t) != '')"
