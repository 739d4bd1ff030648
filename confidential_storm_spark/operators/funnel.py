"""End-to-end curation funnel: the composed filter pipeline a
training-data run actually executes, reported as per-stage survivor
counts.

Real pipelines (C4, Gopher/MassiveText, RefinedWeb, FineWeb) all share
this shape: language ID -> heuristic quality -> repetition -> dedup ->
length, each stage consuming the previous stage's survivors, with the
per-stage kept/dropped counts as the run's primary health dashboard.
The operators themselves already exist in this engine (lang_id,
quality_features, repetition_signals, exact_dedup); this module wires
them into one plan and emits the dashboard.

Scale design: one pass builds every stage predicate as a boolean
column (the feature joins are all doc_id-keyed, so the three feature
computations share one hash partitioning), then ONE global aggregation
sums the conjunction prefixes — per-stage counts cost a single
scalar-agg reduce, not one count() job per stage.  The final unpivot
of 6 sums to 6 rows is a constant-size stack expression, not a
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_features, repetition_signals

__all__ = ["curation_funnel", "curation_funnel_sql", "FUNNEL_DEFAULTS"]

FUNNEL_DEFAULTS = {
    "min_tokens": 20,
    "min_alpha_ratio": 0.75,
    "max_dup_word_frac": 0.6,
    "min_chars": 200,
}


def curation_funnel(
    df: DataFrame,
    min_tokens: int = FUNNEL_DEFAULTS["min_tokens"],
    min_alpha_ratio: float = FUNNEL_DEFAULTS["min_alpha_ratio"],
    max_dup_word_frac: float = FUNNEL_DEFAULTS["max_dup_word_frac"],
    min_chars: int = FUNNEL_DEFAULTS["min_chars"],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Stage-wise survivor counts ``(stage_idx, stage, n_docs)`` for
    the pipeline input -> lang_match -> quality -> repetition ->
    dedup -> length.

    ``lang_match`` keeps docs whose keyword-marker language prediction
    agrees with the labeled ``lang`` column; ``dedup`` keeps the
    min-id exemplar of each exact text; each stage filters the
    previous stage's survivors.
    """
    lang = lang_id(df, text_col, id_col=id_col, lang_col=lang_col).select(
        id_col, "pred_lang"
    )
    qual = quality_features(df, text_col, id_col=id_col).select(
        id_col, "n_tokens", "alpha_ratio"
    )
    rep = repetition_signals(df, text_col, id_col).select(
        id_col, "dup_word_frac"
    )
    # exact-dedup exemplar: min id per content digest
    exemplar = (
        df.groupBy(F.md5(F.col(text_col)).alias("_dig"))
        .agg(F.min(id_col).alias("_keep"))
        .select(F.col("_keep").alias(id_col), F.lit(True).alias("_is_exemplar"))
    )
    feats = (
        df.select(id_col, F.col(lang_col).alias("_lang"), F.length(text_col).alias("_nc"))
        .join(lang, id_col)
        .join(qual, id_col)
        .join(rep, id_col)
        .join(exemplar, id_col, "left")
    )
    p1 = F.col("pred_lang") == F.col("_lang")
    p2 = (F.col("n_tokens") >= min_tokens) & (F.col("alpha_ratio") >= min_alpha_ratio)
    p3 = F.col("dup_word_frac") <= max_dup_word_frac
    p4 = F.coalesce(F.col("_is_exemplar"), F.lit(False))
    p5 = F.col("_nc") >= min_chars
    stages = [
        ("input", F.lit(True)),
        ("lang_match", p1),
        ("quality", p1 & p2),
        ("repetition", p1 & p2 & p3),
        ("dedup", p1 & p2 & p3 & p4),
        ("length", p1 & p2 & p3 & p4 & p5),
    ]
    counts = feats.agg(
        *[F.sum(p.cast("long")).alias(f"_s{i}") for i, (_, p) in enumerate(stages)]
    )
    stack = ", ".join(
        f"{i}, '{name}', _s{i}" for i, (name, _) in enumerate(stages)
    )
    return counts.selectExpr(
        f"stack({len(stages)}, {stack}) AS (stage_idx, stage, n_docs)"
    ).orderBy("stage_idx")


def curation_funnel_sql(
    lang_pred_cte: str,
    repetition_cte: str,
    quality_cte: str,
    min_tokens: int = FUNNEL_DEFAULTS["min_tokens"],
    min_alpha_ratio: float = FUNNEL_DEFAULTS["min_alpha_ratio"],
    max_dup_word_frac: float = FUNNEL_DEFAULTS["max_dup_word_frac"],
    min_chars: int = FUNNEL_DEFAULTS["min_chars"],
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`curation_funnel`.  The three feature CTE
    bodies are passed in so the funnel reuses the EXACT oracle SQL of
    the underlying operators (lang-id / repetition / quality) rather
    than a drifting reimplementation."""
    return f"""
WITH _lang AS ({lang_pred_cte}),
_qual AS ({quality_cte}),
_rep AS ({repetition_cte}),
_ex AS (SELECT MIN(doc_id) AS doc_id, TRUE AS _is_exemplar
        FROM {table} GROUP BY md5(text)),
_f AS (
  SELECT d.doc_id,
         (_lang.pred_lang = d.lang) AS p1,
         (_qual.n_tokens >= {min_tokens} AND _qual.alpha_ratio >= {min_alpha_ratio}) AS p2,
         (_rep.dup_word_frac <= {max_dup_word_frac}) AS p3,
         COALESCE(_ex._is_exemplar, FALSE) AS p4,
         (length(d.text) >= {min_chars}) AS p5
  FROM {table} d
  JOIN _lang USING (doc_id) JOIN _qual USING (doc_id) JOIN _rep USING (doc_id)
  LEFT JOIN _ex USING (doc_id)
),
_c AS (
  SELECT COUNT(*) AS s0,
         SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS s1,
         SUM(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS s2,
         SUM(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS s3,
         SUM(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS s4,
         SUM(CASE WHEN p1 AND p2 AND p3 AND p4 AND p5 THEN 1 ELSE 0 END) AS s5
  FROM _f
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'input' AS stage, CAST(s0 AS BIGINT) AS n_docs FROM _c
  UNION ALL SELECT 1, 'lang_match', CAST(s1 AS BIGINT) FROM _c
  UNION ALL SELECT 2, 'quality', CAST(s2 AS BIGINT) FROM _c
  UNION ALL SELECT 3, 'repetition', CAST(s3 AS BIGINT) FROM _c
  UNION ALL SELECT 4, 'dedup', CAST(s4 AS BIGINT) FROM _c
  UNION ALL SELECT 5, 'length', CAST(s5 AS BIGINT) FROM _c
) ORDER BY stage_idx
"""
