"""End-to-end curation funnel: the composed filter pipeline a
training-data run actually executes, reported as per-stage survivor
counts.

Real pipelines (C4, Gopher/MassiveText, RefinedWeb, FineWeb) all share
this shape: language ID -> heuristic quality -> repetition -> dedup ->
length, each stage consuming the previous stage's survivors, with the
per-stage kept/dropped counts as the run's primary health dashboard.
The stage semantics match the standalone operators (lang_id,
quality_features, repetition_signals, exact_dedup) value-for-value;
this module computes them as one fused plan and emits the dashboard.

Scale design: every predicate except dedup is a pure per-row
expression, so the funnel costs ONE scan; the dedup exemplar is a
row_number window over the content digest (the plan's single
shuffle).  ONE global aggregation sums the conjunction prefixes —
per-stage counts cost a single scalar-agg reduce, not one count()
job per stage — and the final unpivot of 6 sums to 6 rows is a
constant-size stack expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import lang_pred_expr, words

__all__ = [
    "curation_funnel",
    "curation_funnel_sql",
    "conversion_funnel",
    "conversion_funnel_sql",
    "FUNNEL_DEFAULTS",
]

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
    # Every stage predicate except dedup is a PURE per-row expression
    # (identical values to the lang_id / quality_features /
    # repetition_signals relations the oracle CTEs mirror — same
    # formulas, same 6-decimal rounding), so the whole funnel costs
    # ONE scan; the dedup exemplar is a row_number window over the
    # content digest — the single shuffle in the plan (the round-3
    # form paid four doc_id joins for the same numbers).
    text = F.col(text_col)
    ws = words(text)
    n_tokens = F.size(ws)
    n_chars = F.length(text)
    alpha_ratio = F.round(
        F.length(F.regexp_replace(text, "[^a-zA-Z]", "")).cast("double")
        / F.greatest(n_chars, F.lit(1)),
        6,
    )
    dup_word_frac = F.when(
        n_tokens > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(ws)).cast("double") / n_tokens, 6
        ),
    ).otherwise(F.lit(0.0))
    pred_lang, _ = lang_pred_expr(text)

    feats = df.select(
        F.col(id_col),
        (pred_lang == F.col(lang_col)).alias("_p1"),
        ((n_tokens >= min_tokens) & (alpha_ratio >= min_alpha_ratio)).alias("_p2"),
        (dup_word_frac <= max_dup_word_frac).alias("_p3"),
        (
            F.row_number().over(
                Window.partitionBy(F.md5(text)).orderBy(F.col(id_col))
            )
            == 1
        ).alias("_p4"),
        (n_chars >= min_chars).alias("_p5"),
    )
    p1, p2, p3, p4, p5 = (F.col(f"_p{i}") for i in range(1, 6))
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


def conversion_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """ORDERED event conversion funnel: a user reaches stage i+1 only
    with an event of that type STRICTLY AFTER their earliest arrival
    at stage i (the classic product-analytics funnel, which plain
    per-type counts get wrong — order matters).  Returns
    ``(stage_idx, stage, n_users)``.

    Plan: stage 0 is one groupBy(user) min-timestamp; each later
    stage joins the candidate events to the previous stage's
    (user, arrival) relation — all shuffles are user-keyed, so AQE
    reuses the partitioning, and per-stage state is one row per
    surviving user."""
    cur = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    out = cur.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit(0).alias("stage_idx"), F.lit(stages[0]).alias("stage"), "n_users"
    )
    for i, s in enumerate(stages[1:], start=1):
        cur = (
            events.filter(F.col(type_col) == s)
            .join(cur, user_col)
            .filter(F.col(ts_col) > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        out = out.unionByName(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("stage_idx"), F.lit(s).alias("stage"), "n_users"
            )
        )
    return out.orderBy("stage_idx")


def conversion_funnel_sql(
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_expr: str = "epoch_us(ts)",
) -> str:
    """DuckDB twin of :func:`conversion_funnel` (``ts_expr`` yields
    the same epoch-micros longs the Spark side aggregates)."""
    ctes = [
        f"s0 AS (SELECT {user_col}, MIN({ts_expr}) AS t FROM {table} "
        f"WHERE {type_col} = '{stages[0]}' GROUP BY {user_col})"
    ]
    for i, s in enumerate(stages[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, MIN({ts_expr}) AS t FROM {table} e "
            f"JOIN s{i-1} p ON e.{user_col} = p.{user_col} "
            f"WHERE e.{type_col} = '{s}' AND {ts_expr} > p.t GROUP BY e.{user_col})"
        )
    selects = [
        f"SELECT {i} AS stage_idx, '{s}' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i}"
        for i, s in enumerate(stages)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
        + "\nUNION ALL ".join(selects) + "\n) ORDER BY stage_idx"
    )
