"""Streaming curation: the batch funnel's filter stages on a live
document stream.

The batch ``curation_funnel`` computes its stage predicates with
doc_id-keyed feature joins (fine in batch; stream-stream joins would
need watermark plumbing).  For ingestion-time filtering every stage
predicate is expressible as a PURE per-row column expression, so the
whole quality gate is stateless — it fuses into the stream's scan
exactly like any projection — and only the final exact-dedup stage
carries state (the digest store of :func:`~.stateful.dedup_stream`).

This is the Spark-first shape for "filter the crawl as it lands":
stateless predicates scale with input rate (no shuffle, no state),
and the one stateful stage is the one that semantically needs memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import words
from ..operators.funnel import FUNNEL_DEFAULTS
from .stateful import dedup_stream

__all__ = ["quality_predicate", "curation_filter_stream"]


def quality_predicate(
    text: Column,
    min_tokens: int = FUNNEL_DEFAULTS["min_tokens"],
    min_alpha_ratio: float = FUNNEL_DEFAULTS["min_alpha_ratio"],
    max_dup_word_frac: float = FUNNEL_DEFAULTS["max_dup_word_frac"],
    min_chars: int = FUNNEL_DEFAULTS["min_chars"],
) -> Column:
    """The funnel's quality/repetition/length stages as ONE boolean
    expression: token count, alpha ratio, per-doc duplicated-word
    fraction, char length.  Pure per-row arithmetic — streamable,
    codegen-fused, no joins."""
    ws = words(text)
    n_tokens = F.size(ws)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))
    dup_word_frac = F.when(n_tokens > 0,
        1.0 - F.size(F.array_distinct(ws)).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    return (
        (n_tokens >= min_tokens)
        & (alpha_ratio >= min_alpha_ratio)
        & (dup_word_frac <= max_dup_word_frac)
        & (n_chars >= min_chars)
    )


def curation_filter_stream(
    docs: DataFrame,
    text_col: str = "text",
    dedup: bool = True,
    watermark: tuple[str, str] | None = None,
    **thresholds,
) -> DataFrame:
    """Ingestion-time curation of a streaming document source: drop
    rows failing :func:`quality_predicate`, then (optionally) drop
    exact-content duplicates across the stream's lifetime (or within
    a ``watermark`` horizon).  Survivor rows pass through with their
    original schema."""
    out = docs.filter(quality_predicate(F.col(text_col), **thresholds))
    if dedup:
        out = dedup_stream(out, text_col=text_col, watermark=watermark)
    return out
