"""Benchmark-contamination detection — the decontamination step of an
LLM training-data pipeline (GPT-3 appendix C / PaLM-style n-gram
overlap): flag training documents that share word n-grams with an
evaluation/benchmark corpus.

Shape (Spark-first):

1. benchmark side -> DISTINCT n-gram hashes.  A benchmark corpus is
   tiny next to a 100 TB crawl (MBs of eval sets vs TBs of train
   docs), so the gram set is **broadcast** and the probe is a
   map-side hash join — the 100 TB side is never shuffled.  For a
   benchmark too big to broadcast (``broadcast_limit=0``) the same
   plan degrades gracefully to a shuffle join on the gram hash,
   which is uniform by construction (md5) — no skew.
2. corpus side -> explode per-doc DISTINCT gram hashes (bounded by
   doc length), LEFT join against the benchmark grams, re-aggregate
   per doc.  The explode/groupBy pair shuffles rows proportional to
   total corpus grams once; counts are map-side combined.

Gram hashing reuses :func:`~..operators.dedup.shingles_udf` (md5-hex
prefix mod p), so the DuckDB oracle reproduces the identical gram
universe, and a pipeline that already computed shingles for minhash
dedup can feed the same column here for free.

Reference scope note: the reference engine has no decontamination
operator — this is part of the training-data-pipeline surface the
rebuild adds on top (brief: dedup/similarity/text-analysis family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_sql, shingles_udf

__all__ = ["ngram_contamination", "contamination_sql"]


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 8_000_000,
) -> DataFrame:
    """Per-document benchmark overlap: for every doc, the number of
    its distinct word ``n``-grams, how many also occur anywhere in
    ``benchmark``, and the contaminated fraction.

    Returns ``(id_col, n_ngrams, n_hit, contamination_frac)`` — one
    row per input doc (docs shorter than ``n`` words contribute their
    single partial gram, matching the shingle convention).
    """
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles_udf(F.col(text_col), n)).alias("gram")
    )
    bench_grams = (
        benchmark.select(F.explode(shingles_udf(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    if broadcast_limit:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_hit"),
            F.round(F.count("hit") / F.count(F.lit(1)), 6).alias(
                "contamination_frac"
            ),
        )
    )


def contamination_sql(
    bench_predicate: str,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin: identical gram universe (md5 shingle hashes),
    benchmark = ``table`` rows satisfying ``bench_predicate``."""
    sh = shingles_sql(text_col, n)
    return f"""
WITH bench_grams AS (
    SELECT DISTINCT unnest({sh}) AS gram
    FROM {table} WHERE {bench_predicate}
),
doc_grams AS (
    SELECT {id_col}, unnest({sh}) AS gram FROM {table}
)
SELECT d.{id_col},
       COUNT(*)                                        AS n_ngrams,
       COUNT(b.gram)                                   AS n_hit,
       ROUND(COUNT(b.gram) * 1.0 / COUNT(*), 6)        AS contamination_frac
FROM doc_grams d LEFT JOIN bench_grams b USING (gram)
GROUP BY d.{id_col}
"""
