"""Robust per-key statistics: median, trimmed mean, MAD, IQR — the
outlier-resistant profile a curation pipeline wants for metric
columns (means hide heavy tails; a 100 TB crawl's `value`-style
columns are all heavy-tailed).

Engine-portable by construction: no percentile_approx, no engine
`percentile`/`quantile_cont` (their interpolation arithmetic is a
cross-engine float hazard).  Quantiles are EXACT rank selections;
the one-or-two middles are combined as an exact DECIMAL SUM cast to
double and divided once (deterministic IEEE — never AVG, and never
interpolation between engine-computed fractions).

Scale shape — SPECTRUM-based, not sort-based: the input lives on a
fixed decimal grid (2 decimals), so the per-key VALUE SPECTRUM
(value -> count) is bounded by the grid, not the corpus.  One
groupBy (map-side combinable) reduces N rows to at most
|grid| x |keys| spectrum rows; every rank statistic then reads the
spectrum's per-key cumulative counts — a window over partitions of
AT MOST grid size.  The naive alternative (row_number over a per-key
sort) degenerates when keys ≪ cores: K=5 event types means 5 tasks
each sorting N/5 rows — at 100 TB that is 5 tasks sorting 20 TB.
The spectrum form's only N-sized operation is the combinable count.

Rank selection on a spectrum: a value row with cumulative count
``cum`` and count ``c`` covers sorted positions [cum-c+1, cum]; the
statistic at position p is the row covering p, and weighted sums
(trimmed mean) clip each row's coverage to the kept rank interval.
Results are IDENTICAL to the sort-based form (selection by position
is selection by position), which is exactly what the DuckDB twin
still computes — the oracle runs the INDEPENDENT row_number
algorithm, so the gate certifies the spectrum rewrite against a
different algorithm, not a transliteration.

Reference: beyond-reference profiling op (the reference engine has
no statistics layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robust_stats", "robust_stats_sql"]

_DEC = "decimal(18,2)"
_TRIM = 0.1  # fraction trimmed from EACH end (floor(n*_TRIM) rows)


def _with_cum(spec: DataFrame, key: str, val: str, cnt: str) -> DataFrame:
    """Spectrum + per-key cumulative count and total (windows over
    grid-bounded partitions; values are distinct within a key, so the
    default RANGE frame equals ROWS)."""
    w = Window.partitionBy(key).orderBy(val)
    return spec.withColumn("_cum", F.sum(cnt).over(w)).withColumn(
        "_n", F.sum(cnt).over(Window.partitionBy(key))
    )


def _median_of_spectrum(spec: DataFrame, key: str, val: str, cnt: str) -> DataFrame:
    """(key, med): exact median off a (key, val, cnt) spectrum — the
    two middle positions' values, decimal-summed, one IEEE divide."""
    s = _with_cum(spec, key, val, cnt)
    lo = F.col("_cum") - F.col(cnt) + 1
    p1 = F.floor((F.col("_n") + 1) / 2)
    p2 = F.floor((F.col("_n") + 2) / 2)
    wgt = p1.between(lo, F.col("_cum")).cast("long") + p2.between(
        lo, F.col("_cum")
    ).cast("long")
    return (
        s.filter(wgt > 0)
        .groupBy(key)
        .agg((F.sum(F.col(val) * wgt).cast("double") / F.lit(2.0)).alias("med"))
    )


def robust_stats(
    df: DataFrame, key: str = "event_type", val: str = "value"
) -> DataFrame:
    """Per-key robust profile: n, median, trimmed mean (10% each
    end), MAD (median absolute deviation), IQR bounds (exact rank
    quartiles: positions floor((n+3)/4) and floor((3n+1)/4) — a
    fixed-position convention, no interpolation).

    Sums run in DECIMAL; the only divisions are single deterministic
    IEEE ops; outputs cast to double on the report grid."""
    spec = (
        df.select(F.col(key), F.col(val).cast(_DEC).alias("_v"))
        .groupBy(key, "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)  # read by med/trim/quart/dev
    )
    s = _with_cum(spec, key, "_v", "_c")
    lo = F.col("_cum") - F.col("_c") + 1

    med = _median_of_spectrum(spec, key, "_v", "_c")

    # trimmed mean: clip each value row's rank coverage to the kept
    # interval [t+1, n-t]; weights are exact integers
    t = F.floor(F.col("_n") * F.lit(_TRIM))
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("_cum"), F.col("_n") - t) - F.greatest(lo, t + 1) + 1,
    )
    trim = (
        s.withColumn("_w", kept)
        .filter(F.col("_w") > 0)
        .groupBy(key)
        .agg(
            (F.sum(F.col("_v") * F.col("_w")).cast("double") / F.sum("_w")).alias("_tm")
        )
    )

    pq1 = F.floor((F.col("_n") + 3) / 4)
    pq3 = F.floor((3 * F.col("_n") + 1) / 4)
    quart = (
        s.filter(pq1.between(lo, F.col("_cum")) | pq3.between(lo, F.col("_cum")))
        .groupBy(key)
        .agg(F.min("_v").alias("_q1"), F.max("_v").alias("_q3"))
    )

    # deviation SPECTRUM: |v - med| computed once per distinct value
    # (identical doubles to the per-row form), re-gridded at the
    # half-cent DECIMAL(18,3) — a dyadic double never ties on it —
    # and re-aggregated (two deviations can land on one grid point)
    dev = (
        spec.join(med, key)
        .select(
            F.col(key),
            F.abs(F.col("_v").cast("double") - F.col("med"))
            .cast("decimal(18,3)")
            .alias("_dv"),
            "_c",
        )
        .groupBy(key, "_dv")
        .agg(F.sum("_c").alias("_c"))
    )
    mad = _median_of_spectrum(dev, key, "_dv", "_c").withColumnRenamed("med", "_mad")

    n_df = spec.groupBy(key).agg(F.sum("_c").alias("n"))

    return (
        n_df.join(med, key)
        .join(trim, key)
        .join(quart, key)
        .join(mad, key)
        .select(
            key,
            "n",
            F.col("med").alias("median"),
            F.round(F.col("_tm"), 6).alias("trimmed_mean"),
            F.col("_mad").alias("mad"),
            F.col("_q1").cast("double").alias("q1"),
            F.col("_q3").cast("double").alias("q3"),
        )
        .orderBy(key)
    )


def robust_stats_sql(
    table: str = "events", key: str = "event_type", val: str = "value"
) -> str:
    """DuckDB twin — deliberately the INDEPENDENT row_number/rank
    algorithm (not the spectrum), so the oracle certifies the
    spectrum rewrite against a different computation of the same
    statistics."""
    return f"""
WITH base AS (SELECT {key} AS k, CAST({val} AS DECIMAL(18,2)) AS v FROM {table}),
ranked AS (
  SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM base
),
med AS (
  SELECT k, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS med FROM ranked
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY k
),
trim AS (
  SELECT k, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS tm FROM (
    SELECT k, v, rn, n, CAST(floor(n * {_TRIM}) AS BIGINT) AS kk FROM ranked)
  WHERE rn > kk AND rn <= n - kk GROUP BY k
),
quart AS (
  SELECT k, MIN(v) AS q1, MAX(v) AS q3 FROM ranked
  WHERE rn = CAST(floor((n + 3) / 4) AS BIGINT)
     OR rn = CAST(floor((3 * n + 1) / 4) AS BIGINT)
  GROUP BY k
),
dev AS (
  SELECT b.k, CAST(abs(CAST(b.v AS DOUBLE) - m.med) AS DECIMAL(18,3)) AS v
  FROM base b JOIN med m USING (k)
),
devranked AS (
  SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS n
  FROM dev
),
mad AS (
  SELECT k, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mad FROM devranked
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY k
),
nn AS (SELECT k, COUNT(*)::BIGINT AS n FROM base GROUP BY k)
SELECT nn.k AS {key}, nn.n,
       med.med AS median,
       ROUND(trim.tm, 6) AS trimmed_mean,
       mad.mad AS mad,
       CAST(quart.q1 AS DOUBLE) AS q1,
       CAST(quart.q3 AS DOUBLE) AS q3
FROM nn JOIN med USING (k) JOIN trim USING (k) JOIN quart USING (k) JOIN mad USING (k)
ORDER BY {key}
"""
