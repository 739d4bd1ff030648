"""Robust per-key statistics: median, trimmed mean, MAD, IQR — the
outlier-resistant profile a curation pipeline wants for metric
columns (means hide heavy tails; a 100 TB crawl's `value`-style
columns are all heavy-tailed).

Engine-portable by construction: no percentile_approx, no engine
`percentile`/`quantile_cont` (their interpolation arithmetic is a
cross-engine float hazard).  Quantiles are EXACT rank selections —
row_number over a per-key sort, pick the middle row(s); the one-or-two
middles are combined as an exact DECIMAL SUM cast to double and
divided by the count (one deterministic IEEE divide — never AVG, and
never interpolation between engine-computed fractions).  Duplicate
values make tie order irrelevant: selection is by position in a
value-ordered sequence, and equal values are interchangeable.

Scale: windows are PARTITION-KEYED (per event_type), never global —
each key sorts independently; with K keys and N rows the shuffle is
the same groupBy-shaped exchange any per-key aggregate pays.  MAD
runs the same machinery once more over |x - median(key)|.

Reference: beyond-reference profiling op (the reference engine has
no statistics layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robust_stats", "robust_stats_sql"]

_DEC = "decimal(18,2)"
_TRIM = 0.1  # fraction trimmed from EACH end (floor(n*_TRIM) rows)


def _median_on(df: DataFrame, key: str, val_dec: str) -> DataFrame:
    """(key, med): exact median of a DECIMAL column — the one or two
    middle positions, exact-decimal-summed then IEEE-divided."""
    w = Window.partitionBy(key).orderBy(val_dec)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(key))
    )
    mid = ranked.filter(
        (F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        | (F.col("_rn") == F.floor((F.col("_n") + 2) / 2))
    )
    # one row when n is odd (both positions coincide), two when even.
    # exact-decimal SUM cast to double, then an IEEE divide — NOT
    # AVG(): DuckDB's AVG on decimals returns a float-summed double,
    # which breaks the exactness contract
    return mid.groupBy(key).agg(
        (F.sum(val_dec).cast("double") / F.count(F.lit(1))).alias("med")
    )


def robust_stats(
    df: DataFrame, key: str = "event_type", val: str = "value"
) -> DataFrame:
    """Per-key robust profile: n, median, trimmed mean (10% each
    end), MAD (median absolute deviation), IQR bounds (exact rank
    quartiles: position floor((n+3)/4) and floor((3n+1)/4) of the
    sorted values — a fixed-position convention, no interpolation).

    Sums run in DECIMAL; the only divisions are single deterministic
    IEEE ops; outputs cast to double on the report grid."""
    vdec = f"_v"
    base = df.select(F.col(key), F.col(val).cast(_DEC).alias(vdec))

    w = Window.partitionBy(key).orderBy(vdec)
    ranked = base.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(key))
    )

    med = _median_on(base, key, vdec)

    trim = (
        ranked.withColumn("_k", F.floor(F.col("_n") * F.lit(_TRIM)))
        .filter((F.col("_rn") > F.col("_k")) & (F.col("_rn") <= F.col("_n") - F.col("_k")))
        .groupBy(key)
        .agg((F.sum(vdec).cast("double") / F.count(F.lit(1))).alias("_tm"))
    )

    quart = ranked.filter(
        (F.col("_rn") == F.floor((F.col("_n") + 3) / 4))
        | (F.col("_rn") == F.floor((3 * F.col("_n") + 1) / 4))
    ).groupBy(key).agg(
        F.min(vdec).alias("_q1"), F.max(vdec).alias("_q3")
    )

    # deviations live on the half-cent grid (median of 2-decimal
    # values has <=3 decimals), so they re-enter the rank machinery as
    # DECIMAL(18,3): the double |v - med| is dyadic (never a .0005
    # tie), and both engines compute the identical double, so the
    # 3-decimal cast is deterministic and equal cross-engine
    dev = base.join(med, key).select(
        F.col(key),
        F.abs(F.col(vdec).cast("double") - F.col("med"))
        .cast("decimal(18,3)")
        .alias(vdec),
    )
    mad = _median_on(dev, key, vdec).withColumnRenamed("med", "_mad")

    n_df = base.groupBy(key).agg(F.count(F.lit(1)).alias("n"))

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
    """DuckDB twin — identical rank selections and decimal grid."""
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
