"""Bounded-memory frequency/cardinality sketches, deterministic and
cross-engine-exact.

At 100 TB, ``COUNT(DISTINCT ...)`` per key and exact per-value counts
are shuffle-heavy (state grows with cardinality); the standard answer
is mergeable sketches whose per-key state is a fixed-size register
array.  Spark's built-ins (``approx_count_distinct``) implement
HyperLogLog++ but their register hashing is engine-private, so results
can't be oracle-checked.  These operators instead derive every hash
from ``md5`` — identical in Spark, DuckDB, and Python — so the SAME
estimate comes out of both engines and the driver's value-hash gate
applies to the approximate path, not just an exact twin.

- :func:`hll_distinct` — per-key HyperLogLog (Flajolet et al. 2007)
  with p=12 (4096 registers): register index = first 12 md5 bits,
  rank = leading-zero count of the next 48 bits + 1.  The register
  harmonic sum is kept in INTEGER arithmetic (``sum(2^(49-rho))``,
  max 2^61) so partial-aggregation order cannot perturb the estimate;
  the one floating division happens once at the end.  Small-range
  linear counting (E <= 2.5m with empty registers) per the paper.
- :func:`cms_estimates` — Count-Min (Cormode & Muthukrishnan 2005)
  with depth 4 x width 1024 integer counters; row-d hash =
  ``md5(d || ':' || value)``.  Estimates upper-bound true counts
  (one-sided error), proven in tests.

Scale design: both sketches are classic two-level aggregations —
``groupBy(key, register)`` then ``groupBy(key)`` — map-side
combinable, skew-free (register indexes are uniform by construction),
with per-key state bounded at m registers / d*w counters no matter how
many distinct values stream past.  Sketch rows are themselves
mergeable partials: union two corpora's register tables and re-run the
same max/sum to combine.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct",
    "hll_distinct_sql",
    "hll_registers_keyed",
    "hll_merge_registers",
    "hll_finish_keyed",
    "hll_set_estimates",
    "hll_set_estimates_sql",
    "cms_estimates",
    "cms_estimates_sql",
    "cms_sketch_rows",
    "cms_join_size",
    "cms_join_size_sql",
    "cms_join_hotkeys",
    "cms_join_hotkeys_sql",
    "histogram_quantiles",
    "histogram_quantiles_sql",
]

HLL_P = 12                      # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
# rank field reads 48 bits => rho in [1, 49]
_HLL_RANK_BITS = 48
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_bucket(col: Column) -> Column:
    # first 3 hex chars = 12 bits
    return F.conv(F.substring(F.md5(col), 1, 3), 16, 10).cast("long")


def _hll_rho(col: Column) -> Column:
    # next 12 hex chars = 48 bits; rho = leading zeros + 1 = 49 - bitlen
    hx = F.substring(F.md5(col), 4, 12)
    bits = F.conv(hx, 16, 2)
    return F.when(bits == "0", F.lit(_HLL_RANK_BITS + 1)).otherwise(
        F.lit(_HLL_RANK_BITS + 1) - F.length(bits)
    )


def hll_registers_keyed(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """The per-key (register, max-rank) relation — the MERGEABLE
    partial a rollup table stores: ``key_cols + [_b, _rho]``, at most
    m rows per key whatever the cardinality.  Because the finish is a
    pure function of max-per-register, re-grouping these rows by any
    COARSER key (drop a dimension, widen a time bucket) with
    ``max(_rho)`` yields exactly the registers a direct scan of the
    coarser slice would produce — the algebra behind sketch rollup
    MVs (:mod:`..operators.mv`)."""
    v = F.col(value_col).cast("string")
    return (
        df.select(*key_cols, _hll_bucket(v).alias("_b"), _hll_rho(v).alias("_r"))
        .groupBy(*key_cols, "_b")
        .agg(F.max("_r").alias("_rho"))
    )


def hll_merge_registers(regs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge a register relation down to coarser keys (register-wise
    max) — sketch-storage union, never touching raw data."""
    return regs.groupBy(*key_cols, "_b").agg(F.max("_rho").alias("_rho"))


def hll_finish_keyed(
    regs: DataFrame, key_cols: list[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Per-key estimate from a register relation (integer harmonic
    sum, linear-counting branch; one double division per key)."""
    # integer harmonic sum: sum over HIT registers of 2^(49-rho);
    # each EMPTY register contributes 2^49 (rho=0), added via V below
    per_key = regs.groupBy(*key_cols).agg(
        F.sum(F.expr(f"CAST(power(2.0, {_HLL_RANK_BITS + 1} - _rho) AS BIGINT)")).alias("_s_hit"),
        F.count(F.lit(1)).alias("_hit"),
    )
    m, scale = HLL_M, float(1 << (_HLL_RANK_BITS + 1))
    v_empty = F.lit(m) - F.col("_hit")
    s_full = F.col("_s_hit") + v_empty * F.lit(1 << (_HLL_RANK_BITS + 1))
    e_raw = F.lit(_HLL_ALPHA * m * m * scale) / s_full.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(e_raw)
    return per_key.select(*key_cols, F.round(est, 4).alias(out_col))


def hll_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-key HLL distinct count of ``value_col``; returns
    ``key_cols + [out_col]`` with the estimate rounded to 4 decimals.
    """
    return hll_finish_keyed(
        hll_registers_keyed(df, key_cols, value_col), key_cols, out_col
    )


def hll_distinct_sql(
    table: str,
    key_cols: list[str],
    value_col: str,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB twin of :func:`hll_distinct` (identical md5 register
    math, integer harmonic sum, linear-counting branch)."""
    keys = ", ".join(key_cols)
    m, rb = HLL_M, _HLL_RANK_BITS
    scale = 1 << (rb + 1)
    # e0 suffix: DuckDB otherwise parses x.y literals as DECIMAL and
    # overflows the register-sum multiplication; Spark computes the
    # same numerator as one Python double literal (same IEEE order)
    num = f"({_HLL_ALPHA!r}e0 * {m}e0 * {m}e0 * {scale}e0)"
    return f"""
WITH _h AS (
  SELECT {keys}, md5(CAST({value_col} AS VARCHAR)) AS _md5 FROM {table}
),
_regs AS (
  SELECT {keys},
         CAST('0x' || substr(_md5, 1, 3) AS BIGINT) AS _b,
         MAX(CASE WHEN CAST('0x' || substr(_md5, 4, 12) AS BIGINT) = 0
                  THEN {rb + 1}
                  ELSE {rb + 1} - length(bin(CAST('0x' || substr(_md5, 4, 12) AS BIGINT)))
             END) AS _rho
  FROM _h GROUP BY {keys}, _b
),
_pk AS (
  SELECT {keys},
         SUM(CAST(power(2.0, {rb + 1} - _rho) AS BIGINT)) AS _s_hit,
         COUNT(*) AS _hit
  FROM _regs GROUP BY {keys}
)
SELECT {keys},
       ROUND(CASE WHEN {num} / CAST(_s_hit + ({m} - _hit) * CAST({scale} AS BIGINT) AS DOUBLE)
                       <= {2.5 * m!r}e0
                       AND ({m} - _hit) > 0
                  THEN {m}e0 * ln({m}e0 / ({m} - _hit))
                  ELSE {num} / CAST(_s_hit + ({m} - _hit) * CAST({scale} AS BIGINT) AS DOUBLE)
             END, 4) AS {out_col}
FROM _pk
"""


def _hll_regs(df: DataFrame, value_col: str) -> DataFrame:
    """The (register, max-rank) relation of one HLL sketch — the
    MERGEABLE partial: union two of these and take max per register to
    sketch the union of the underlying sets."""
    v = F.col(value_col).cast("string")
    return (
        df.select(_hll_bucket(v).alias("_b"), _hll_rho(v).alias("_r"))
        .groupBy("_b")
        .agg(F.max("_r").alias("_rho"))
    )


def _hll_finish(regs: DataFrame, out_col: str) -> DataFrame:
    """Single-row estimate from a register relation (same math as
    :func:`hll_distinct`'s keyed finish)."""
    per = regs.agg(
        F.sum(
            F.expr(f"CAST(power(2.0, {_HLL_RANK_BITS + 1} - _rho) AS BIGINT)")
        ).alias("_s_hit"),
        F.count(F.lit(1)).alias("_hit"),
    )
    m, scale = HLL_M, float(1 << (_HLL_RANK_BITS + 1))
    v_empty = F.lit(m) - F.col("_hit")
    s_full = F.col("_s_hit") + v_empty * F.lit(1 << (_HLL_RANK_BITS + 1))
    e_raw = F.lit(_HLL_ALPHA * m * m * scale) / s_full.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(e_raw)
    return per.select(F.round(est, 4).alias(out_col))


def hll_set_estimates(
    df: DataFrame,
    value_col: str,
    pred_a: Column,
    pred_b: Column,
) -> DataFrame:
    """HLL set algebra over two cohorts: one row with ``est_a``,
    ``est_b``, ``est_union``, ``est_intersection``.

    The union estimate is computed by MERGING the two sketches
    (register-wise max), never re-scanning the union of the data —
    the property that lets a warehouse keep one sketch per partition /
    day / source and answer cross-slice cardinalities from sketch
    storage alone.  Intersection is inclusion-exclusion over the three
    estimates (the standard HLL derivation; error compounds
    accordingly).  All register math is md5-deterministic, so the
    DuckDB twin reproduces identical estimates and the driver's
    value-hash gate certifies the approximate path itself.
    """
    regs_a = _hll_regs(df.filter(pred_a), value_col)
    regs_b = _hll_regs(df.filter(pred_b), value_col)
    regs_u = (
        regs_a.unionByName(regs_b).groupBy("_b").agg(F.max("_rho").alias("_rho"))
    )
    est = (
        _hll_finish(regs_a, "est_a")
        .crossJoin(_hll_finish(regs_b, "est_b"))
        .crossJoin(_hll_finish(regs_u, "est_union"))
    )
    return est.withColumn(
        "est_intersection",
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4),
    )


def _hll_finish_sql(regs_cte: str, out_col: str) -> str:
    m, rb = HLL_M, _HLL_RANK_BITS
    scale = 1 << (rb + 1)
    num = f"({_HLL_ALPHA!r}e0 * {m}e0 * {m}e0 * {scale}e0)"
    return f"""
  SELECT ROUND(CASE WHEN {num} / CAST(_s_hit + ({m} - _hit) * CAST({scale} AS BIGINT) AS DOUBLE)
                         <= {2.5 * m!r}e0
                         AND ({m} - _hit) > 0
                    THEN {m}e0 * ln({m}e0 / ({m} - _hit))
                    ELSE {num} / CAST(_s_hit + ({m} - _hit) * CAST({scale} AS BIGINT) AS DOUBLE)
               END, 4) AS {out_col}
  FROM (SELECT SUM(CAST(power(2.0, {rb + 1} - _rho) AS BIGINT)) AS _s_hit,
               COUNT(*) AS _hit
        FROM {regs_cte})"""


def hll_set_estimates_sql(
    table: str, value_col: str, pred_a: str, pred_b: str
) -> str:
    """DuckDB twin of :func:`hll_set_estimates` (identical registers,
    merge, and finishing arithmetic)."""
    rb = _HLL_RANK_BITS

    def regs(pred: str) -> str:
        return f"""(
  SELECT CAST('0x' || substr(_md5, 1, 3) AS BIGINT) AS _b,
         MAX(CASE WHEN CAST('0x' || substr(_md5, 4, 12) AS BIGINT) = 0
                  THEN {rb + 1}
                  ELSE {rb + 1} - length(bin(CAST('0x' || substr(_md5, 4, 12) AS BIGINT)))
             END) AS _rho
  FROM (SELECT md5(CAST({value_col} AS VARCHAR)) AS _md5 FROM {table} WHERE {pred})
  GROUP BY _b)"""

    return f"""
WITH _ra AS {regs(pred_a)},
_rb AS {regs(pred_b)},
_ru AS (SELECT _b, MAX(_rho) AS _rho
        FROM (SELECT * FROM _ra UNION ALL SELECT * FROM _rb) GROUP BY _b),
_ea AS ({_hll_finish_sql('_ra', 'est_a')}),
_eb AS ({_hll_finish_sql('_rb', 'est_b')}),
_eu AS ({_hll_finish_sql('_ru', 'est_union')})
SELECT est_a, est_b, est_union,
       ROUND(est_a + est_b - est_union, 4) AS est_intersection
FROM _ea, _eb, _eu
"""


CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_slot(col: Column, row: int) -> Column:
    # 15 hex chars = 60 bits, mod width
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 15), 16, 10)
        .cast("long")
        % CMS_WIDTH
    )


def cms_estimates(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    out_col: str = "cms_count",
) -> DataFrame:
    """Count-Min frequency estimates for every distinct value of
    ``value_col``: ``(value_col, cms_count)``, where ``cms_count`` is
    the min over depth rows of the hashed-slot counters.

    The sketch itself (``depth x width`` counters) is the bounded
    structure; probing every distinct value here is for the oracle —
    at scale you probe a candidate list (e.g. heavy hitters from a
    sample) against the tiny broadcast sketch, which is exactly the
    plan below (sketch side is <= depth*width rows, broadcast).
    """
    v = F.col(value_col).cast("string")
    rows = F.array(*[F.struct(F.lit(d).alias("_d"), _cms_slot(v, d).alias("_slot")) for d in range(depth)])
    hashed = df.select(v.alias(value_col), F.explode(rows).alias("_h")).select(
        value_col, F.col("_h._d").alias("_d"), F.col("_h._slot").alias("_slot")
    )
    sketch = hashed.groupBy("_d", "_slot").agg(F.count(F.lit(1)).alias("_n"))
    probes = hashed.distinct()
    return (
        probes.join(F.broadcast(sketch), ["_d", "_slot"])
        .groupBy(value_col)
        .agg(F.min("_n").alias(out_col))
    )


def cms_estimates_sql(
    table: str,
    value_col: str,
    depth: int = CMS_DEPTH,
    out_col: str = "cms_count",
) -> str:
    """DuckDB twin of :func:`cms_estimates`."""
    return f"""
WITH _v AS (SELECT CAST({value_col} AS VARCHAR) AS {value_col} FROM {table}),
_hash AS (
  SELECT {value_col}, dd.d AS _d,
         CAST('0x' || substr(md5(dd.d || ':' || {value_col}), 1, 15) AS BIGINT)
             % {CMS_WIDTH} AS _slot
  FROM _v CROSS JOIN (SELECT unnest(range(0, {depth})) AS d) dd
),
_sketch AS (SELECT _d, _slot, COUNT(*) AS _n FROM _hash GROUP BY _d, _slot),
_probes AS (SELECT DISTINCT {value_col}, _d, _slot FROM _hash)
SELECT {value_col}, MIN(_n) AS {out_col}
FROM _probes JOIN _sketch USING (_d, _slot)
GROUP BY {value_col}
"""


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    lo: int = 0,
    width: int = 10,
    n_buckets: int = 64,
) -> DataFrame:
    """Equi-width histogram quantile estimates — the bounded-state
    alternative to exact percentiles (whose sort/percentile_disc state
    grows with the data).  The sketch is ``n_buckets`` integer counts;
    quantile q interpolates linearly inside the bucket where the
    cumulative count crosses ``ceil(q*N)``.  Everything up to the one
    final division is integer arithmetic, so the estimate is
    partition-order invariant and the DuckDB twin reproduces it
    exactly; estimates are within one bucket ``width`` of the true
    quantile by construction.

    Output: ``(q double, est double)``, one row per requested q.

    Plan shape: ONE map-side-combinable groupBy on the bucket id
    (<= n_buckets rows survive), a bounded n_buckets^2 pair-join for
    the cumulative sums (deliberately NOT a global window — no
    single-partition WindowExec anywhere in this codebase), then a
    broadcast-sized join against the q list.  At 100 TB the only
    full-data pass is the bucketing scan.
    """
    nb = n_buckets
    # explicit floor: Spark's cast-to-long truncates but DuckDB's CAST
    # rounds, so the shared semantics must be floor in both engines
    b = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / width).cast("long"), F.lit(0)),
        F.lit(nb - 1),
    )
    buckets = df.select(b.alias("_b")).groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    cum = (
        buckets.alias("x")
        .join(buckets.alias("y"), F.col("y._b") <= F.col("x._b"))
        .groupBy(F.col("x._b").alias("_b"), F.col("x._c").alias("_c"))
        .agg(F.sum("y._c").alias("_cum"))
    )
    n_total = df.count()
    q_rows = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    targets = (
        cum.select(q_rows, "_b", "_c", "_cum")
        .withColumn("_target", F.ceil(F.col("q") * n_total).cast("long"))
        .filter(F.col("_cum") >= F.col("_target"))
    )
    first = targets.groupBy("q", "_target").agg(F.min("_b").alias("_b"))
    hit = first.join(cum, "_b").select(
        "q",
        (
            F.lit(float(lo))
            + F.col("_b") * F.lit(float(width))
            + F.lit(float(width))
            * (F.col("_target") - (F.col("_cum") - F.col("_c")))
            / F.col("_c")
        ).alias("_est"),
    )
    return hit.select("q", F.round(F.col("_est"), 6).alias("est")).orderBy("q")


def histogram_quantiles_sql(
    table: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    lo: int = 0,
    width: int = 10,
    n_buckets: int = 64,
) -> str:
    """DuckDB twin of :func:`histogram_quantiles` (identical buckets,
    integer cumulative sums, interpolation arithmetic)."""
    nb = n_buckets
    # CAST: DuckDB otherwise types the literals DECIMAL, and a
    # DECIMAL q prints "0.10" where Spark's double prints "0.1"
    q_vals = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in qs)
    return f"""
WITH _bk AS (
  SELECT LEAST(GREATEST(CAST(FLOOR(({value_col} - {lo}) / {width}) AS BIGINT), 0), {nb - 1}) AS _b,
         COUNT(*) AS _c
  FROM {table} GROUP BY 1
),
_cum AS (
  SELECT x._b AS _b, x._c AS _c, SUM(y._c) AS _cum
  FROM _bk x JOIN _bk y ON y._b <= x._b
  GROUP BY x._b, x._c
),
_n AS (SELECT COUNT(*) AS n FROM {table}),
_qs(q) AS (VALUES {q_vals}),
_first AS (
  SELECT q, CEIL(q * n) AS _target, MIN(_b) AS _b
  FROM _qs, _n, _cum
  WHERE _cum >= CEIL(q * n)
  GROUP BY q, CEIL(q * n)
)
SELECT q, ROUND({lo} + _cum._b * {width}.0
              + {width}.0 * (_target - (_cum._cum - _cum._c)) / _cum._c, 6) AS est
FROM _first JOIN _cum ON _first._b = _cum._b
ORDER BY q
"""


def cms_join_size(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Equi-join cardinality estimate WITHOUT running the join: the
    Count-Min inner product (Cormode & Muthukrishnan 2005, §4.2).
    |A ⋈ B on key| = Σ_k f_A(k)·f_B(k), and for each sketch row d,
    Σ_slot a_d[slot]·b_d[slot] upper-bounds that sum (colliding keys
    only ADD cross terms); the estimate is the min over rows.

    Returns one row ``(est_join_size, exact_join_size)``.  Cost: each
    side is one map-side-combinable groupBy into its ≤ depth·width-row
    sketch; the inner product joins two tiny relations — at 100 TB
    this is how a pipeline prices a proposed join (skew detection,
    shuffle sizing, plan gating) from sketches it maintains anyway,
    instead of running the join to see.  The exact value is computed
    here per-key (Σ over the key's two group counts — never
    materializing the joined rows) because the certified row should
    expose the estimate's error; a production probe drops it.
    """
    a = cms_sketch_rows(df_a, col_a, depth)
    b = cms_sketch_rows(df_b, col_b, depth)
    # DECIMAL(38,0) accumulation: slot counts at warehouse scale can
    # make n*nb exceed int64, and Spark's non-ANSI long sum would wrap
    # silently (DuckDB's twin already sums in HUGEINT)
    est = (
        a.join(b.withColumnRenamed("_n", "_nb"), ["_d", "_slot"])
        .groupBy("_d")
        .agg(
            F.sum(
                (F.col("_n") * F.col("_nb")).cast("decimal(38,0)")
            ).alias("_ip")
        )
        .agg(F.min("_ip").cast("long").alias("est_join_size"))
    )
    fa = df_a.groupBy(F.col(col_a).cast("string").alias("_k")).agg(
        F.count(F.lit(1)).alias("_ca")
    )
    fb = df_b.groupBy(F.col(col_b).cast("string").alias("_k")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    exact = fa.join(fb, "_k").agg(
        F.sum((F.col("_ca") * F.col("_cb")).cast("decimal(38,0)"))
        .cast("long")
        .alias("exact_join_size")
    )
    return est.crossJoin(exact)


def cms_sketch_rows(df: DataFrame, value_col: str, depth: int = CMS_DEPTH) -> DataFrame:
    """The materialized CMS: (_d, _slot, _n) counter rows (≤
    depth·width of them, whatever the input size) — the broadcastable
    standing artifact both the point estimates and the inner product
    consume."""
    v = F.col(value_col).cast("string")
    rows = F.array(
        *[
            F.struct(F.lit(d).alias("_d"), _cms_slot(v, d).alias("_slot"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_h"))
        .select(F.col("_h._d").alias("_d"), F.col("_h._slot").alias("_slot"))
        .groupBy("_d", "_slot")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def cms_join_size_sql(
    rel_a: str, col_a: str, rel_b: str, col_b: str, depth: int = CMS_DEPTH
) -> str:
    """DuckDB twin of :func:`cms_join_size`."""

    def sketch(rel: str, col: str) -> str:
        return f"""(
  SELECT dd.d AS _d,
         CAST('0x' || substr(md5(dd.d || ':' || CAST({col} AS VARCHAR)), 1, 15) AS BIGINT)
             % {CMS_WIDTH} AS _slot,
         COUNT(*) AS _n
  FROM {rel} CROSS JOIN (SELECT unnest(range(0, {depth})) AS d) dd
  GROUP BY 1, 2
)"""

    return f"""
WITH _sa AS {sketch(rel_a, col_a)},
_sb AS {sketch(rel_b, col_b)},
_ip AS (
  SELECT _sa._d, SUM(_sa._n * _sb._n) AS _ip
  FROM _sa JOIN _sb USING (_d, _slot) GROUP BY _sa._d
),
_est AS (SELECT CAST(MIN(_ip) AS BIGINT) AS est_join_size FROM _ip),
_fa AS (SELECT CAST({col_a} AS VARCHAR) AS _k, COUNT(*) AS _ca FROM {rel_a} GROUP BY 1),
_fb AS (SELECT CAST({col_b} AS VARCHAR) AS _k, COUNT(*) AS _cb FROM {rel_b} GROUP BY 1),
_ex AS (SELECT CAST(SUM(_ca * _cb) AS BIGINT) AS exact_join_size
        FROM _fa JOIN _fb USING (_k))
SELECT est_join_size, exact_join_size FROM _est CROSS JOIN _ex
"""


def cms_join_hotkeys(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 10,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """The skew advisor: which keys dominate a proposed equi-join,
    priced WITHOUT shuffling side B.  Side A's top-``k`` keys by exact
    frequency (TakeOrdered — deterministic under the (count DESC, key)
    total order) probe side B's Count-Min sketch; each key's estimated
    join contribution is ``cnt_a * cms_b(key)``.  The exact
    contribution rides along for the certified row (computed per-key
    from B's group counts, never materializing joined rows).

    Returns k rows (key, cnt_a, est_cnt_b, est_contrib, exact_contrib)
    ordered by (cnt_a DESC, key).  At 100 TB this is the pre-flight a
    pipeline runs before a fact-fact join: the top-k scan of A is one
    map-side-combinable pass + a k-row TakeOrdered; pricing is a k-row
    broadcast probe of B's ≤ depth·width standing sketch — if one
    key's est_contrib dwarfs the rest, route it to the salted join
    (operators/skew.py) or AQE skew split before paying the shuffle.
    """
    topk = (
        df_a.groupBy(F.col(col_a).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt_a"))
        .orderBy(F.desc("cnt_a"), F.col("key"))
        .limit(k)
    )
    sketch_b = cms_sketch_rows(df_b, col_b, depth)
    probes = topk.select(
        "key",
        "cnt_a",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("_d"),
                        _cms_slot(F.col("key"), d).alias("_slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_h"),
    ).select("key", "cnt_a", F.col("_h._d").alias("_d"), F.col("_h._slot").alias("_slot"))
    est = (
        probes.join(F.broadcast(sketch_b), ["_d", "_slot"], "left")
        .groupBy("key", "cnt_a")
        .agg(F.min(F.coalesce(F.col("_n"), F.lit(0))).alias("est_cnt_b"))
    )
    exact_b = df_b.groupBy(F.col(col_b).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    return (
        est.join(F.broadcast(exact_b), "key", "left")
        .select(
            "key",
            "cnt_a",
            "est_cnt_b",
            (F.col("cnt_a") * F.col("est_cnt_b"))
            .cast("decimal(38,0)")
            .cast("long")
            .alias("est_contrib"),
            (F.col("cnt_a") * F.coalesce(F.col("_cb"), F.lit(0)))
            .cast("decimal(38,0)")
            .cast("long")
            .alias("exact_contrib"),
        )
        .orderBy(F.desc("cnt_a"), F.col("key"))
    )


def cms_join_hotkeys_sql(
    rel_a: str, col_a: str, rel_b: str, col_b: str, k: int = 10, depth: int = CMS_DEPTH
) -> str:
    """DuckDB twin of :func:`cms_join_hotkeys`."""
    return f"""
WITH _topk AS (
  SELECT CAST({col_a} AS VARCHAR) AS key, COUNT(*) AS cnt_a
  FROM {rel_a} GROUP BY 1 ORDER BY cnt_a DESC, key LIMIT {k}
),
_sb AS (
  SELECT dd.d AS _d,
         CAST('0x' || substr(md5(dd.d || ':' || CAST({col_b} AS VARCHAR)), 1, 15) AS BIGINT)
             % {CMS_WIDTH} AS _slot,
         COUNT(*) AS _n
  FROM {rel_b} CROSS JOIN (SELECT unnest(range(0, {depth})) AS d) dd
  GROUP BY 1, 2
),
_probe AS (
  SELECT t.key, t.cnt_a, dd.d AS _d,
         CAST('0x' || substr(md5(dd.d || ':' || t.key), 1, 15) AS BIGINT)
             % {CMS_WIDTH} AS _slot
  FROM _topk t CROSS JOIN (SELECT unnest(range(0, {depth})) AS d) dd
),
_est AS (
  SELECT p.key, p.cnt_a, MIN(COALESCE(_sb._n, 0)) AS est_cnt_b
  FROM _probe p LEFT JOIN _sb USING (_d, _slot)
  GROUP BY p.key, p.cnt_a
),
_fb AS (SELECT CAST({col_b} AS VARCHAR) AS key, COUNT(*) AS _cb FROM {rel_b} GROUP BY 1)
SELECT e.key, e.cnt_a, e.est_cnt_b,
       CAST(e.cnt_a * e.est_cnt_b AS BIGINT) AS est_contrib,
       CAST(e.cnt_a * COALESCE(f._cb, 0) AS BIGINT) AS exact_contrib
FROM _est e LEFT JOIN _fb f USING (key)
ORDER BY cnt_a DESC, key
"""
