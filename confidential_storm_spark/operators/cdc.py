"""Keyed snapshot diff — the change-data-capture primitive for
recurring pipelines.

A pipeline that republishes a derived table every cycle needs to know
WHAT changed, not just the new state: downstream consumers invalidate
caches by key, audits want the delta relation, and incremental sinks
(MERGE targets, search indexes, feature stores) apply exactly the
changed rows.  ``snapshot_diff`` compares two keyed snapshots and
emits one row per differing key, classified insert / delete / update,
with the old and new value of every compared column side by side.

Spark shape: ONE full-outer join on the key (both sides hash-partition
on it — on a bucketed/partitioned warehouse layout the exchange
disappears entirely, see sources/writers.write_bucketed), a null-safe
column comparison, and a filter that keeps only changed keys — the
output is proportional to the CHANGE volume, never the snapshot size.
The naive alternative (EXCEPT both directions + re-join to classify)
scans and shuffles each snapshot twice.

Null-safe semantics: a key present in both snapshots with every
compared column equal (NULL == NULL included, via ``eqNullSafe``) is
unchanged and suppressed; differing NULLness is an update.

Reference parity: confidentialstorm has no snapshot/merge machinery
(its sinks are append-only histogram files, SURVEY §2.2); this is
part of the beyond-reference training-data-pipeline family, composing
with writers.merge_upsert (the diff IS the merge source).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "snapshot_diff_sql"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff two keyed snapshots.

    Returns (keys..., change string, old_<c>/new_<c> for each compared
    column) for every key whose state differs:

    - ``insert`` — key only in ``new`` (old_* columns NULL),
    - ``delete`` — key only in ``old`` (new_* columns NULL),
    - ``update`` — key in both with any compared column differing
      null-safely.

    Unchanged keys are filtered out before the sink ever sees them.
    """
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = functools.reduce(
        operator.and_,
        [F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}")) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    same = functools.reduce(
        operator.and_,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        j.where(~in_old | ~in_new | ~same)
        .select(
            *[
                F.coalesce(F.col(f"_kn_{k}"), F.col(f"_ko_{k}")).alias(k)
                for k in keys
            ],
            change.alias("change"),
            *[
                c
                for pair in (
                    (F.col(f"old_{x}"), F.col(f"new_{x}"))
                    for x in compare_cols
                )
                for c in pair
            ],
        )
    )


def snapshot_diff_sql(
    old_rel: str,
    new_rel: str,
    keys: list[str],
    compare_cols: list[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff` over two relation
    subqueries (each must expose the key and compared columns).

    Caveat the Spark side does not share: presence is detected via
    ``o.<key> IS NULL`` on the first key column, so a snapshot whose
    KEY itself can be NULL would misclassify that row (the operator
    uses explicit presence markers instead).  Use NULL-free keys in
    twinned relations — the registry query aggregates by custkey,
    which is non-null by construction."""
    kj = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in keys)
    same = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in compare_cols
    )
    ksel = ", ".join(f"COALESCE(n.{k}, o.{k}) AS {k}" for k in keys)
    vsel = ", ".join(
        f"o.{c} AS old_{c}, n.{c} AS new_{c}" for c in compare_cols
    )
    ko = keys[0]
    return f"""
SELECT {ksel},
       CASE WHEN o.{ko} IS NULL THEN 'insert'
            WHEN n.{ko} IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       {vsel}
FROM ({old_rel}) o FULL OUTER JOIN ({new_rel}) n ON {kj}
WHERE o.{ko} IS NULL OR n.{ko} IS NULL OR NOT ({same})
"""
