"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship DP bounded-histogram pipeline at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full operator
registry (confidential_storm_spark.plans.queries) — one entry per
implemented operator from SURVEY §2 plus the training-data ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: clamp -> per-user
    C-bound -> keyed histogram, release form (SURVEY §7 Phase 1)."""
    from confidential_storm_spark.plans.queries import dp_bounded_histogram

    return dp_bounded_histogram(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from confidential_storm_spark.plans.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from confidential_storm_spark.plans.queries import build_oracles

    return build_oracles()
