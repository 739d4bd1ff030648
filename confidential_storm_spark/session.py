"""SparkSession factory with scale-appropriate defaults.

Local mode mirrors the driver environment (local[$SPARK_GRAFT_CPUS]);
on a real cluster the same configs apply, only master changes.  The
defaults are chosen for the 100 TB design point:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (every pandas-UDF boundary is Arrow-batched)
- shuffle partitions sized to cores locally; a cluster deployment
  should size them to ~128 MB of shuffle data per partition.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "confidential-storm-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE: adaptive.coalescePartitions.initialPartitionNum=128 was
        # A/B-measured: ~20% faster on the sf1 quadratic pair join but
        # ~10% slower across the 63-query sf0.1 registry (task-launch
        # overhead on small shuffles dominates).  At real cluster scale
        # raise it (or shuffle.partitions) with executor count; left
        # unset here where small queries dominate the mix.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # some driver data generations store events.ts as
        # TIMESTAMP(NANOS), which Spark 4 rejects unless read as long
        # nanos; sources.tables.ts_to_micros normalizes either way
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
