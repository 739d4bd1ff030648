"""Measured A/B for multi-dimensional data layout: how much of a scan
does stock parquet min/max skipping eliminate under (a) the natural
write order, (b) a single-column sort, (c) a Z-order layout
(sources/writers.py::write_zordered) — for 2-D box predicates that
touch BOTH dimensions.

Why this matters at 100 TB: a recurring pipeline that filters on two
independent columns (ship date AND part key, user AND time, source AND
quality band) cannot serve both from one single-column sort — the
second predicate reads everything.  Z-order gives every file a small
bounding box in EVERY clustered dimension, so ordinary footer-stats
skipping (no reader cooperation, no table format needed) prunes on
all of them at once.  This tool measures BOTH levels of the effect:

- structural: the fraction of row groups whose [min, max] footer box
  misses the predicate (read straight from the parquet footers with
  pyarrow — this is exactly the information any engine's scan pruning
  uses), and
- end-to-end: wall time of the identical Spark aggregation over each
  layout (Spark prunes at row-group granularity through the pushed
  filters).

Writes benchmark/zorder_pruning_ab.csv.

Usage: python tools/zorder_pruning_ab.py [sf_dir] [n_files]
Default sf_dir /tmp/spark_graft_sf1 (make with tools/make_big_sf.py 10).
"""

from __future__ import annotations

import csv
import glob
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# 2-D box predicates over lineitem: a date window AND a part-key band.
# Selectivities chosen around ~1-2% so pruning, not compute, dominates.
DATE_LO, DATE_HI = "1996-03-01", "1996-06-01"
PART_FRAC = 0.10  # probe the lowest 10% of the part-key domain


def _rg_prunable(path: str, preds: dict[str, tuple]) -> tuple[int, int]:
    """(prunable, total) row groups across all files of a layout, by
    footer min/max against every predicate (a group survives only if
    EVERY predicate's range intersects its stats)."""
    import pyarrow.parquet as pq

    prunable = total = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(j).name: j for j in range(md.num_columns)}
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            total += 1
            for col, (lo, hi) in preds.items():
                st = rg.column(names[col]).statistics
                if st is None or not st.has_min_max:
                    break  # no stats: cannot prune on this column
                if st.max < lo or st.min >= hi:
                    prunable += 1
                    break
    return prunable, total


def _timed(spark, path: str, runs: int = 3) -> list[float]:
    from pyspark.sql import functions as F

    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .where(
                (F.col("l_shipdate") >= F.lit(DATE_LO).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(DATE_HI).cast("timestamp"))
                & (F.col("l_partkey") < F.lit(_part_hi(path)))
            )
            .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
            .collect()
        )
        out.append(time.perf_counter() - t0)
    return out


_PART_HI_CACHE: dict[str, int] = {}


def _part_hi(path: str) -> int:
    return _PART_HI_CACHE["hi"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        raise SystemExit(
            f"{sf_dir} missing — generate with: python tools/make_big_sf.py 10 {sf_dir}"
        )

    from pyspark.sql import functions as F

    from confidential_storm_spark.session import get_spark
    from confidential_storm_spark.sources.writers import write_zordered

    spark = get_spark(app_name="csspark-zorder-ab")
    spark.range(1).count()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pk_max = li.agg(F.max("l_partkey")).collect()[0][0]
    _PART_HI_CACHE["hi"] = int(pk_max * PART_FRAC)

    # integer day for the z-value (non-negative int contract)
    li2 = li.withColumn(
        "_ship_day", F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")).cast("long")
    )

    base = "/tmp/spark_graft_cache/zorder_ab"
    layouts = {}

    # (a) natural order, same file count (round-robin: no clustering)
    p = f"{base}/natural"
    if not os.path.exists(f"{p}/_SUCCESS"):
        li2.repartition(n_files).write.mode("overwrite").parquet(p)
    layouts["natural"] = p

    # (b) single-column sort on the DATE only
    p = f"{base}/sort_date"
    if not os.path.exists(f"{p}/_SUCCESS"):
        (
            li2.repartitionByRange(n_files, "_ship_day")
            .sortWithinPartitions("_ship_day")
            .write.mode("overwrite")
            .parquet(p)
        )
    layouts["sort_date"] = p

    # (c) z-order on (day, partkey)
    p = f"{base}/zorder"
    if not os.path.exists(f"{p}/_SUCCESS"):
        write_zordered(li2, p, ["_ship_day", "l_partkey"], n_files=n_files)
    layouts["zorder"] = p

    import datetime

    date_lo = datetime.datetime.fromisoformat(DATE_LO)
    date_hi = datetime.datetime.fromisoformat(DATE_HI)
    preds = {
        "l_shipdate": (date_lo, date_hi),
        "l_partkey": (0, _PART_HI_CACHE["hi"]),
    }

    rows = []
    for name, path in layouts.items():
        prunable, total = _rg_prunable(path, preds)
        walls = _timed(spark, path)
        rows.append(
            {
                "layout": name,
                "row_groups": total,
                "prunable_row_groups": prunable,
                "prunable_frac": round(prunable / total, 4),
                "wall_median_s": round(statistics.median(walls), 3),
                "wall_min_s": round(min(walls), 3),
                "wall_max_s": round(max(walls), 3),
            }
        )
        print(rows[-1])

    out = os.path.join(REPO, "benchmark", "zorder_pruning_ab.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
