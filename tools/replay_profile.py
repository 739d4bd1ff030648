"""Break down where a stream_*_replay query's wall time goes.

Phases measured per query (one warm session):
  build+input   query function up to write_epoch_source's toPandas
                (approximated: total minus the instrumented pieces)
  epoch_write   write_epoch_source (driver-side pyarrow writes)
  stream_exec   start() .. awaitTermination (micro-batch loop)
  per-batch     batch timestamps from the foreachBatch sink
  fold+convert  latest_per fold + createDataFrame back to Spark
  action        the final .count()

Usage: python tools/replay_profile.py [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from confidential_storm_spark.plans.queries import build_queries
    from confidential_storm_spark.session import get_spark
    from confidential_storm_spark.streaming import replay as R

    spark = get_spark(app_name="replay-profile")
    spark.range(1).count()
    # warm the pandas-UDF worker pool and the streaming machinery once
    qs = build_queries()

    marks: dict[str, float] = {}
    batch_times: list[float] = []

    orig_write = R.write_epoch_source
    orig_replay = R.replay_available_now

    def timed_write(df, epoch_col, out_dir):
        t0 = time.perf_counter()
        out = orig_write(df, epoch_col, out_dir)
        marks["epoch_write"] = marks.get("epoch_write", 0.0) + time.perf_counter() - t0
        return out

    def timed_replay(spark_, input_df, epoch_col, transform, **kw):
        t0 = time.perf_counter()
        out = orig_replay(spark_, input_df, epoch_col, transform, **kw)
        marks["replay_total"] = marks.get("replay_total", 0.0) + time.perf_counter() - t0
        return out

    R.write_epoch_source = timed_write

    # also time the stream-exec region: wrap DataStreamWriter.start
    from pyspark.sql.streaming import DataStreamWriter

    orig_start = DataStreamWriter.start

    def timed_start(self, *a, **kw):
        marks["t_start"] = time.perf_counter()
        return orig_start(self, *a, **kw)

    DataStreamWriter.start = timed_start

    from pyspark.sql.streaming.query import StreamingQuery

    orig_await = StreamingQuery.awaitTermination

    def timed_await(self, *a, **kw):
        r = orig_await(self, *a, **kw)
        if "t_start" in marks:
            marks["stream_exec"] = marks.get("stream_exec", 0.0) + (
                time.perf_counter() - marks.pop("t_start")
            )
        return r

    StreamingQuery.awaitTermination = timed_await

    for name in args.queries:
        for run in range(args.runs):
            marks.clear()
            batch_times.clear()
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t_build = time.perf_counter() - t0
            n = df.count()
            t_total = time.perf_counter() - t0
            rest = t_build - marks.get("epoch_write", 0.0) - marks.get("stream_exec", 0.0)
            print(
                f"{name} run{run}: total={t_total:.2f}s action={t_total - t_build:.2f}s"
                f" epoch_write={marks.get('epoch_write', 0):.2f}s"
                f" stream_exec={marks.get('stream_exec', 0):.2f}s"
                f" build_rest(input+fold+convert)={rest:.2f}s rows={n}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
