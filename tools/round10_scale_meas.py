"""Round-10 scale measurements: the queries whose sf10 rows were
skipped or >30x in round 9, re-measured under this round's scale-safe
DEFAULT dials (VERDICT r9 #2/#3/#5 closures).

Each measurement runs solo (fresh timing after a warm-up pass where
noted), against the synthesized sf dirs from tools/make_big_sf.py.
Appends rows to benchmark/round10_scale.csv:
  query,sf,n_items,wall_s,rows,note

Usage: python tools/round10_scale_meas.py [sf1_dir] [sf10_dir]
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CSV = os.path.join(REPO, "benchmark", "round10_scale.csv")


def timed(fn, runs=2):
    walls = []
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        walls.append(time.time() - t0)
        gc.collect()
    return min(walls), n


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf10"

    from confidential_storm_spark.operators.clustering import semantic_neardup_pairs
    from confidential_storm_spark.operators.mediahash import (
        image_blockmean_neardup,
        media_corpus,
    )
    from confidential_storm_spark.plans import queries as Q
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="round10-scale")
    rows_out = []

    def rec(query, sf, n_items, wall, rows, note):
        line = f"{query},{sf},{n_items},{wall:.1f},{rows},{note}"
        rows_out.append(line)
        print(line, flush=True)

    for sf_name, sf_dir in (("1", sf1), ("10", sf10)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_docs, n_emb = docs.count(), emb.count()

        # 1. capped bit-sampling Hamming LSH (the registry entry's plan)
        w, n = timed(lambda: Q.dedup_simhash_lsh_capped(spark, sf_dir).count())
        rec("dedup_simhash_lsh_capped", sf_name, n_docs, w, n,
            "production cap=1000; was SKIPPED uncapped at sf10")

        # 2. semantic dedup at the NEW default dial (k = N / target)
        w, n = timed(
            lambda: semantic_neardup_pairs(emb, threshold=0.4).count()
        )
        rec("dedup_semantic_default_dial", sf_name, n_emb, w, n,
            "k=None scale default (ceil(N/2000) clusters); fixed k=16 measured 133x in r9")

        # 3. media image dedup under method='auto'
        w, n = timed(
            lambda: image_blockmean_neardup(media_corpus(docs, "image")).count()
        )
        from confidential_storm_spark.operators.mediahash import (
            BANDED_MAX_ITEMS,
            PERT_EVERY,
        )

        n_media = n_docs + n_docs // PERT_EVERY  # media_corpus's exact size
        note = (
            f"auto->banded (<= {BANDED_MAX_ITEMS} items)"
            if n_media <= BANDED_MAX_ITEMS
            else "auto->bit-sampling LSH (scale dials); was SKIPPED at sf10"
        )
        rec("dedup_media_image_auto", sf_name, n_docs, w, n, note)

    header = "query,sf,n_items,wall_s,rows,note\n"
    exists = os.path.exists(CSV)
    with open(CSV, "a") as f:
        if not exists:
            f.write(header)
        f.write("\n".join(rows_out) + "\n")
    print(f"wrote {len(rows_out)} rows -> {CSV}")


if __name__ == "__main__":
    main()
