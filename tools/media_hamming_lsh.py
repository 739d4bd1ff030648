"""Measured A/B for perceptual-hash near-dup at scale: the banded
join (pigeonhole-exact, but bucket space fixed at bands * 2^(64/bands)
= 2048 for bands=8 -> quadratic candidates) vs bit-sampling Hamming
LSH (dedup.hamming_lsh_pairs: L tables x k sampled bits -> L * 2^k
buckets, probabilistic recall 1-(1-p^k)^L, exact verification).

Ground truth at any scale: the synthetic media corpus PLANTS its
near-dup pairs — (d, d + PERT_OFFSET) for every PERT_EVERY-th doc — so
planted-pair recall is computable by one linear self-join on the hash
table, no quadratic oracle needed.  Where the corpus is small enough
the exact banded join also runs, giving total-pair recall (planted +
incidental collisions).

Writes/appends benchmark/media_hamming_lsh.csv.

Usage: python tools/media_hamming_lsh.py DATA_DIR LABEL [--exact]
  --exact  also run the uncapped banded join (only safe <= ~100k items)
"""

from __future__ import annotations

import csv
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

MAX_HAMMING = 7


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--exact"]
    run_exact = "--exact" in sys.argv
    data_dir = args[0]
    label = args[1]

    from pyspark.sql import functions as F

    from confidential_storm_spark.operators.dedup import (
        hamming_banded_pairs,
        hamming_lsh_pairs,
    )
    from confidential_storm_spark.operators.mediahash import (
        PERT_OFFSET,
        audio_energy_hashes,
        media_corpus,
    )

    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="csspark-media-lsh")
    spark.range(1).count()

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    hashes = audio_energy_hashes(media_corpus(docs, "audio")).localCheckpoint()
    n_items = hashes.count()

    # planted ground truth: (d, d+OFFSET) with true hamming <= r,
    # ONE linear equi-join on the hash table
    a = hashes.withColumnRenamed("_id", "id_a").withColumnRenamed("sig", "sig_a")
    b = hashes.withColumnRenamed("_id", "id_b").withColumnRenamed("sig", "sig_b")
    planted = (
        a.join(b, F.col("id_b") == F.col("id_a") + PERT_OFFSET)
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= MAX_HAMMING)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    n_planted = planted.count()

    rows = []

    def run(method: str, df_fn) -> None:
        t0 = time.perf_counter()
        pairs = df_fn().select("id_a", "id_b").localCheckpoint()
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        found = pairs.join(planted, ["id_a", "id_b"]).count()
        rows.append(
            dict(
                corpus=label,
                n_items=n_items,
                method=method,
                wall_s=round(wall, 1),
                pairs=n_pairs,
                planted_total=n_planted,
                planted_found=found,
                planted_recall=round(found / n_planted, 4) if n_planted else None,
            )
        )
        print(rows[-1], flush=True)

    run(
        "lsh_k16_L28",
        lambda: hamming_lsh_pairs(
            hashes, max_hamming=MAX_HAMMING, bits_per_table=16, tables=28
        ),
    )
    if run_exact:
        run(
            "banded_b8_exact",
            lambda: hamming_banded_pairs(hashes, max_hamming=MAX_HAMMING, bands=8),
        )

    out = os.path.join(REPO, "benchmark", "media_hamming_lsh.csv")
    exists = os.path.exists(out)
    with open(out, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        if not exists:
            w.writeheader()
        w.writerows(rows)
    print(f"appended {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
