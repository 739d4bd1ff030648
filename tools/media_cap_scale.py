"""Measured recall/candidate-volume law for the banded-Hamming join's
``max_bucket_size`` cap (the scale valve cited in
operators/dedup.py::hamming_banded_pairs and plans/queries.py
``_imgband_artifact``).

With b bands over a 64-bit hash a band value has only 2^(64/b)
possibilities (bands=8 -> 256 values -> 2048 buckets TOTAL), so bucket
population grows linearly with corpus size and candidate pairs
sum_buckets n*(n-1)/2 quadratically — the measured r9 wall that keeps
the uncapped media dedups out of the sf10 bench.  The cap bounds every
bucket at K, making candidate volume <= 2048 * K*(K-1)/2 (a CONSTANT
per corpus-independent bucket grid) at the cost of partial recall.

This tool measures, per cap value on one corpus:
- candidate volume (exact, from the bucket histogram — the law itself),
- the capped join's verified pair count and wall,
- planted-pair recall (the synthetic corpus PLANTS its near-dups as
  (d, d + PERT_OFFSET), so ground truth is one linear equi-join, no
  quadratic oracle needed at any scale).

Writes/appends ``benchmark/media_banded_cap.csv``.

Usage: python tools/media_cap_scale.py DATA_DIR LABEL [cap ...]
Default caps: uncapped 2000 500 100
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
BANDS = 8


def main() -> int:
    data_dir = sys.argv[1]
    label = sys.argv[2]
    caps: list[int | None] = [None, 2000, 500, 100]
    if len(sys.argv) > 3:
        caps = [None if c == "uncapped" else int(c) for c in sys.argv[3:]]

    from pyspark.sql import functions as F

    from confidential_storm_spark.operators.dedup import hamming_banded_pairs
    from confidential_storm_spark.operators.mediahash import (
        PERT_OFFSET,
        audio_energy_hashes,
        media_corpus,
    )
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="csspark-media-cap")
    spark.range(1).count()

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    hashes = audio_energy_hashes(media_corpus(docs, "audio")).localCheckpoint()
    n_items = hashes.count()

    # planted ground truth: ONE linear equi-join
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

    # the candidate-volume law, computed from the bucket histogram
    # (never materializing the candidates): per cap K, each bucket of
    # size n contributes min(n, K)*(min(n, K)-1)/2 pairs
    bits = 64 // BANDS
    mask = (1 << bits) - 1
    buckets = (
        hashes.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bd).alias("band"),
                            F.shiftright("sig", bd * bits)
                            .bitwiseAND(F.lit(mask))
                            .alias("band_val"),
                        )
                        for bd in range(BANDS)
                    ]
                )
            ).alias("bb")
        )
        .groupBy("bb.band", "bb.band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )

    def cand_volume(cap: int | None) -> int:
        eff = F.col("n") if cap is None else F.least(F.col("n"), F.lit(cap))
        return buckets.agg(
            F.sum((eff * (eff - 1) / 2).cast("long")).alias("v")
        ).collect()[0]["v"]

    rows = []
    for cap in caps:
        vol = cand_volume(cap)
        t0 = time.perf_counter()
        pairs = (
            hamming_banded_pairs(
                hashes, max_hamming=MAX_HAMMING, bands=BANDS, max_bucket_size=cap
            )
            .select("id_a", "id_b")
            .localCheckpoint()
        )
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0
        found = pairs.join(planted, ["id_a", "id_b"]).count()
        rows.append(
            dict(
                corpus=label,
                n_items=n_items,
                cap=-1 if cap is None else cap,
                candidates=vol,
                wall_s=round(wall, 1),
                pairs=n_pairs,
                planted_total=n_planted,
                planted_found=found,
                planted_recall=round(found / n_planted, 4) if n_planted else None,
            )
        )
        print(rows[-1], flush=True)

    out = os.path.join(REPO, "benchmark", "media_banded_cap.csv")
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
    sys.exit(main())
