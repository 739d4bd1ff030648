"""Round-10 curation capstone: the NEW quality/dedup/allocation
operators chained end-to-end at sf1 — the "rule-gate -> weighted
dedup -> local-match dedup -> budget allocation -> reproducible
sample -> packing plan" shape a corpus release runs, with per-stage
wall/volumes to one CSV.

Stages (rows in benchmark/curation_v2_sf1.csv):
  gopher_gate   per-doc Gopher-rule predicate (integer thresholds)
  tfidf_dedup   weighted near-dup pairs over survivors (df-capped
                inverted index); greedy keep-lowest-id drop
  winnow_dedup  MOSS winnowing pairs over the remainder (local-match
                family — catches embedded runs cosine dilutes)
  neyman_alloc  per-source eval-label allocation (exact moments)
  reservoir     deterministic k-min-hash labeling sample per source
  padding_plan  padding-waste curve of the cleaned corpus

Every stage is scan+aggregate+key-join shaped (driver sees only k-row
summaries), so the per-stage rates extrapolate linearly.

Usage: python tools/curation_v2_pipeline.py [sf_dir] [out_csv]
Defaults: /tmp/spark_graft_sf1, benchmark/curation_v2_sf1.csv
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

TFIDF_MAX_DF = 500        # sf1 corpus is 10x the registry's
TFIDF_THRESHOLD = 0.6
WINNOW_MAX_DF = 500
WINNOW_MIN_SHARED = 20
RESERVOIR_K = 50
NEYMAN_BUDGET = 10_000


def greedy_drop(pairs, kept, id_col="doc_id"):
    """Drop EVERY id that appears as the higher side of any pair — one
    anti-join pass.  On a transitively-closed pair relation this equals
    dedup_canonical's keep-lowest rule; on chains without closure
    (a~b, b~c, no a~c) it over-drops c relative to the greedy
    keep-if-witness-dropped rule — acceptable for a dedup pipeline
    (over-dedup trades recall, never correctness) and noted so the CSV
    volumes are read as upper bounds on drops."""
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return kept.join(drops, id_col, "left_anti")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    out_csv = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "benchmark", "curation_v2_sf1.csv")
    )
    from confidential_storm_spark.functions.text import STOPWORDS, bpe_token_count, winnow_udf, words
    from confidential_storm_spark.plans.queries import (
        _GOPHER_MAXWORD_X,
        _GOPHER_MIN_WORDS,
        _GOPHER_STOP_PCT,
        _PACK_BUCKETS,
    )
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="curation-v2")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    rows = [("corpus", 0.0, n0, "input docs")]

    # 1. Gopher rule gate ---------------------------------------------------
    t0 = time.time()
    w = docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
    pw = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("wc"))
    stop = F.array(*[F.lit(x) for x in STOPWORDS])
    pdoc = pw.groupBy("doc_id").agg(
        F.sum("wc").alias("nw"),
        F.sum(F.length("word") * F.col("wc")).alias("sl"),
        F.sum(
            F.when(F.array_contains(stop, F.col("word")), F.col("wc")).otherwise(0)
        ).alias("ns"),
        F.max("wc").alias("mw"),
    )
    keep_ids = pdoc.filter(
        (F.col("nw") >= _GOPHER_MIN_WORDS)
        & (F.col("sl") >= 3 * F.col("nw"))
        & (F.col("sl") <= 8 * F.col("nw"))
        & (100 * F.col("ns") >= _GOPHER_STOP_PCT * F.col("nw"))
        & (_GOPHER_MAXWORD_X * F.col("mw") <= F.col("nw"))
    ).select("doc_id")
    kept = docs.join(keep_ids, "doc_id").localCheckpoint(eager=True)
    n1 = kept.count()
    rows.append(("gopher_gate", round(time.time() - t0, 2), n1, f"kept {n1}/{n0}"))
    print(rows[-1], flush=True)

    # 2. tf-idf weighted dedup ---------------------------------------------
    t0 = time.time()
    tf = (
        kept.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfr = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= TFIDF_MAX_DF
    )
    wts = tf.join(F.broadcast(dfr), "w").select(
        "doc_id", "w",
        (F.col("tf") * F.log(F.lit(float(n1)) / F.col("df"))).alias("wt"),
    )
    norms = wts.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wt") ** 2)).alias("nrm"))
    dots = (
        wts.alias("l")
        .join(wts.alias("r"), (F.col("l.w") == F.col("r.w")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .agg(F.sum(F.col("l.wt") * F.col("r.wt")).alias("dot"))
    )
    tpairs = (
        dots.join(norms.withColumnRenamed("doc_id", "id_a").withColumnRenamed("nrm", "na"), "id_a")
        .join(norms.withColumnRenamed("doc_id", "id_b").withColumnRenamed("nrm", "nb"), "id_b")
        .filter(F.col("dot") / (F.col("na") * F.col("nb")) >= TFIDF_THRESHOLD)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    np1 = tpairs.count()
    kept2 = greedy_drop(tpairs, kept).localCheckpoint(eager=True)
    n2 = kept2.count()
    rows.append(("tfidf_dedup", round(time.time() - t0, 2), n2, f"{np1} pairs, dropped {n1 - n2}"))
    print(rows[-1], flush=True)

    # 3. winnowing local-match dedup -----------------------------------------
    t0 = time.time()
    posts = kept2.select(
        "doc_id", F.explode(winnow_udf(F.col("text"))).alias("fp")
    ).distinct()
    hot = posts.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") > WINNOW_MAX_DF
    ).select("fp")
    posts = posts.join(F.broadcast(hot), "fp", "left_anti")
    wpairs = (
        posts.alias("l")
        .join(posts.alias("r"), (F.col("l.fp") == F.col("r.fp")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    np2 = wpairs.count()
    kept3 = greedy_drop(wpairs, kept2).localCheckpoint(eager=True)
    n3 = kept3.count()
    rows.append(("winnow_dedup", round(time.time() - t0, 2), n3, f"{np2} pairs, dropped {n2 - n3}"))
    print(rows[-1], flush=True)

    # 4. Neyman allocation ---------------------------------------------------
    t0 = time.time()
    per = kept3.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sx2"),
    )
    sig = F.sqrt((F.col("sx2").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")) / F.col("n"))
    sc = per.select("source", "n", sig.alias("sig"))
    tot = sc.agg(F.sum(F.col("n") * F.col("sig")).alias("t"))
    alloc = sc.crossJoin(F.broadcast(tot)).select(
        "source", "n",
        F.round(F.lit(NEYMAN_BUDGET) * F.col("n") * F.col("sig") / F.col("t")).cast("long").alias("labels"),
    )
    n_sources = alloc.count()
    rows.append(("neyman_alloc", round(time.time() - t0, 2), n_sources, f"{NEYMAN_BUDGET} labels over {n_sources} sources"))
    print(rows[-1], flush=True)

    # 5. deterministic reservoir sample --------------------------------------
    t0 = time.time()
    h = F.md5(F.col("doc_id").cast("string"))
    wnd = Window.partitionBy("source").orderBy(h, "doc_id")
    sample = (
        kept3.select("source", "doc_id")
        .withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= RESERVOIR_K)
    )
    ns = sample.count()
    rows.append(("reservoir", round(time.time() - t0, 2), ns, f"k={RESERVOIR_K}/source"))
    print(rows[-1], flush=True)

    # 6. padding plan ---------------------------------------------------------
    t0 = time.time()
    n = bpe_token_count(F.col("text"))
    bucket = F.lit(_PACK_BUCKETS[-1])
    for b in reversed(_PACK_BUCKETS):
        bucket = F.when(n <= b, F.lit(b)).otherwise(bucket)
    waste = (
        kept3.select(bucket.alias("bucket"), n.alias("nt"),
                     F.least(n, F.lit(_PACK_BUCKETS[-1])).alias("pt"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            (F.count(F.lit(1)) * F.col("bucket") - F.sum("pt")).alias("pad"),
        )
        .agg(F.sum("pad").alias("total_pad"), F.sum(F.col("docs") * F.col("bucket")).alias("cap"))
        .collect()[0]
    )
    share = waste["total_pad"] / waste["cap"]
    rows.append(("padding_plan", round(time.time() - t0, 2), int(waste["total_pad"]), f"waste share {share:.4f}"))
    print(rows[-1], flush=True)

    with open(out_csv, "w") as f:
        f.write("stage,wall_s,volume,note\n")
        for r in rows:
            f.write(",".join(str(x) for x in r[:3]) + "," + str(r[3]).replace(",", ";") + "\n")
    print(f"wrote {out_csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
