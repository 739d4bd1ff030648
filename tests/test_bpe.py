"""BPE training/encoding: differential vs a pure-Python reference,
merge-fold edge cases, early stop, and the two-encode-paths contract.
"""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.functions.text import BPE_PATTERN, _BPE_WS_RUN
from confidential_storm_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    pretoken_type_counts,
)

_PRETOK = re.compile(BPE_PATTERN)
_WS = re.compile(f"^{_BPE_WS_RUN}$")


def _ref_pretokens(text):
    return [t for t in _PRETOK.findall(text) if not _WS.match(t)]


def _ref_merge_word(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, n_merges, min_count=1):
    types = Counter()
    for t in texts:
        types.update(_ref_pretokens(t))
    words = {tok: list(tok) for tok in types}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for tok, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += types[tok]
        if not pairs:
            break
        # (count DESC, left ASC, right ASC) — the engine's tie-break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((l, r))
        words = {tok: _ref_merge_word(s, l, r) for tok, s in words.items()}
    return merges, words


_CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a mat and a hat",
    "hats and mats, cats' hats!",
    "numbers 123 and 456 don't merge with letters",
]


def test_merge_trajectory_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string")
    merges, _ = bpe_train(pretoken_type_counts(df), 20)
    ref_merges, _ = _ref_train(_CORPUS, 20)
    assert merges == ref_merges


def test_segmentation_table_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string")
    _, seg = bpe_train(pretoken_type_counts(df), 12)
    got = {r["token"]: list(r["syms"]) for r in seg.collect()}
    _, ref_words = _ref_train(_CORPUS, 12)
    assert got == ref_words


def test_overlapping_pair_merges_left_to_right(spark):
    # "aaaa" merging (a,a): left-to-right non-overlap -> [aa, aa];
    # "aaa" -> [aa, a]
    df = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    merges, seg = bpe_train(pretoken_type_counts(df), 1)
    assert merges == [("a", "a")]
    got = {r["token"]: list(r["syms"]) for r in seg.collect()}
    assert got["aaaa"] == ["aa", "aa"]
    assert got[" aaa"] == [" ", "a", "a"] or got[" aaa"] == [" ", "aa", "a"]
    # the leading-space pretoken " aaa" has symbols [' ','a','a','a'];
    # merging (a,a) left-to-right gives [' ', 'aa', 'a']
    assert got[" aaa"] == [" ", "aa", "a"]


def test_early_stop_when_no_pairs_remain(spark):
    # single-char pretokens only -> zero adjacent pairs -> no merges
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    merges, _ = bpe_train(pretoken_type_counts(df), 5)
    # pretokens: 'a', ' b', ' c', ' d' — the space-prefixed ones DO
    # have one pair each, so merges happen until all are fused
    ref_merges, _ = _ref_train(["a b c d"], 5)
    assert merges == ref_merges


def test_min_count_stops_training(spark):
    df = spark.createDataFrame([(1, "xy xy xy zq")], "doc_id long, text string")
    merges, _ = bpe_train(pretoken_type_counts(df), 10, min_count=2)
    ref_merges, _ = _ref_train(["xy xy xy zq"], 10, min_count=2)
    assert merges == ref_merges
    # the count-1 tail pairs were left unmerged
    assert all(m in merges for m in ref_merges)


def test_encode_udf_matches_segmentation_table_on_corpus(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string")
    merges, seg = bpe_train(pretoken_type_counts(df), 15)
    udf_counts = (
        bpe_encode(df, merges)
        .select(F.explode("bpe_toks").alias("t"))
        .groupBy("t").count().orderBy("t").collect()
    )
    from confidential_storm_spark.functions.text import bpe_tokens

    join_counts = (
        df.select(F.explode(bpe_tokens(F.col("text"))).alias("token"))
        .join(seg, "token")
        .select(F.explode("syms").alias("t"))
        .groupBy("t").count().orderBy("t").collect()
    )
    assert udf_counts == join_counts


def test_encode_handles_unseen_text(spark):
    train_df = spark.createDataFrame([(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string")
    merges, _ = bpe_train(pretoken_type_counts(train_df), 10)
    unseen = "the catapult format"  # shares subword structure, new types
    out = bpe_encode(
        spark.createDataFrame([(1, unseen)], "doc_id long, text string"), merges
    ).collect()[0]["bpe_toks"]
    # reference encode of the same text with the same merges
    ref = []
    for tok in _ref_pretokens(unseen):
        syms = list(tok)
        for l, r in merges:
            syms = _ref_merge_word(syms, l, r)
        ref.extend(syms)
    assert list(out) == ref
    # losslessness: concatenating subwords recovers the pretokens
    assert "".join(out) == "".join(_ref_pretokens(unseen))


def test_training_loop_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string")
    _, seg = bpe_train(pretoken_type_counts(df), 3)
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_artifact_roundtrip(spark, tmp_path):
    from confidential_storm_spark.sources.writers import read_bpe_vocab, write_bpe_vocab

    df = spark.createDataFrame([(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string")
    merges, seg = bpe_train(pretoken_type_counts(df), 10)
    path = str(tmp_path / "bpe_vocab")
    write_bpe_vocab(spark, path, merges, segmentation=seg)
    assert read_bpe_vocab(spark, path) == merges
    # the persisted segmentation is the corpus encode map, byte-equal
    stored = {
        r["token"]: list(r["syms"])
        for r in spark.read.parquet(f"{path}/segmentation").collect()
    }
    live = {r["token"]: list(r["syms"]) for r in seg.collect()}
    assert stored == live
    # encode-with-read-back-merges == encode-with-live-merges
    a = bpe_encode(df, read_bpe_vocab(spark, path)).select("doc_id", "bpe_toks").collect()
    b = bpe_encode(df, merges).select("doc_id", "bpe_toks").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
