"""Heavy-tailed (Zipf word-frequency) document corpus generator
(VERDICT r5 #6).

The driver's synthetic documents have a FLAT shingle-df distribution
(every shingle appears in ~the same handful of docs), which is the
one regime where AllPairs/PPJoin prefix filtering cannot win — its
whole premise is that a few high-df shingles carry most of the join
cost.  Natural-text crawls are Zipfian; this tool generates a corpus
with that shape so the dedup caps and ``prefix_filter`` measure
against the distribution they were designed for:

- vocabulary of ``--vocab`` words sampled with P(rank r) ~ 1/r^s
  (s = ``--zipf-s``, default 1.07 — English-like), so the top words
  appear in nearly every document and shingle df is heavy-tailed;
- ``--dup-fraction`` of docs are near-duplicates: a word-level
  ~10%-edit of an earlier doc (seeded, deterministic), so the
  jaccard-pair queries have true positives to find;
- schema matches the driver's documents table
  (doc_id, text, lang, source, n_chars).

Usage: python tools/make_zipf_docs.py [--n-docs 5000]
          [--out /tmp/spark_graft_zipf_docs] [--seed 7]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_corpus(n_docs: int, vocab: int, zipf_s: float, dup_fraction: float,
                mean_len: int, seed: int):
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()
    words = np.array([f"w{i}" for i in range(vocab)], dtype=object)

    docs: list[str] = []
    for i in range(n_docs):
        if docs and rng.random() < dup_fraction:
            # near-duplicate: ~10% of positions re-sampled
            src = docs[rng.integers(0, len(docs))].split(" ")
            arr = np.array(src, dtype=object)
            n_edit = max(1, int(0.1 * len(arr)))
            pos = rng.choice(len(arr), size=n_edit, replace=False)
            arr[pos] = words[rng.choice(vocab, size=n_edit, p=probs)]
            docs.append(" ".join(arr))
        else:
            n = max(20, int(rng.lognormal(np.log(mean_len), 0.4)))
            docs.append(" ".join(words[rng.choice(vocab, size=n, p=probs)]))
    return docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=5000)
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--zipf-s", type=float, default=1.07)
    ap.add_argument("--dup-fraction", type=float, default=0.2)
    ap.add_argument("--mean-len", type=int, default=150)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="/tmp/spark_graft_zipf_docs")
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    docs = make_corpus(args.n_docs, args.vocab, args.zipf_s, args.dup_fraction,
                       args.mean_len, args.seed)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype=np.int64),
            "text": docs,
            "lang": "en",
            "source": "zipf_synth",
            "n_chars": [len(t) for t in docs],
        }
    )
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.register("docs", df)
    con.execute(
        f"COPY (SELECT * FROM docs) TO '{args.out}/documents.parquet' (FORMAT PARQUET)"
    )
    # df-distribution summary so the heavy tail is verifiable at a glance
    q = con.execute(
        f"""
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct([x[1] || ' ' || x[2] || ' ' || x[3]
                 for x in list_zip(toks, toks[2:], toks[3:])])) AS shingle
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM '{args.out}/documents.parquet')
        ),
        dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
        SELECT MAX(df), quantile_cont(df, 0.999), quantile_cont(df, 0.99),
               quantile_cont(df, 0.5), COUNT(*) FROM dfreq
        """
    ).fetchone()
    print(
        f"wrote {args.out}/documents.parquet: {len(docs)} docs; shingle df "
        f"max={q[0]} p99.9={q[1]:.0f} p99={q[2]:.0f} median={q[3]:.0f} "
        f"distinct={q[4]}"
    )


if __name__ == "__main__":
    main()
