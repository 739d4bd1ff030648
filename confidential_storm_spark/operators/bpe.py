"""Distributed BPE tokenizer training + encoding (Sennrich 2016 /
GPT-2 pretokenized variant) — the tokenizer an LLM-data pipeline
trains ON the corpus it just curated.

Spark-first shape:

- **Training runs over pretoken TYPES, not the corpus.**  One pass
  aggregates the corpus to a ``(token, count)`` type table (Heaps'
  law: the type table is orders of magnitude smaller than the corpus
  — ~1e7 types for a 100 TB crawl), and every merge iteration is a
  small shuffle over that table.  This is the standard trick that
  makes BPE training feasible at corpus scale.
- **Everything stays JVM-side.**  Pair counting is
  slice+arrays_zip+explode+groupBy; applying a merge is an
  ``F.aggregate`` left fold over the symbol array (left-to-right
  non-overlapping, the textbook semantics).  No Python in the
  training loop; the only driver traffic is ONE row per iteration
  (the argmax pair).
- **Deterministic.**  Ties break on (count DESC, left ASC, right
  ASC) under binary string collation — identical in Spark, DuckDB,
  and Python, so the whole training trajectory is reproducible and
  the DuckDB twin (an UNROLLED per-iteration CTE chain, same scheme
  as the k-means trajectory oracle) certifies the merge list
  end-to-end.
- **Encoding is a broadcast map.**  For corpus text, the final
  type table IS the segmentation (join token -> symbols, zero
  recompute); for unseen text, :func:`bpe_encode` applies the merge
  list in rank order inside an Arrow-batched pandas UDF with a
  per-batch type cache.

Merge application semantics (load-bearing for the oracle): merges
apply as sequential left-to-right non-overlapping passes in rank
order — exactly what ``replace()`` does on a sentinel-delimited
string, what the ``F.aggregate`` fold does on an array, and what the
pure-Python reference in the tests does on a list.

SQL-twin caveat: the oracle represents symbol sequences as
``\\x01sym\\x02`` sentinel strings joined by ``\\x03``, so it is exact
only on text free of control bytes \\x01-\\x03 (``clean_text`` strips
them; the synthetic corpus never contains them).

Reference: beyond-reference training-data op (the reference engine
has no tokenizer); algorithm per Sennrich et al. 2016
(arXiv:1508.07909) with GPT-2-style pretokenization
(functions.text.BPE_PATTERN).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.text import BPE_PATTERN, _BPE_WS_RUN, bpe_tokens, bpe_tokens_sql

__all__ = [
    "pretoken_type_counts",
    "bpe_train",
    "bpe_encode",
    "bpe_train_sql",
    "pair_counts_sql",
]

_CHECKPOINT_EVERY = 8  # keep the fold-chain lineage bounded


def pretoken_type_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n) pretoken type table — the Heaps'-law reduction the
    training loop iterates over.  One corpus pass, one shuffle."""
    return (
        df.select(F.explode(bpe_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _chars(tok: Column) -> Column:
    # split-to-chars; Java split('') emits no empties for non-empty
    # input but guard anyway (pretokens are never empty)
    return F.filter(F.split(tok, ""), lambda c: F.length(c) > 0)


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct(l, r)> of adjacent symbol pairs."""
    n = F.size(syms)
    return F.arrays_zip(
        F.slice(syms, 1, (n - 1).cast("int")).alias("l"),
        F.slice(syms, 2, (n - 1).cast("int")).alias("r"),
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (left, right)
    into left+right — an O(len) fold, pure JVM (lambda-API literals,
    so quote/backslash symbols are safe)."""
    la, lb, lab = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, (F.size(acc) - 1).cast("int")), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    types: DataFrame,
    n_merges: int,
    min_count: int = 1,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges over a ``(token, n)`` type table.

    Returns ``(merges, segmented)`` — the ordered merge list and the
    final ``(token, syms)`` segmentation table (the corpus-vocabulary
    encode map; persist it next to the corpus as the standing
    artifact).  Stops early when the best pair's count drops below
    ``min_count`` or no pairs remain.

    Per iteration: one explode+groupBy shuffle over the TYPE table
    (not the corpus) and a single 1-row argmax collect; the symbol
    fold is map-side.  Lineage is re-materialized every
    ``_CHECKPOINT_EVERY`` merges via eager localCheckpoint.
    """
    cur = types.select(
        "token", "n", _chars(F.col("token")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        best = (
            cur.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "n")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("pn"))
            .orderBy(F.desc("pn"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pn"] < min_count:
            break
        l, r = best[0]["l"], best[0]["r"]
        merges.append((l, r))
        cur = cur.withColumn("syms", _apply_merge(F.col("syms"), l, r))
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges, cur.select("token", "syms")


_PRETOK_RE = re.compile(BPE_PATTERN)
_WS_RE = re.compile(f"^{_BPE_WS_RUN}$")


def _encode_token(tok: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(tok)
    for l, r in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Input rows + ``bpe_toks`` (array<string>): the learned-BPE
    segmentation of arbitrary (possibly unseen) text.

    Arrow-batched pandas UDF; the merge list is a closure broadcast
    (a tokenizer vocabulary is a few hundred KB — driver-side by
    design, like any model artifact), with a per-batch token cache so
    each TYPE is segmented once per batch.  For corpus text prefer
    joining the training segmentation table instead — zero recompute
    (the tests prove the two paths agree on the training corpus)."""
    m = list(merges)

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for tok in _PRETOK_RE.findall(t or ""):
                if _WS_RE.match(tok):
                    continue
                if tok not in cache:
                    cache[tok] = _encode_token(tok, m)
                toks.extend(cache[tok])
            out.append(toks)
        return pd.Series(out)

    return df.withColumn("bpe_toks", enc(F.col(text_col)))


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

# sentinel encoding of a symbol sequence: \x01sym\x02 joined by \x03.
# replace() on this form is exactly the left-to-right non-overlapping
# adjacent-pair merge (delimiters make cross-symbol false matches
# impossible; a replacement consumes its own delimiters only).
_W0 = (
    "array_to_string(list_transform(range(1, length(token) + 1), "
    "i -> chr(1) || substr(token, i, 1) || chr(2)), chr(3))"
)
_SYMS = "list_transform(string_split({s}, chr(3)), x -> substr(x, 2, length(x) - 2))"


def _types_cte(table: str, text_col: str) -> str:
    return (
        f"types AS (SELECT token, COUNT(*) AS n FROM (SELECT unnest("
        f"{bpe_tokens_sql(text_col)}) AS token FROM {table}) GROUP BY token)"
    )


def pair_counts_sql(
    table: str = "documents", text_col: str = "text", top_k: int | None = None
) -> str:
    """Iteration-0 adjacent-pair counts over the pretoken type table
    (the statistic the first merge maximizes)."""
    limit = f" LIMIT {top_k}" if top_k is not None else ""
    syms = _SYMS.format(s=_W0)
    return f"""
WITH {_types_cte(table, text_col)},
w AS (SELECT {syms} AS syms, n FROM types),
p AS (
  SELECT syms[i] AS "left", syms[i + 1] AS "right", SUM(n)::BIGINT AS pair_n
  FROM w, UNNEST(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2
)
SELECT "left", "right", pair_n FROM p
ORDER BY pair_n DESC, "left", "right"{limit}
"""


def bpe_train_sql(
    n_merges: int,
    table: str = "documents",
    text_col: str = "text",
    stats: bool | str = False,
) -> str:
    """UNROLLED DuckDB twin of :func:`bpe_train` — one (pairs, best,
    words) CTE triple per iteration, the k-means-trajectory-oracle
    scheme.  With ``stats=False`` returns the merge list
    (merge_rank, left, right); with ``stats=True`` returns per-source
    corpus stats after segmenting with the final table
    (source, n_pretokens, total_subwords).

    Preconditions (documented in the module header): text free of
    control bytes \\x01-\\x03, and the corpus supports ``n_merges``
    merges (the registry corpus does; the Python side would stop
    early instead)."""
    parts = [_types_cte(table, text_col), f"w0 AS MATERIALIZED (SELECT token, n, {_W0} AS s FROM types)"]
    for i in range(1, n_merges + 1):
        syms = _SYMS.format(s="s")
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT syms[j] AS l, syms[j + 1] AS r, SUM(n)::BIGINT AS pn
  FROM (SELECT {syms} AS syms, n FROM w{i - 1}), UNNEST(range(1, len(syms))) AS u(j)
  GROUP BY 1, 2)"""
        )
        parts.append(f"b{i} AS MATERIALIZED (SELECT l, r FROM p{i} ORDER BY pn DESC, l, r LIMIT 1)")
        parts.append(
            f"""w{i} AS MATERIALIZED (
  SELECT w.token, w.n,
         replace(w.s, chr(1) || b.l || chr(2) || chr(3) || chr(1) || b.r || chr(2),
                 chr(1) || b.l || b.r || chr(2)) AS s
  FROM w{i - 1} w CROSS JOIN b{i} b)"""
        )
    if stats:
        group = stats if isinstance(stats, str) else "source"
        parts.append(
            f"""doc_toks AS (
  SELECT {group} AS grp, unnest({bpe_tokens_sql(text_col)}) AS token FROM {table})"""
        )
        parts.append(
            f"seg AS (SELECT token, len(string_split(s, chr(3))) AS n_sym FROM w{n_merges})"
        )
        return (
            "WITH "
            + ",\n".join(parts)
            + f"""
SELECT d.grp AS {group}, COUNT(*)::BIGINT AS n_pretokens,
       SUM(seg.n_sym)::BIGINT AS total_subwords,
       ROUND(CAST(SUM(seg.n_sym) AS DOUBLE) / COUNT(*), 6) AS fertility
FROM doc_toks d JOIN seg USING (token)
GROUP BY d.grp ORDER BY {group}"""
        )
    union = "\nUNION ALL\n".join(
        f'SELECT {i} AS merge_rank, l AS "left", r AS "right" FROM b{i}'
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({union}) ORDER BY merge_rank"
