"""Synthesize a larger SF from the driver's sf0.1 testdata (which is
read-only and tops out at sf0.1) so the scale claims in PLANS.md get a
measured second point.

``factor`` key-shifted copies of every table, with two distribution
repairs so the scale-up doesn't degenerate:

- ``documents``: copy 0 is verbatim; copies i>0 get a DETERMINISTIC
  per-doc word permutation (seeded by (i, doc_id)) — token/word
  statistics are preserved exactly while cross-copy shingle overlap
  stays random (verbatim copies would make every doc a 10-way exact
  duplicate and turn the pair-dedup queries into a synthetic quadratic
  artifact).
- ``embeddings``: copy 0 verbatim; copies i>0 are fresh unit vectors
  (seeded by (i, vec_id)) — verbatim copies would put cosine-1.0
  twins everywhere.

``events.ts`` keeps the source parquet's representation (the current
driver generation stores plain timestamp[us]; the engine normalizes
either representation via ``sources.tables.ts_to_micros``).

Usage: python tools/make_big_sf.py [factor] [dst]
Defaults: factor=10 (sf1), dst=/tmp/spark_graft_sf1.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


def _copy_plain(con, table: str, dst: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
    )


def _shifted_union(con, table: str, dst: str, factor: int, shifts: dict[str, str],
                   ts_ns: tuple[str, ...] = ()) -> None:
    """UNION ALL of ``factor`` copies with key columns shifted by
    i * (max_key + 1) — referential integrity holds because every
    table shifts a given key space by the same stride."""
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    parts = []
    for i in range(factor):
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + {i}::BIGINT * ({shifts[c]}) AS {c}")
            elif c in ts_ns:
                sel.append(f"CAST({c} AS TIMESTAMP_NS) AS {c}")
            else:
                sel.append(c)
        parts.append(f"SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
    )


def _stride(con, table: str, key: str) -> str:
    return str(con.execute(
        f"SELECT max({key}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0])


def _make_events(con, dst: str, factor: int, e_stride: str, u_stride: str) -> None:
    """Shifted copies; ``ts`` keeps the source representation (the
    current driver generation is plain timestamp[us], which DuckDB's
    COPY preserves)."""
    parts = []
    for i in range(factor):
        parts.append(
            f"SELECT event_id + {i}::BIGINT * ({e_stride}) AS event_id, "
            f"ts, "
            f"user_id + {i}::BIGINT * ({u_stride}) AS user_id, "
            f"event_type, value, props FROM '{SRC}/events.parquet'"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/events.parquet' (FORMAT PARQUET)"
    )


def _make_documents(con, dst: str, factor: int) -> None:
    src = con.execute(f"SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id").df()
    stride = int(src["doc_id"].max()) + 1
    outs = [src]
    for i in range(1, factor):
        c = src.copy()
        texts = []
        for doc_id, text in zip(src["doc_id"], src["text"]):
            words = text.split(" ")
            rng = np.random.default_rng((i, int(doc_id)))
            texts.append(" ".join(np.array(words, dtype=object)[rng.permutation(len(words))]))
        c["doc_id"] = c["doc_id"] + i * stride
        c["text"] = texts
        c["n_chars"] = [len(t) for t in texts]
        outs.append(c)
    big = pd.concat(outs, ignore_index=True)
    con.register("docs_big", big)
    con.execute(f"COPY (SELECT * FROM docs_big) TO '{dst}/documents.parquet' (FORMAT PARQUET)")


def _make_embeddings(con, dst: str, factor: int) -> None:
    src = con.execute(f"SELECT * FROM '{SRC}/embeddings.parquet' ORDER BY vec_id").df()
    stride = int(src["vec_id"].max()) + 1
    dim = len(src["embedding"].iloc[0])
    outs = [src]
    for i in range(1, factor):
        c = src.copy()
        c["vec_id"] = c["vec_id"] + i * stride
        vecs = []
        for vid in src["vec_id"]:
            v = np.random.default_rng((i, int(vid))).standard_normal(dim)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
        c["embedding"] = vecs
        outs.append(c)
    big = pd.concat(outs, ignore_index=True)
    con.register("emb_big", big)
    con.execute(
        f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label FROM emb_big) "
        f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    _copy_plain(con, "region", dst)
    _copy_plain(con, "nation", dst)

    c = _stride(con, "customer", "c_custkey")
    s = _stride(con, "supplier", "s_suppkey")
    p = _stride(con, "part", "p_partkey")
    o = _stride(con, "orders", "o_orderkey")
    e = _stride(con, "events", "event_id")
    u = _stride(con, "events", "user_id")

    _shifted_union(con, "customer", dst, factor, {"c_custkey": c})
    _shifted_union(con, "supplier", dst, factor, {"s_suppkey": s})
    _shifted_union(con, "part", dst, factor, {"p_partkey": p})
    _shifted_union(con, "orders", dst, factor, {"o_orderkey": o, "o_custkey": c})
    _shifted_union(
        con, "lineitem", dst, factor,
        {"l_orderkey": o, "l_partkey": p, "l_suppkey": s},
    )
    _make_events(con, dst, factor, e, u)
    _make_documents(con, dst, factor)
    _make_embeddings(con, dst, factor)

    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
