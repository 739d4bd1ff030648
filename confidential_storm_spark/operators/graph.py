"""Iterative graph algorithms: PageRank over a pair relation.

Training-data use: rank documents by centrality in the near-dup /
similarity graph — a cluster's high-PageRank member is its natural
canonical survivor, and graph centrality is a quality prior for
importance-weighted sampling (the same role PageRank plays in
crawl-frontier scoring).

Scale shape (the classic Spark iterative-algorithm pattern, cf. the
original RDD PageRank example, here in DataFrame form so Catalyst
plans each step):

- edges and ranks join on the source id each iteration — both sides
  hash-partition on the key, and AQE reuses the layout;
- the edge relation is ``localCheckpoint``-ed ONCE (it is read every
  iteration; without materialization each iteration would re-run the
  upstream pair pipeline);
- ranks are checkpointed every few iterations to truncate the plan
  lineage (iteration i's plan otherwise embeds i copies of the
  join-agg subtree — planning cost grows superlinearly);
- the driver never materializes ranks: the only driver-side values
  are the iteration counter and the (broadcast) node count.

The companion :func:`pagerank_sql` emits the identical computation as
UNROLLED DuckDB CTEs (r0 -> r1 -> ... -> rN), so the fixed-iteration
result is value-hash certifiable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Undirected pair relation -> directed edge list (both
    directions, deduplicated)."""
    a = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    b = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    return a.union(b).distinct()


def pagerank(
    edges: DataFrame,
    iters: int = 8,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list
    (columns ``src``, ``dst``).  Every node must have out-degree >= 1
    (guaranteed for symmetrized undirected graphs); dangling-mass
    redistribution is therefore not needed.  Returns (id, pr)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # materialize the edge relation FIRST: nodes, degrees, and the
    # per-iteration join all derive from it, and without this every
    # iteration would re-run the upstream pair pipeline (shingles ->
    # signatures -> band join) once per consumer
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_df = nodes.agg(F.count("*").alias("_n"))
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    e = (
        edges.join(deg, "src")
        .select(F.col("src").alias("_esrc"), F.col("dst").alias("_edst"), "_deg")
        .localCheckpoint(eager=False)
    )
    base = nodes.join(F.broadcast(n_df))
    ranks = base.select("id", F.expr("1.0D / _n").alias("pr"))
    # expression strings, built once outside the loop: the Column form
    # re-created the teleport/contribution expression trees through
    # py4j on every iteration (~1.3 s of build time at 8 iterations)
    contrib_agg = F.expr("sum(pr / _deg)").alias("_s")
    rank_expr = (
        f"CAST('{1.0 - damping!r}' AS DOUBLE) / _n"
        f" + CAST('{damping!r}' AS DOUBLE) * coalesce(_s, 0.0D)"
    )
    for i in range(iters):
        contribs = (
            e.join(ranks, e["_esrc"] == ranks["id"])
            .groupBy("_edst")
            .agg(contrib_agg)
        )
        ranks = (
            base.join(contribs, base["id"] == contribs["_edst"], "left")
            .select("id", F.expr(rank_expr).alias("pr"))
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_sql(
    pairs_cte: str, iters: int = 8, damping: float = 0.85
) -> str:
    """DuckDB twin: the same fixed-iteration PageRank as unrolled
    CTEs.  ``pairs_cte`` is a SELECT yielding (id_a, id_b) undirected
    pairs.  Returns SQL yielding (id, pr) — apply rounding/ordering
    in the caller."""
    # AS MATERIALIZED: the edge relation is referenced by every
    # iteration's CTE — without it the optimizer may inline (and
    # re-run) the whole upstream pair pipeline once per iteration,
    # the SQL analog of the localCheckpoint in :func:`pagerank`
    teleport = f"{1.0 - damping} / (SELECT _n FROM nn)"
    parts = [
        f"pairs AS MATERIALIZED ({pairs_cte})",
        "edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs"
        " UNION SELECT id_b AS src, id_a AS dst FROM pairs)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges)",
        "nn AS (SELECT COUNT(*) AS _n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS _deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, 1.0 / (SELECT _n FROM nn) AS pr FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
  SELECT n.id AS id, {teleport} + {damping} * COALESCE(s._s, 0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS dst, SUM(r.pr / dg._deg) AS _s
    FROM edges e JOIN r{i} r ON r.id = e.src JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst) s ON s.dst = n.id)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, pr FROM r{iters}"
