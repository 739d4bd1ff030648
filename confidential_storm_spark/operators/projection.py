"""Random-projection dimensionality reduction (Johnson–Lindenstrauss)
for the embedding column — the cheap preprocessing step before
coarse clustering / LSH when the stored dimension is wider than the
task needs.

Spark-first shape: the seeded d x d' Gaussian matrix is a broadcast
constant (a few KB); the projection is one Arrow-batched numpy matmul
per batch — **no shuffle at any size**, embarrassingly parallel, and
the only data movement is the narrower output column.  This is the
same broadcast-constant pattern as the LSH hyperplanes
(`similarity.py`), which is also how the DuckDB oracle reproduces it:
the matrix literals are embedded in the SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["projection_matrix", "random_project", "random_project_rows_sql"]


def projection_matrix(dim: int, out_dim: int, seed: int = 42) -> np.ndarray:
    """Seeded Gaussian JL matrix, scaled by 1/sqrt(out_dim) so
    expected pairwise distances are preserved."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, out_dim)) / np.sqrt(out_dim)


def random_project(
    vec: Column, dim: int, out_dim: int, seed: int = 42
) -> Column:
    """Project an ``array<float>`` column to ``array<double>`` of
    width ``out_dim`` (one numpy matmul per Arrow batch)."""
    R = projection_matrix(dim, out_dim, seed)

    @pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        Y = X @ R
        return pd.Series(list(Y))

    return proj(vec)


def random_project_rows_sql(
    dim: int,
    out_dim: int,
    seed: int = 42,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of the exploded (id, dim, val) projection rows:
    the transposed matrix is embedded as a list-of-lists literal, so
    ``m[j+1][i]`` is the same constant Spark's matmul multiplies."""
    R = projection_matrix(dim, out_dim, seed)
    cols = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in R[:, j]) + "]"
        for j in range(out_dim)
    )
    return f"""
WITH pts AS (
    SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
    FROM {table}
),
m AS (SELECT [{cols}] AS cols)
SELECT p.{id_col}, j.dim,
       ROUND(list_sum(list_transform(range(1, {dim + 1}),
             i -> p.v[i] * m.cols[CAST(j.dim AS INTEGER) + 1][i])), 6) AS val
FROM pts p CROSS JOIN m CROSS JOIN range(0, {out_dim}) j(dim)
"""
