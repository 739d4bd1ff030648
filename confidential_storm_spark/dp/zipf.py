"""Zipf-Mandelbrot sampler (synthetic benchmark generator).

Vectorized numpy equivalent of the reference's inverse-transform
sampler (``examples/synthetic-benchmark-baseline/src/main/java/ch/usi/inf/examples/synthetic_baseline/util/ZipfMandelbrotDistribution.java:20-72``):
P(rank = k) proportional to 1 / (k + q)^s for k in 1..N.

The reference benchmark uses:
- user contribution budget ~ ZipfMandelbrot(1e5, q=26, s=6.738), clipped to [1, C]
- key rank               ~ ZipfMandelbrot(1e6, q=1000, s=1.4)
(BaselineSpout.java:80-94, UtilityBenchmarkTest.java:362-383).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ZipfMandelbrot", "generate_benchmark_contributions"]


class ZipfMandelbrot:
    """Inverse-transform Zipf-Mandelbrot sampler over ranks 1..N."""

    def __init__(self, n: int, q: float, s: float):
        if n <= 0:
            raise ValueError("N must be positive")
        if q < 0:
            raise ValueError("q must be >= 0")
        if s <= 0:
            raise ValueError("s must be > 0")
        self.n, self.q, self.s = n, q, s
        weights = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64) + q, s)
        cdf = np.cumsum(weights)
        cdf /= cdf[-1]
        cdf[-1] = 1.0
        self._cdf = cdf

    def sample(self, size: int | None = None, rng: np.random.Generator | None = None):
        """Sample ranks in 1..N (vectorized searchsorted over the CDF)."""
        if rng is None:
            rng = np.random.default_rng()
        u = rng.random(size if size is not None else 1)
        ranks = np.searchsorted(self._cdf, u, side="left") + 1
        return int(ranks[0]) if size is None else ranks


def generate_benchmark_contributions(
    num_users: int,
    num_keys: int,
    max_contributions: int,
    t_steps: int,
    seed: int = 42,
    budget_q: float = 26.0,
    budget_s: float = 6.738,
    budget_n: int = 100_000,
    key_q: float = 1000.0,
    key_s: float = 1.4,
):
    """Generate the DP-SQLP §5.1 synthetic workload as flat arrays
    ``(user_id, key_rank, epoch)``, one row per contribution, value=1.0.

    Per user: budget = clip(ZipfMandelbrot(budget_n, q, s), 1, C) rows;
    each row's key ~ ZipfMandelbrot(num_keys, q, s) and epoch ~ U[0, T).
    """
    rng = np.random.default_rng(seed)
    budget_dist = ZipfMandelbrot(budget_n, budget_q, budget_s)
    key_dist = ZipfMandelbrot(num_keys, key_q, key_s)

    budgets = np.clip(budget_dist.sample(num_users, rng), 1, max_contributions)
    total = int(budgets.sum())
    user_ids = np.repeat(np.arange(num_users, dtype=np.int64), budgets)
    key_ranks = key_dist.sample(total, rng).astype(np.int64)
    epochs = rng.integers(0, t_steps, size=total, dtype=np.int64)
    return user_ids, key_ranks, epochs
