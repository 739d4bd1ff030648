"""Zipf-Mandelbrot sampler sanity tests."""

import numpy as np

from confidential_storm_spark.dp import ZipfMandelbrot
from confidential_storm_spark.dp.zipf import generate_benchmark_contributions


def test_ranks_in_range_and_skewed():
    dist = ZipfMandelbrot(1000, q=10.0, s=1.4)
    rng = np.random.default_rng(0)
    samples = dist.sample(20_000, rng)
    assert samples.min() >= 1 and samples.max() <= 1000
    # heavy head: rank 1 must be the most frequent
    counts = np.bincount(samples)
    assert counts[1] == counts[1:].max()
    # deterministic under the same seed
    samples2 = ZipfMandelbrot(1000, q=10.0, s=1.4).sample(20_000, np.random.default_rng(0))
    assert np.array_equal(samples, samples2)


def test_benchmark_generator_shapes():
    users, keys, epochs = generate_benchmark_contributions(
        num_users=500, num_keys=100, max_contributions=8, t_steps=10, seed=7
    )
    assert len(users) == len(keys) == len(epochs)
    # every user contributes between 1 and C rows
    counts = np.bincount(users, minlength=500)
    assert counts.min() >= 1 and counts.max() <= 8
    assert keys.min() >= 1 and keys.max() <= 100
    assert epochs.min() >= 0 and epochs.max() < 10
