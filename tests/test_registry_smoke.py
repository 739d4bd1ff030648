"""Registry-wide smoke: every query builds, runs at sf0.001, and
returns a stable non-degenerate schema.  (Value-level checking is the
DuckDB gate — tools/check_correctness.py; this catches API breakage
fast in-pytest.)"""

import pytest

from confidential_storm_spark.plans.queries import QUERIES

EXPECT_EMPTY_OK = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding",
    # sf0.001 has 10 suppliers over 25 nations: Q20's nation filter
    # (faithful to the original's n_name = ':2') correctly matches
    # nobody there; the oracle returns the same empty set.
    "q20_dominant_suppliers",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(name, spark, sf_dir):
    qd = QUERIES[name]
    df = qd.builder(spark, sf_dir)
    rows = df.limit(1000).collect()
    assert len(df.columns) >= 1
    if name not in EXPECT_EMPTY_OK:
        assert len(rows) > 0, f"{name} returned no rows at sf0.001"
    if qd.oracle is not None:
        assert qd.oracle.strip().upper().startswith(("SELECT", "WITH"))
