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


def test_queries_module_hygiene():
    """Guard against the round-7 paste regression: queries.py must have
    no duplicate top-level function defs and exactly one
    _DRIVER_CERTIFIED_PRIOR assignment, and the live frozenset must be
    the one that assignment defines (no shadowing)."""
    import ast
    import collections
    import inspect

    from confidential_storm_spark.plans import queries as qmod

    src = inspect.getsource(qmod)
    tree = ast.parse(src)
    defs = [n.name for n in tree.body if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
    dupes = [n for n, c in collections.Counter(defs).items() if c > 1]
    assert not dupes, f"duplicate top-level defs in queries.py: {dupes}"

    cert_assigns = [
        n for n in tree.body
        if isinstance(n, (ast.Assign, ast.AnnAssign))
        and any(
            getattr(t, "id", None) == "_DRIVER_CERTIFIED_PRIOR"
            for t in (n.targets if isinstance(n, ast.Assign) else [n.target])
        )
    ]
    assert len(cert_assigns) == 1, (
        f"expected exactly one _DRIVER_CERTIFIED_PRIOR assignment, found {len(cert_assigns)}"
    )
    assert qmod._DRIVER_CERTIFIED_PRIOR <= set(qmod.QUERIES), "certified names must exist in registry"


def test_certified_prior_matches_correctness_union():
    """_DRIVER_CERTIFIED_PRIOR must be exactly the union of green rows
    in the committed CORRECTNESS_r*.json files — the frozenset is a
    cache of driver facts, not an editable allowlist (VERDICT r8 #1)."""
    import glob
    import json
    import os

    from confidential_storm_spark.plans import queries as qmod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert files, "no CORRECTNESS_r*.json committed"
    green = set()
    for f in files:
        for name, row in json.load(open(f)).items():
            if row.get("rows_match") and row.get("schema_match"):
                green.add(name)
    # queries later renamed/removed drop out of the registry; the
    # invariant is over names that still exist
    green &= set(qmod.QUERIES)
    assert qmod._DRIVER_CERTIFIED_PRIOR == frozenset(green), (
        f"stale gate: missing={sorted(green - qmod._DRIVER_CERTIFIED_PRIOR)} "
        f"extra={sorted(qmod._DRIVER_CERTIFIED_PRIOR - green)}"
    )


def test_rotation_covers_uncertified_tail():
    """Every never-driver-certified query must sit in the head-50 the
    driver gate actually runs (until the tail shrinks below 50)."""
    from confidential_storm_spark.plans import queries as qmod

    order = qmod._registry_order()
    uncert = [n for n in order if n not in qmod._DRIVER_CERTIFIED_PRIOR]
    head = set(order[: max(50, len(uncert))][:50])
    missed = [n for n in uncert[:50] if n not in head]
    assert not missed, f"uncertified queries outside driver head-50: {missed}"
