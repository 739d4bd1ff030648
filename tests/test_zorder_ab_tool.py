"""Footer-stats pruning arithmetic of tools/zorder_pruning_ab.py —
pyarrow-only (no Spark session needed)."""

from __future__ import annotations

import importlib.util
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _load_tool():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "zorder_pruning_ab.py",
    )
    spec = importlib.util.spec_from_file_location("zorder_ab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rg_prunable_counts_footer_misses(tmp_path):
    mod = _load_tool()
    # file 1: x in [0, 9]   -> survives pred x in [5, 20)
    # file 2: x in [30, 39] -> prunable (min 30 >= hi 20)
    # file 3: x in [0, 9] but y misses -> prunable via the SECOND pred
    pq.write_table(
        pa.table({"x": list(range(10)), "y": list(range(10))}),
        tmp_path / "a.parquet",
    )
    pq.write_table(
        pa.table({"x": list(range(30, 40)), "y": list(range(10))}),
        tmp_path / "b.parquet",
    )
    pq.write_table(
        pa.table({"x": list(range(10)), "y": list(range(100, 110))}),
        tmp_path / "c.parquet",
    )
    preds = {"x": (5, 20), "y": (0, 50)}
    prunable, total = mod._rg_prunable(str(tmp_path), preds)
    assert total == 3
    assert prunable == 2


def test_rg_prunable_boundary_semantics(tmp_path):
    mod = _load_tool()
    # stats max == lo - 1 -> prunable; max == lo -> must survive
    pq.write_table(pa.table({"x": [0, 4]}), tmp_path / "edge_lo.parquet")
    pq.write_table(pa.table({"x": [0, 5]}), tmp_path / "touch_lo.parquet")
    # stats min == hi -> prunable (pred is half-open [lo, hi))
    pq.write_table(pa.table({"x": [20, 25]}), tmp_path / "at_hi.parquet")
    prunable, total = mod._rg_prunable(str(tmp_path), {"x": (5, 20)})
    assert (prunable, total) == (2, 3)
