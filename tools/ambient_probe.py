"""Fixed single-core throughput probe for annotating bench runs.

The shared sandbox's throughput swings 25-50% between (and within)
sessions (OPTIMIZATION_r11.md "Measurement notes"); recording this
probe's wall time beside every bench total lets a later reader
separate ambient drift from code-level change: the probe is pure
Python, single-threaded, allocation-free, and identical every run.

Usage: python tools/ambient_probe.py [reps]   (default 3)
Prints one wall-clock seconds value per rep; ~1.5 s/rep on this
sandbox's fast windows, ~2.0-2.5 s when a noisy neighbor is active.
"""

from __future__ import annotations

import sys
import time


def probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    assert s == 199999990000000
    return time.perf_counter() - t0


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for _ in range(reps):
        print(round(probe(), 3))
