"""confidential_storm_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``lucadibello/confidential-storm``.

The reference system is a confidential stream-processing library on Apache
Storm + SGX whose query capability is the DP-SQLP family of differentially
private streaming keyed aggregations (arXiv:2303.18086).  This package
re-expresses those capabilities Spark-first:

- ``dp``         pure-Python/numpy DP core (trees, calibration, mechanism)
- ``operators``  DataFrame-level operators (bounding, histogram, dedup, ...)
- ``sources``    table loaders and synthetic generators
- ``functions``  column-level helpers (envelope crypto, hashing, text)
- ``plans``      query/pipeline builders used by the entry points
- ``streaming``  Structured Streaming pipelines (stateful DP operator)
"""

__version__ = "0.1.0"
