"""model_presto_spark — a PySpark-native analytics engine.

A from-scratch Spark SQL implementation of the data-processing
capabilities of the reference system surveyed in SURVEY.md
(remote-sensing ML dataflow: relational composites, as-of matching,
window/time-series ops, sampling/splits, embedding kNN, batched
inference UDFs, incremental streaming), re-expressed as idiomatic
DataFrame / Catalyst plans designed for 100 TB-scale clusters.
"""

from model_presto_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
