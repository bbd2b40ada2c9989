"""Relational operators Spark lacks as built-ins, composed Spark-first.

The reference engine's query surface is Spark SQL verbatim (SURVEY §2.5), so
it has no as-of/range join either — but any time-series / event-analytics
workload on this engine needs them, and the naive formulations (inequality
joins) degenerate to broadcast-nested-loop in Catalyst. These compositions
keep everything as equi-join + window — single shuffle, cluster-scale.
"""

from lakehouse_plumber_spark.functions.asof import asof_join
from lakehouse_plumber_spark.functions.ranges import interval_self_join, peak_concurrency

__all__ = ["asof_join", "interval_self_join", "peak_concurrency"]
