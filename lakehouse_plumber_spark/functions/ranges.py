"""Range (interval) join via bucketing: equi-join on (key, time-bucket).

A join predicate like `0 < b.ts - a.ts <= W` is a theta-join: Catalyst has no
hash strategy for it, so at scale it becomes nested-loop. Bucketing restores
an equi-join: quantize time into buckets of width W; a row at `t` can only
pair with rows in its own or the next bucket, so explode the probe side to
(bucket, bucket+1) — 2x probe amplification buys hash-join asymptotics; the
exact predicate re-filters inside the join. Work is O(pairs within W), the
output's own lower bound. Same trick range-partitions cleanly on a cluster:
the shuffle key is (join_key, bucket), so skew is bounded by per-key density
within one window width.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_self_join(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window: int,
    left_filter=None,
    left_cols: Sequence[str] = (),
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """Pairs (a, b) of rows sharing `keys` with 0 < b.ts - a.ts <= window.

    `ts_col` must be integral (e.g. unix micros); `window` in the same unit.
    `left_filter` (optional Column) restricts anchor rows a. Output columns:
    keys, `left_cols` (anchor row), `right_cols` suffixed `_r`, plus
    `delta` = b.ts - a.ts.
    """
    keys = list(keys)
    bucket = (F.col(ts_col) / F.lit(window)).cast("long")

    anchors = df
    if left_filter is not None:
        anchors = anchors.filter(left_filter)
    # explode anchors, not the (usually larger) probe side
    anchors = anchors.select(
        *keys,
        F.col(ts_col).alias("__lts"),
        *[F.col(c) for c in left_cols if c not in keys and c != ts_col],
        F.explode(F.array(bucket, bucket + 1)).alias("__bk"),
    )
    probes = df.select(
        *keys,
        F.col(ts_col).alias("__rts"),
        *[F.col(c).alias(f"{c}_r") for c in right_cols if c not in keys],
        bucket.alias("__bk"),
    )
    delta = F.col("__rts") - F.col("__lts")
    return (
        anchors.join(probes, on=[*keys, "__bk"])
        .filter((delta > 0) & (delta <= window))
        .drop("__bk")
        .withColumn("delta", delta)
        .withColumnRenamed("__lts", ts_col)
        .withColumnRenamed("__rts", f"{ts_col}_r")
    )
