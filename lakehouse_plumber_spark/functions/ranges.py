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


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    duration_s: int,
    day_col_alias: str = "day",
    id_col: str = "event_id",
) -> DataFrame:
    """Sweep-line peak-concurrency report: per calendar day, the maximum
    number of simultaneously-open intervals `[start, start + duration_s)`
    plus the day's interval count — the capacity-planning query behind
    "peak concurrent sessions/connections".

    Sweep-line construction: each interval emits (+1 at start, −1 at end);
    the running sum of deltas in time order IS the instantaneous concurrency,
    and its max is the peak.  Intervals crossing midnight are CLIPPED to each
    day they touch (an interval open at midnight counts toward both days'
    concurrency, its `n_started` only toward the day it began).

    Determinism: events at the same instant order (+1 before −1, then id) —
    i.e. an interval starting exactly when another ends counts as
    overlapping — identical in the DuckDB oracle.

    Scale: ONE hash exchange on the day key; the running sum is a
    frame-bounded window per day partition (state O(1) per row).  For
    multi-tenant data add the tenant to the partition key — same shape.
    A hotter-than-a-partition day is a genuine skew case: sub-partition by
    hour with carry-in counts (two-phase), which this report's day clipping
    already demonstrates the algebra for.
    """
    if duration_s < 1:
        raise ValueError(f"duration_s must be >= 1, got {duration_s}")
    # endpoints: (+1, start) and (-1, end), each tagged with every day the
    # CLIPPED interval touches; a crossing interval re-opens at midnight via
    # a synthetic +1 on the next day.
    edges = df.selectExpr(
        f"{id_col} AS __id",
        f"CAST({start_col} AS TIMESTAMP) AS __s",
        f"CAST({start_col} AS TIMESTAMP) + INTERVAL {duration_s} SECOND AS __e",
    ).selectExpr(
        "__id",
        "explode(sequence(CAST(__s AS DATE), CAST(__e AS DATE))) AS __day",
        "__s",
        "__e",
    ).selectExpr(
        "__id",
        "__day",
        "greatest(__s, CAST(__day AS TIMESTAMP)) AS s_clip",
        "least(__e, CAST(__day AS TIMESTAMP) + INTERVAL 1 DAY) AS e_clip",
        "CAST(__day = CAST(__s AS DATE) AS INT) AS is_origin_day",
    ).where("s_clip < e_clip")
    deltas = edges.selectExpr(
        "__id", "__day", "is_origin_day",
        "explode(array(named_struct('t', s_clip, 'd', 1), "
        "named_struct('t', e_clip, 'd', -1))) AS ev",
    ).selectExpr("__id", "__day", "is_origin_day", "ev.t AS t", "ev.d AS d")
    running = deltas.selectExpr(
        "__day", "is_origin_day", "d",
        "SUM(d) OVER (PARTITION BY __day ORDER BY t, d DESC, __id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc",
    )
    # day as yyyy-MM-dd string: raw DATE columns don't canonicalize
    # identically across engines (repo-wide oracle convention)
    return (
        running.groupBy(
            F.expr("date_format(__day, 'yyyy-MM-dd')").alias(day_col_alias)
        )
        .agg(
            F.max("conc").cast("int").alias("peak_concurrent"),
            F.expr(
                "CAST(SUM(CASE WHEN d = 1 AND is_origin_day = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_started"),
        )
    )


def peak_concurrency_duck(
    table: str,
    start_col: str,
    duration_s: int,
    day_col_alias: str = "day",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle for `peak_concurrency` — same clipping, same
    (t, +1-before-−1, id) sweep order."""
    return f"""
    WITH iv AS (
      SELECT {id_col} AS id, CAST({start_col} AS TIMESTAMP) AS s,
             CAST({start_col} AS TIMESTAMP) + INTERVAL {duration_s} SECOND AS e
      FROM {table}),
    days AS (
      SELECT id, s, e,
             unnest(generate_series(CAST(s AS DATE), CAST(e AS DATE),
                                    INTERVAL 1 DAY))::DATE AS day
      FROM iv),
    clipped AS (
      SELECT id, day,
             greatest(s, CAST(day AS TIMESTAMP)) AS s_clip,
             least(e, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY) AS e_clip,
             CAST(day = CAST(s AS DATE) AS INT) AS is_origin_day
      FROM days WHERE greatest(s, CAST(day AS TIMESTAMP))
                    < least(e, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY)),
    deltas AS (
      SELECT id, day, is_origin_day, s_clip AS t, 1 AS d FROM clipped
      UNION ALL
      SELECT id, day, is_origin_day, e_clip AS t, -1 AS d FROM clipped),
    running AS (
      SELECT day, is_origin_day, d,
             SUM(d) OVER (PARTITION BY day ORDER BY t, d DESC, id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM deltas)
    SELECT strftime(day, '%Y-%m-%d') AS {day_col_alias},
           CAST(max(conc) AS INT) AS peak_concurrent,
           CAST(SUM(CASE WHEN d = 1 AND is_origin_day = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_started
    FROM running GROUP BY day
    """
