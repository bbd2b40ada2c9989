"""Point-in-time feature engineering over an ordered fact stream.

`rolling_features` computes the classic ML feature-store battery per entity
(lag values, rolling-window aggregates, recency deltas, lifetime counters)
with every feature derived ONLY from strictly-earlier rows — the
leakage-free "as of this row" construction a training-set builder needs
(Kleppmann's point-in-time-correctness problem; the batch analogue of the
engine's as-of join in `functions/asof.py`).

Scale design: ONE hash exchange on the entity key serves every window
(identical partitioning → Catalyst plans a single Exchange + one sort);
all features are frame-bounded (`rowsBetween`) running computations, so
state per task is O(window width), never O(entity history).  Skewed
entities cost one sort of their own rows — at 100 TB pair with
`skew.py:two_phase_agg` for the handful of pathological keys.

Cross-engine determinism: money aggregates go through exact DECIMAL sums
(repo-wide recipe); orderings always carry the row id as the final
tie-break so frame boundaries are identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_features(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    id_col: str,
    amount_col: str,
    window_rows: int = 3,
) -> DataFrame:
    """Per-entity leakage-free features for every fact row:

    - `prev_amount`   — lag-1 amount (NULL on the entity's first row)
    - `rolling_avg`   — mean amount over the previous `window_rows` rows
                        (exclusive of the current row; NULL until one exists)
    - `days_since_prev` — whole days since the previous row's order date
    - `seq_no`        — 1-based position in the entity's history
    - `lifetime_amount` — exact running total of all PRIOR rows
    """
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    w = Window.partitionBy(entity_col).orderBy(order_col, id_col)
    dec = f"CAST({amount_col} AS DECIMAL(18,6))"
    return df.select(
        F.col(entity_col),
        F.col(id_col),
        F.col(order_col),
        F.col(amount_col),
        F.lag(amount_col, 1).over(w).alias("prev_amount"),
        F.expr(
            f"CAST(SUM({dec}) OVER (PARTITION BY {entity_col} "
            f"ORDER BY {order_col}, {id_col} "
            f"ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING) AS DOUBLE) "
            f"/ COUNT({amount_col}) OVER (PARTITION BY {entity_col} "
            f"ORDER BY {order_col}, {id_col} "
            f"ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING)"
        ).alias("rolling_avg"),
        F.datediff(
            F.col(order_col), F.lag(order_col, 1).over(w)
        ).cast("int").alias("days_since_prev"),
        F.row_number().over(w).cast("int").alias("seq_no"),
        F.expr(
            f"coalesce(CAST(SUM({dec}) OVER (PARTITION BY {entity_col} "
            f"ORDER BY {order_col}, {id_col} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DOUBLE), 0.0)"
        ).alias("lifetime_amount"),
    )


def rolling_features_duck(
    table: str,
    entity_col: str,
    order_col: str,
    id_col: str,
    amount_col: str,
    window_rows: int = 3,
) -> str:
    """DuckDB oracle for `rolling_features` — identical frames, identical
    decimal-exact arithmetic, identical (order, id) tie-break."""
    over = f"PARTITION BY {entity_col} ORDER BY {order_col}, {id_col}"
    recent = f"ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING"
    dec = f"CAST({amount_col} AS DECIMAL(18,6))"
    return f"""
    SELECT {entity_col}, {id_col}, {order_col}, {amount_col},
           lag({amount_col}, 1) OVER ({over}) AS prev_amount,
           CAST(SUM({dec}) OVER ({over} {recent}) AS DOUBLE)
             / COUNT({amount_col}) OVER ({over} {recent}) AS rolling_avg,
           CAST(date_diff('day',
               CAST(lag({order_col}, 1) OVER ({over}) AS DATE),
               CAST({order_col} AS DATE)) AS INT) AS days_since_prev,
           CAST(row_number() OVER ({over}) AS INT) AS seq_no,
           coalesce(CAST(SUM({dec}) OVER
               ({over} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS DOUBLE), 0.0) AS lifetime_amount
    FROM {table}
    """


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clamp `value_col` to the group's exact
    interpolated [lower, upper] percentiles — the robust-scaling step a
    feature pipeline applies before aggregates that outliers would
    dominate.  Output: input columns + (value_w, clipped_low,
    clipped_high).

    Cross-engine exactness: Spark's `percentile` == DuckDB's
    `quantile_cont` on identical doubles (the perplexity_buckets
    convention), and the clamp is a pure comparison against those
    thresholds, so the oracle reproduces every row.

    NULL handling: rows with a NULL group key are DROPPED (the threshold
    join is an inner equi-join and NULL never equals NULL) — pre-fill or
    pre-filter null groups; null VALUES should be pre-filtered too
    (least/greatest null semantics differ across engines).

    Scale: ONE map-side-combined percentile aggregate per group (bounded
    by group count) broadcast back onto a narrow projection — no window,
    no sort of the data itself.  The same single-buffer caveat as every
    exact percentile applies PER GROUP: beyond ~1e8 rows per group swap
    the thresholds for `kmv_quantile_sketch` cutoffs.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(
            f"need 0 <= lower < upper <= 1, got lower={lower} upper={upper}"
        )
    cuts = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lower!r})").alias("__lo"),
        F.expr(f"percentile({value_col}, {upper!r})").alias("__hi"),
    )
    out = df.join(F.broadcast(cuts), group_col)
    return (
        out.withColumn(
            "value_w",
            F.expr(f"least(greatest(cast({value_col} as double), __lo), __hi)"),
        )
        .withColumn("clipped_low", F.expr(f"cast({value_col} as double) < __lo"))
        .withColumn("clipped_high", F.expr(f"cast({value_col} as double) > __hi"))
        .drop("__lo", "__hi")
    )


def winsorize_duck(
    table: str,
    group_col: str,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    select_cols: str = "*",
) -> str:
    """DuckDB oracle for `winsorize`: quantile_cont thresholds per group,
    same clamp and flags."""
    return f"""
    WITH cuts AS (
      SELECT {group_col},
             quantile_cont(CAST({value_col} AS DOUBLE), {lower!r}) AS lo,
             quantile_cont(CAST({value_col} AS DOUBLE), {upper!r}) AS hi
      FROM {table} GROUP BY {group_col})
    SELECT {select_cols},
           least(greatest(CAST({value_col} AS DOUBLE), lo), hi) AS value_w,
           CAST({value_col} AS DOUBLE) < lo AS clipped_low,
           CAST({value_col} AS DOUBLE) > hi AS clipped_high
    FROM {table} JOIN cuts USING ({group_col})
    """
