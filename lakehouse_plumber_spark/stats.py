"""ANALYZE-style table statistics: per-column null counts, numeric ranges,
and approximate distinct counts — the inputs a cost-based optimizer, a
data-quality dashboard, or a partition planner reads.

NDV uses the engine's mergeable KMV sketch (`llm/sketches.py`) instead of
exact COUNT(DISTINCT): the table is MELTED to (column, value-string) rows
with one narrow `explode` and swept by a single two-level exact-k-min
aggregation — one pass over the data for every column's estimate, per-task
state bounded by the sketch size, and (being md5-based) the estimates are
exactly reproducible by the DuckDB oracle, which no approx_count_distinct
pair allows.  Null counts and numeric min/max ride a second
map-side-combined aggregate; both passes are full-scan but metadata-sized
on output, the ANALYZE cost floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_plumber_spark.llm.sketches import kmv_distinct


def table_stats(df: DataFrame, cols: list[str], k: int = 64) -> DataFrame:
    """Per-column stats report: (col_name, n_rows, n_nulls, min_num, max_num,
    ndv_est).  `min_num`/`max_num` are NULL for non-numeric columns (string
    ranges don't render identically across engines; lexicographic min/max
    of strings is available via a plain agg when needed).

    Cross-engine caveat: NDV hashes the STRING rendering of each value;
    integer/string/date renderings agree between Spark and DuckDB, but raw
    float renderings do not (scientific-notation thresholds differ) —
    canonicalize float columns to fixed-scale DECIMAL before passing them
    here when oracle-exact NDV matters."""
    from pyspark.sql.types import NumericType

    if not cols:
        raise ValueError("table_stats needs at least one column")
    types = {f.name: f.dataType for f in df.schema.fields}
    melted = df.selectExpr(
        "stack({}, {}) AS (col_name, v)".format(
            len(cols),
            ", ".join(f"'{c}', cast({c} AS string)" for c in cols),
        )
    )
    ndv = kmv_distinct(melted, "col_name", "v", k=k).select(
        F.col("stratum").alias("col_name"), F.col("est_distinct").alias("ndv_est")
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(
            F.expr(f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)")
            .alias(f"__nulls_{c}")
        )
        if isinstance(types.get(c), NumericType):
            aggs.append(F.expr(f"CAST(min({c}) AS DOUBLE)").alias(f"__min_{c}"))
            aggs.append(F.expr(f"CAST(max({c}) AS DOUBLE)").alias(f"__max_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    spark = df.sparkSession
    base_rows = [
        (
            c,
            row["__n"],
            row[f"__nulls_{c}"],
            row.get(f"__min_{c}"),
            row.get(f"__max_{c}"),
        )
        for c in cols
    ]
    base = spark.createDataFrame(
        base_rows,
        "col_name string, n_rows long, n_nulls long, min_num double, max_num double",
    )
    return base.join(ndv, "col_name", "left").select(
        "col_name", "n_rows", "n_nulls", "min_num", "max_num", "ndv_est"
    )


def table_stats_duck(table: str, cols: list[str], numeric_cols: list[str], k: int = 64) -> str:
    """DuckDB oracle for `table_stats` — same melt, same KMV rank-select,
    same exact aggregates.  `numeric_cols` must list the columns whose
    min/max the Spark side emits (schema knowledge the SQL text can't
    introspect)."""
    from lakehouse_plumber_spark.llm.sketches import kmv_distinct_duck

    melt = " UNION ALL ".join(
        f"SELECT '{c}' AS col, cast({c} AS VARCHAR) AS v FROM {table}" for c in cols
    )
    # one source of truth for the KMV rank-select/estimator SQL — a hand
    # copy here would silently drift from the sketch module
    kmv = kmv_distinct_duck(f"(SELECT * FROM ({melt}))", "col", "v", k=k)
    per_col = []
    for c in cols:
        mn = f"CAST(min({c}) AS DOUBLE)" if c in numeric_cols else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(max({c}) AS DOUBLE)" if c in numeric_cols else "CAST(NULL AS DOUBLE)"
        per_col.append(
            f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"{mn} AS min_num, {mx} AS max_num FROM {table}"
        )
    base = " UNION ALL ".join(per_col)
    return f"""
    WITH est AS (SELECT stratum AS col, est_distinct AS ndv_est FROM ({kmv})),
    b AS ({base})
    SELECT b.col_name, b.n_rows, b.n_nulls, b.min_num, b.max_num, est.ndv_est
    FROM b LEFT JOIN est ON b.col_name = est.col
    """


def table_drift(
    a: DataFrame,
    b: DataFrame,
    cols: list[str],
    k: int = 64,
    null_rate_tol: float = 0.05,
    ndv_ratio_tol: float = 2.0,
) -> DataFrame:
    """Batch-over-batch DRIFT report: `table_stats` of two eras of the same
    table joined per column, with the deltas a data-quality monitor alerts
    on — null-rate shift, NDV ratio, numeric range movement.  Output:
    (col_name, n_rows_a/b, null_rate_a/b, ndv_a/b, ndv_ratio,
    min_a/b, max_a/b, drift).

    `drift` fires when |null_rate_b - null_rate_a| > `null_rate_tol` or
    the NDV ratio leaves [1/`ndv_ratio_tol`, `ndv_ratio_tol`] — the two
    signals that precede most schema-on-read incidents (a feed started
    emitting nulls / an id column collapsed or exploded).  Ranges are
    reported, not flagged: range movement is expected under natural
    growth.

    Every reported number is cross-engine exact: counts are integers,
    rates are ONE IEEE division of exact integers, NDV is the md5-based
    KMV estimate, min/max are exact.  Scale: two `table_stats` passes
    (each full-scan, metadata-sized output) + a columns-sized join —
    the same floor as running ANALYZE on both eras.
    """
    if not (0.0 <= null_rate_tol <= 1.0) or ndv_ratio_tol < 1.0:
        raise ValueError(
            f"need 0 <= null_rate_tol <= 1 and ndv_ratio_tol >= 1, got "
            f"{null_rate_tol} / {ndv_ratio_tol}"
        )
    sa = table_stats(a, cols, k)
    sb = table_stats(b, cols, k)
    ren_a = sa.select(
        "col_name",
        F.col("n_rows").alias("n_rows_a"), F.col("n_nulls").alias("__nulls_a"),
        F.col("ndv_est").alias("ndv_a"),
        F.col("min_num").alias("min_a"), F.col("max_num").alias("max_a"),
    )
    ren_b = sb.select(
        "col_name",
        F.col("n_rows").alias("n_rows_b"), F.col("n_nulls").alias("__nulls_b"),
        F.col("ndv_est").alias("ndv_b"),
        F.col("min_num").alias("min_b"), F.col("max_num").alias("max_b"),
    )
    j = ren_a.join(ren_b, "col_name")
    return j.selectExpr(
        "col_name",
        "n_rows_a", "n_rows_b",
        "CAST(__nulls_a AS DOUBLE) / n_rows_a AS null_rate_a",
        "CAST(__nulls_b AS DOUBLE) / n_rows_b AS null_rate_b",
        "coalesce(ndv_a, 0L) AS ndv_a",
        "coalesce(ndv_b, 0L) AS ndv_b",
        "CASE WHEN coalesce(ndv_a, 0L) > 0 THEN CAST(coalesce(ndv_b, 0L) AS DOUBLE) / ndv_a END AS ndv_ratio",
        "min_a", "min_b", "max_a", "max_b",
        f"(abs(CAST(__nulls_b AS DOUBLE) / n_rows_b - CAST(__nulls_a AS DOUBLE) / n_rows_a) > {null_rate_tol!r}"
        f" OR (coalesce(ndv_a, 0L) > 0 AND (CAST(coalesce(ndv_b, 0L) AS DOUBLE) / ndv_a > {ndv_ratio_tol!r}"
        f" OR CAST(coalesce(ndv_b, 0L) AS DOUBLE) / ndv_a < {1.0 / ndv_ratio_tol!r}))) AS drift",
    )


def table_drift_duck(
    table_a: str,
    table_b: str,
    cols: list[str],
    numeric_cols: list[str],
    k: int = 64,
    null_rate_tol: float = 0.05,
    ndv_ratio_tol: float = 2.0,
) -> str:
    """DuckDB oracle for `table_drift`: `table_stats_duck` of each era (the
    single source of truth for the stats SQL) joined with identical delta
    arithmetic."""
    sa = table_stats_duck(table_a, cols, numeric_cols, k)
    sb = table_stats_duck(table_b, cols, numeric_cols, k)
    return f"""
    WITH sa AS ({sa}), sb AS ({sb})
    SELECT sa.col_name,
           sa.n_rows AS n_rows_a, sb.n_rows AS n_rows_b,
           CAST(sa.n_nulls AS DOUBLE) / sa.n_rows AS null_rate_a,
           CAST(sb.n_nulls AS DOUBLE) / sb.n_rows AS null_rate_b,
           coalesce(sa.ndv_est, 0) AS ndv_a,
           coalesce(sb.ndv_est, 0) AS ndv_b,
           CASE WHEN coalesce(sa.ndv_est, 0) > 0
                THEN CAST(coalesce(sb.ndv_est, 0) AS DOUBLE) / sa.ndv_est END AS ndv_ratio,
           sa.min_num AS min_a, sb.min_num AS min_b,
           sa.max_num AS max_a, sb.max_num AS max_b,
           (abs(CAST(sb.n_nulls AS DOUBLE) / sb.n_rows - CAST(sa.n_nulls AS DOUBLE) / sa.n_rows) > {null_rate_tol!r}
            OR (coalesce(sa.ndv_est, 0) > 0
                AND (CAST(coalesce(sb.ndv_est, 0) AS DOUBLE) / sa.ndv_est > {ndv_ratio_tol!r}
                     OR CAST(coalesce(sb.ndv_est, 0) AS DOUBLE) / sa.ndv_est < {1.0 / ndv_ratio_tol!r}))) AS drift
    FROM sa JOIN sb USING (col_name)
    """
