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
