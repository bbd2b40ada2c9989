"""Mergeable cardinality sketches (K-minimum-values) over DataFrames.

A KMV sketch (Bar-Yossef et al. 2002; Beyer et al. 2007 "distinct sampling")
keeps the k smallest distinct hash values of a column; the kth minimum
estimates the distinct count as `(k-1) * H / kth_min` for a hash range H.
Unlike HyperLogLog it is *exactly reproducible* across engines when the hash
is deterministic — here the 60-bit md5-derived hash from `llm/hashing.py`,
which evaluates identically in Spark SQL and DuckDB, so the correctness
oracle can check the sketch bit-for-bit (estimates included), something no
`approx_count_distinct` implementation pair allows.

Scale design (100 TB): the sketch is built as a TWO-LEVEL exact k-min —
first `groupBy(group, h % fanout)` collects per-subbucket min-k arrays
(map-side partial `collect_set`, each subbucket holds ~distinct/fanout
hashes), then `groupBy(group)` merges `fanout` arrays of ≤k values.  Peak
per-task state is `max(distinct/fanout, fanout*k)` hashes instead of the
full distinct set — the same two-phase shape `skew.py` uses for hot-key
aggregation.  Sketches are mergeable (`kmv_merge_expr`): union the min
arrays, dedup, keep the k smallest — so per-partition / per-day sketches
roll up without re-reading data, the property that makes KMV usable as a
materialized corpus statistic.

Reference anchor: Lakehouse Plumber ships no sketch primitives; this extends
the engine's corpus-statistics family (`llm/text.py:corpus_stats`) with the
cardinality report a training-data pipeline needs at scales where exact
COUNT(DISTINCT) is a full shuffle of every key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from lakehouse_plumber_spark.materialize import materialize_once

from .hashing import md5int_duck, md5int_spark

HASH_RANGE = 1 << 60  # md5int yields a uniform value in [0, 2^60)


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    fanout: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: `(stratum, mins)` with `mins` the sorted array of
    the ≤k smallest distinct hashes of `value_col`.

    Two exchanges, both map-side combined; per-task memory is bounded by
    `max(distinct/fanout, fanout*k)` hashes (see module docstring).
    """
    if k < 2:
        raise ValueError(f"kmv_sketch needs k >= 2, got {k}")
    hashed = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("stratum"),
        F.expr(md5int_spark(f"cast({value_col} as string)")).alias("h"),
    )
    partial = (
        hashed.withColumn("sub", F.pmod(F.col("h"), F.lit(fanout)))
        .groupBy("stratum", "sub")
        .agg(F.expr(f"slice(array_sort(collect_set(h)), 1, {k})").alias("part_mins"))
    )
    return partial.groupBy("stratum").agg(
        F.expr(
            f"slice(array_sort(array_distinct(flatten(collect_list(part_mins)))), 1, {k})"
        ).alias("mins")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two sketch DataFrames (full outer on stratum): union the min
    arrays, dedup, keep the k smallest.  sketch(A ∪ B) == merge(sketch(A),
    sketch(B)) exactly — property-tested in tests/test_retrieval_sketches.py."""
    left = a.withColumnRenamed("mins", "mins_a")
    right = b.withColumnRenamed("mins", "mins_b")
    joined = left.join(right, "stratum", "full_outer")
    merged = (
        "slice(array_sort(array_distinct(concat("
        "coalesce(mins_a, array()), coalesce(mins_b, array())"
        f"))), 1, {k})"
    )
    return joined.select("stratum", F.expr(merged).alias("mins"))


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count report from a sketch: when the sketch saturated
    (n_mins == k) the estimator is `(k-1) * 2^60 / kth_min`; below k every
    distinct hash was kept, so the count is exact (collisions at 60 bits are
    negligible at any k a sketch would use)."""
    return sketch.select(
        "stratum",
        F.expr("cast(size(mins) as int)").alias("n_mins"),
        F.expr("element_at(mins, -1)").alias("kth_min"),
        F.expr(
            f"cast(case when size(mins) >= {k} then "
            f"round(({k} - 1) * cast({HASH_RANGE} as double) / element_at(mins, -1)) "
            "else size(mins) end as bigint)"
        ).alias("est_distinct"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    fanout: int = 64,
) -> DataFrame:
    """End-to-end per-group distinct-count estimate via a KMV sketch."""
    return kmv_estimate(kmv_sketch(df, group_col, value_col, k, fanout), k)


def kmv_distinct_duck(
    table: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """DuckDB oracle for `kmv_distinct` — rank-select formulation of the same
    exact k-min (the two-level Spark plan computes the identical set)."""
    h = md5int_duck(f"cast({value_col} as varchar)")
    return f"""
    WITH h AS (SELECT DISTINCT {group_col} AS stratum, {h} AS h FROM {table}
               WHERE {value_col} IS NOT NULL),
    r AS (SELECT stratum, h,
                 row_number() OVER (PARTITION BY stratum ORDER BY h) AS rn
          FROM h),
    m AS (SELECT stratum, CAST(count(*) AS INT) AS n_mins, max(h) AS kth_min
          FROM r WHERE rn <= {k} GROUP BY stratum)
    SELECT stratum, n_mins, kth_min,
           CAST(CASE WHEN n_mins >= {k}
                THEN round(({k} - 1) * CAST({HASH_RANGE} AS DOUBLE) / kth_min)
                ELSE n_mins END AS BIGINT) AS est_distinct
    FROM m
    """


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Set-operation estimates between two KMV sketches (full outer on
    stratum): distinct counts of each side, of the union (one `kmv_merge`),
    and — by inclusion-exclusion on those deterministic integers —
    intersection and Jaccard.  The corpus-overlap / contamination-rate /
    audience-intersection question answered from two already-maintained
    sketches, no re-scan of either input.

    Output: (stratum, est_a, est_b, est_union, est_intersection,
    est_only_a, est_only_b, jaccard).  est_intersection =
    max(0, est_a + est_b - est_union) and the difference estimates are
    est_only_a = max(0, est_union - est_b) (elements of A absent from B —
    "new this era" / "lost audience") and symmetrically est_only_b; all
    inputs are the exactly-reproducible KMV estimates, so the DuckDB
    oracle checks every column bit-for-bit.  Error compounds from the
    three underlying estimates (each O(1/sqrt(k))), the standard
    KMV-overlap tradeoff — below k distinct per side everything is
    exact."""
    ea = kmv_estimate(a, k).select(
        "stratum", F.col("est_distinct").alias("est_a")
    )
    eb = kmv_estimate(b, k).select(
        "stratum", F.col("est_distinct").alias("est_b")
    )
    eu = kmv_estimate(kmv_merge(a, b, k), k).select(
        "stratum", F.col("est_distinct").alias("est_union")
    )
    joined = (
        eu.join(ea, "stratum", "left")
        .join(eb, "stratum", "left")
        .selectExpr(
            "stratum",
            "coalesce(est_a, 0L) AS est_a",
            "coalesce(est_b, 0L) AS est_b",
            "est_union",
        )
    )
    return joined.selectExpr(
        "stratum",
        "est_a",
        "est_b",
        "est_union",
        "greatest(0L, est_a + est_b - est_union) AS est_intersection",
        "greatest(0L, est_union - est_b) AS est_only_a",
        "greatest(0L, est_union - est_a) AS est_only_b",
        "round(greatest(0L, est_a + est_b - est_union) / "
        "cast(est_union AS double), 6) AS jaccard",
    )


def kmv_overlap_duck(
    table_a: str,
    table_b: str,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> str:
    """DuckDB oracle for `kmv_overlap` over two relations (each may be a
    subquery in parentheses): the same rank-select KMV estimate applied to
    side A, side B, and their unioned distinct hash set, then identical
    inclusion-exclusion arithmetic."""
    h = md5int_duck(f"cast({value_col} as varchar)")

    def est(src: str, alias: str) -> str:
        return f"""
    {alias}_h AS (SELECT DISTINCT {group_col} AS stratum, {h} AS h FROM {src}
                  WHERE {value_col} IS NOT NULL),
    {alias}_r AS (SELECT stratum, h,
                  row_number() OVER (PARTITION BY stratum ORDER BY h) AS rn
                  FROM {alias}_h),
    {alias}_m AS (SELECT stratum, CAST(count(*) AS INT) AS n_mins, max(h) AS kth_min
                  FROM {alias}_r WHERE rn <= {k} GROUP BY stratum),
    {alias}_e AS (SELECT stratum,
                  CAST(CASE WHEN n_mins >= {k}
                       THEN round(({k} - 1) * CAST({HASH_RANGE} AS DOUBLE) / kth_min)
                       ELSE n_mins END AS BIGINT) AS est
                  FROM {alias}_m)"""

    return f"""
    WITH {est(table_a, 'a')},
    {est(table_b, 'b')},
    {est(f"(SELECT * FROM {table_a} UNION ALL SELECT * FROM {table_b})", 'u')}
    SELECT u_e.stratum,
           coalesce(a_e.est, 0) AS est_a,
           coalesce(b_e.est, 0) AS est_b,
           u_e.est AS est_union,
           greatest(0, coalesce(a_e.est, 0) + coalesce(b_e.est, 0) - u_e.est)
             AS est_intersection,
           greatest(0, u_e.est - coalesce(b_e.est, 0)) AS est_only_a,
           greatest(0, u_e.est - coalesce(a_e.est, 0)) AS est_only_b,
           round(greatest(0, coalesce(a_e.est, 0) + coalesce(b_e.est, 0) - u_e.est)
                 / CAST(u_e.est AS DOUBLE), 6) AS jaccard
    FROM u_e
    LEFT JOIN a_e ON a_e.stratum = u_e.stratum
    LEFT JOIN b_e ON b_e.stratum = u_e.stratum
    """


def kmv_overlap_matrix(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    fanout: int = 64,
) -> DataFrame:
    """PAIRWISE corpus-overlap matrix across all strata from ONE sketch
    pass: the contamination / source-overlap audit every multi-source
    training mix needs ("how much does source X share with source Y?"),
    answered for every (X, Y) pair with NO join between fact sets.

    One `kmv_sketch` scan gives a ≤k-long min-hash array per stratum (the
    corpus is read once, regardless of how many strata); the pairwise
    stage is a broadcast self-join of that METADATA-sized sketch table
    (N strata -> N(N-1)/2 rows of pure array arithmetic — merge the two
    min arrays, re-estimate, inclusion-exclusion).  At 100 TB the fact
    scan dominates and is linear; the matrix stage is N^2 over k longs,
    i.e. free for any realistic source count.

    Output: (stratum_a, stratum_b, est_a, est_b, est_union,
    est_intersection, jaccard), stratum_a < stratum_b, one row per
    unordered pair.  All estimates are the deterministic KMV integers, so
    the DuckDB oracle (`kmv_overlap_matrix_duck`) checks every column
    bit-for-bit.  Error compounds from three O(1/sqrt(k)) estimates —
    below k distinct per stratum everything is exact."""
    # materialize the metadata-sized sketch table (one ≤k-long array per
    # stratum) so the self-join's two sides reuse it — without the pin the
    # lazy plan re-derives each side from scratch and the FACT table is
    # scanned twice (found r12 when the plan test stopped accepting a
    # rescan); at 100 TB a second corpus scan halves throughput
    sk = kmv_sketch(df, group_col, value_col, k, fanout).transform(
        materialize_once
    )
    a = sk.select(
        F.col("stratum").alias("stratum_a"), F.col("mins").alias("mins_a")
    )
    b = sk.select(
        F.col("stratum").alias("stratum_b"), F.col("mins").alias("mins_b")
    )

    def est(arr: str) -> str:
        return (
            f"cast(case when size({arr}) >= {k} then "
            f"round(({k} - 1) * cast({HASH_RANGE} as double) / element_at({arr}, -1)) "
            f"else size({arr}) end as bigint)"
        )

    union_arr = f"slice(array_sort(array_distinct(concat(mins_a, mins_b))), 1, {k})"
    return (
        a.join(F.broadcast(b), F.col("stratum_a") < F.col("stratum_b"))
        .select(
            "stratum_a",
            "stratum_b",
            F.expr(est("mins_a")).alias("est_a"),
            F.expr(est("mins_b")).alias("est_b"),
            F.expr(est(union_arr)).alias("est_union"),
        )
        .selectExpr(
            "stratum_a",
            "stratum_b",
            "est_a",
            "est_b",
            "est_union",
            "greatest(0L, est_a + est_b - est_union) AS est_intersection",
            "round(greatest(0L, est_a + est_b - est_union) / "
            "cast(est_union AS double), 6) AS jaccard",
        )
    )


def kmv_overlap_matrix_duck(
    table: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """DuckDB oracle for `kmv_overlap_matrix`: per-stratum rank-select KMV
    min arrays, pairwise (a < b) merge + identical estimate arithmetic."""
    h = md5int_duck(f"cast({value_col} as varchar)")
    return f"""
    WITH hs AS (SELECT DISTINCT {group_col} AS stratum, {h} AS h FROM {table}
                WHERE {value_col} IS NOT NULL),
    r AS (SELECT stratum, h,
                 row_number() OVER (PARTITION BY stratum ORDER BY h) AS rn
          FROM hs),
    m AS (SELECT stratum, list_sort(list(h)) AS mins FROM r
          WHERE rn <= {k} GROUP BY stratum),
    p AS (SELECT a.stratum AS stratum_a, b.stratum AS stratum_b,
                 a.mins AS mins_a, b.mins AS mins_b,
                 list_sort(list_distinct(list_concat(a.mins, b.mins)))[1:{k}]
                   AS mins_u
          FROM m a JOIN m b ON a.stratum < b.stratum),
    e AS (SELECT stratum_a, stratum_b,
                 CAST(CASE WHEN len(mins_a) >= {k}
                      THEN round(({k} - 1) * CAST({HASH_RANGE} AS DOUBLE) / mins_a[-1])
                      ELSE len(mins_a) END AS BIGINT) AS est_a,
                 CAST(CASE WHEN len(mins_b) >= {k}
                      THEN round(({k} - 1) * CAST({HASH_RANGE} AS DOUBLE) / mins_b[-1])
                      ELSE len(mins_b) END AS BIGINT) AS est_b,
                 CAST(CASE WHEN len(mins_u) >= {k}
                      THEN round(({k} - 1) * CAST({HASH_RANGE} AS DOUBLE) / mins_u[-1])
                      ELSE len(mins_u) END AS BIGINT) AS est_union
          FROM p)
    SELECT stratum_a, stratum_b, est_a, est_b, est_union,
           greatest(0, est_a + est_b - est_union) AS est_intersection,
           round(greatest(0, est_a + est_b - est_union)
                 / CAST(est_union AS DOUBLE), 6) AS jaccard
    FROM e
    """


# HyperLogLog (Flajolet et al. 2007): p index bits -> m = 2^p registers, each
# holding max(rho) where rho = leading-zero count of the remaining hash bits
# + 1. All register math is INTEGER (index, rho, max), so unlike every
# engine-native HLL the register table reproduces bit-for-bit cross-engine;
# the two float steps (raw estimate = one literal/bigint division; linear
# counting = a precomputed 1024-entry integer table instead of a runtime ln)
# are deterministic too, so even the ESTIMATES oracle-check exactly.
HLL_P = 10
HLL_M = 1 << HLL_P
_HLL_MAX_RHO = 60 - HLL_P + 1  # rest has 50 bits; rho in [1, 51]
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# numerator of the raw estimator alpha * m^2 / sum(2^-M_j), with the sum kept
# as the exact integer S = sum(2^(51 - M_j)) (empty registers contribute
# 2^51): one double literal / one exact bigint -> one IEEE division.
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_MAX_RHO)
_HLL_EMPTY_TERM = 1 << _HLL_MAX_RHO


def _hll_linear_table() -> list[int]:
    """round(m * ln(m / zeros)) for zeros = 1..m, precomputed so neither
    engine evaluates ln at query time (JVM Math.log and libm may differ in
    the last ulp; a 1024-entry integer literal cannot)."""
    import math

    return [round(HLL_M * math.log(HLL_M / z)) for z in range(1, HLL_M + 1)]


def hll_sketch(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HLL register table `(stratum, idx, rho_max)` — only set
    registers are materialized (at most m = 1024 rows per group, whatever
    the input size).  One map-side-combined shuffle on (stratum, idx); the
    partial max keeps per-task state at groups x m integers."""
    from .hashing import let_spark

    m, mr = HLL_M, _HLL_MAX_RHO
    pair = let_spark(
        md5int_spark(f"cast({value_col} as string)"),
        "h",
        f"named_struct('idx', cast(pmod(h, {m}) as int), "
        f"'rho', cast(CASE WHEN (h div {m}) = 0 THEN {mr} "
        f"ELSE {mr} - length(bin(h div {m})) END as int))",
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("stratum"), F.expr(pair).alias("p"))
        .groupBy("stratum", F.col("p.idx").alias("idx"))
        .agg(F.max("p.rho").alias("rho_max"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Registers merge by max: sketch(A) merge sketch(B) == sketch(A ∪ B)
    register-for-register (max is idempotent — overlapping inputs are fine,
    unlike counter sketches)."""
    return a.unionByName(b).groupBy("stratum", "idx").agg(
        F.max("rho_max").alias("rho_max")
    )


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """Cardinality report off a register table: raw HLL estimator, switched
    to linear counting below 2.5m with empty registers (the standard
    small-range correction), both branches exactly reproducible (see the
    constants above).  Output: (stratum, n_registers, zeros, s_total,
    est_distinct, method)."""
    m, mr = HLL_M, _HLL_MAX_RHO
    lin = ", ".join(str(v) for v in _hll_linear_table())
    per = sketch.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("int").alias("n_registers"),
        F.sum(F.expr(f"shiftleft(1L, {mr} - rho_max)")).alias("s_set"),
    )
    return per.select(
        "stratum",
        "n_registers",
        F.expr(f"cast({m} - n_registers as int)").alias("zeros"),
        F.expr(
            f"cast(s_set + ({m} - n_registers) * {_HLL_EMPTY_TERM}L as bigint)"
        ).alias("s_total"),
        F.expr(
            f"CASE WHEN {_HLL_NUM!r} / cast(s_set + ({m} - n_registers) * "
            f"{_HLL_EMPTY_TERM}L as double) <= {2.5 * m!r} AND n_registers < {m} "
            f"THEN element_at(array({lin}), {m} - n_registers) "
            f"ELSE cast(round({_HLL_NUM!r} / cast(s_set + ({m} - n_registers) * "
            f"{_HLL_EMPTY_TERM}L as double)) as bigint) END"
        ).alias("est_distinct"),
        F.expr(
            f"CASE WHEN {_HLL_NUM!r} / cast(s_set + ({m} - n_registers) * "
            f"{_HLL_EMPTY_TERM}L as double) <= {2.5 * m!r} AND n_registers < {m} "
            "THEN 'linear' ELSE 'raw' END"
        ).alias("method"),
    )


def hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """End-to-end per-group distinct-count estimate via HLL registers."""
    return hll_estimate(hll_sketch(df, group_col, value_col))


def hll_distinct_duck(table: str, group_col: str, value_col: str) -> str:
    """DuckDB oracle for `hll_distinct`: identical integer register math
    (same md5 hash, same idx/rho split via bin()), same literal constants,
    same precomputed linear-counting table."""
    m, mr = HLL_M, _HLL_MAX_RHO
    h = md5int_duck(f"cast({value_col} as varchar)")
    lin = ", ".join(str(v) for v in _hll_linear_table())
    return f"""
    WITH h_t AS (SELECT {group_col} AS stratum, {h} AS h
                 FROM {table} WHERE {value_col} IS NOT NULL),
    p_t AS (SELECT stratum, CAST(h % {m} AS INT) AS idx,
                   CAST(CASE WHEN h // {m} = 0 THEN {mr}
                        ELSE {mr} - length(bin(h // {m})) END AS INT) AS rho
            FROM h_t),
    regs AS (SELECT stratum, idx, MAX(rho) AS rho_max FROM p_t GROUP BY 1, 2),
    agg AS (SELECT stratum, CAST(count(*) AS INT) AS n_registers,
                   SUM(1::BIGINT << ({mr} - rho_max)) AS s_set
            FROM regs GROUP BY 1),
    tot AS (SELECT stratum, n_registers,
                   CAST({m} - n_registers AS INT) AS zeros,
                   CAST(s_set + ({m} - n_registers)::BIGINT * {_HLL_EMPTY_TERM} AS BIGINT) AS s_total
            FROM agg)
    SELECT stratum, n_registers, zeros, s_total,
           CASE WHEN {_HLL_NUM!r} / CAST(s_total AS DOUBLE) <= {2.5 * m!r} AND zeros > 0
                THEN ([{lin}])[zeros]
                ELSE CAST(round({_HLL_NUM!r} / CAST(s_total AS DOUBLE)) AS BIGINT) END
             AS est_distinct,
           CASE WHEN {_HLL_NUM!r} / CAST(s_total AS DOUBLE) <= {2.5 * m!r} AND zeros > 0
                THEN 'linear' ELSE 'raw' END AS method
    FROM tot
    """


def _row_hash_spark(key_cols: list[str]) -> str:
    """60-bit md5 of the row key — '|'-joined string casts, identical text in
    DuckDB (`_row_hash_duck`), so the bottom-k row selection is cross-engine
    exact."""
    joined = ", ".join(f"cast({c} as string)" for c in key_cols)
    return md5int_spark(f"concat_ws('|', {joined})")


def _row_hash_duck(key_cols: list[str]) -> str:
    joined = ", ".join(key_cols)
    return md5int_duck(f"concat_ws('|', {joined})")


def _quantile_col_names(quantiles: tuple[float, ...]) -> list[str]:
    """Clean-identifier column names for quantile outputs: q_25, q_50, q_95.
    Derived numerically (not from float repr, which embeds dots for q=1.0
    and depends on formatting), validated to (0, 1) exclusive, and checked
    for collisions so q=0.124 vs q=0.125 cannot silently share a column."""
    names = []
    for q in quantiles:
        if not 0.0 < q < 1.0:
            raise ValueError(f"quantiles must be in (0, 1) exclusive, got {q}")
        names.append(f"q_{round(q * 100):02d}")
    if len(set(names)) != len(names):
        raise ValueError(
            f"quantiles {quantiles} collide after rounding to integer "
            f"percents ({names}); space them at least 0.01 apart"
        )
    return names


def kmv_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_cols: list[str],
    k: int = 64,
    fanout: int = 64,
) -> DataFrame:
    """Per-group bottom-k uniform ROW sample: `(stratum, sample)` where
    `sample` is the sorted array of `(h, v)` structs for the k smallest row
    hashes — the quantile companion to the KMV distinct sketch.

    Hashing the ROW KEY (not the value) makes this a uniform sample of the
    value DISTRIBUTION, duplicates included — a distinct-value sample (the
    plain KMV) would answer quantiles over distinct values, a different
    statistic.  Nearest-rank order statistics of the sample estimate any
    quantile with error O(1/sqrt(k)); below k rows the sample is the whole
    group and every quantile is exact.

    Mergeable over DISJOINT row sets (batches, partitions, days): each side
    retained its k smallest row hashes, so the k smallest of the union
    survive in the concatenation — merge == one-shot, exactly
    (property-tested).  Same two-level plan as `kmv_sketch`: per-subbucket
    bottom-k partials, then a fanout-bounded merge, so per-task state is
    `max(rows/fanout, fanout*k)` structs, never a full group.

    PRECONDITION: `key_cols` should form a unique row key.  Duplicate keys
    collapse to one `(h, v)` struct (identical pairs land in the same
    subbucket and are deduped at BOTH levels, mirrored by the oracle's
    SELECT DISTINCT), so a duplicated row gets one sample slot, not many —
    i.e. the sample is uniform over distinct keyed rows.  To weight by
    multiplicity, pass a truly unique key.
    """
    if k < 2:
        raise ValueError(f"kmv_quantile_sketch needs k >= 2, got {k}")
    if not key_cols:
        raise ValueError("kmv_quantile_sketch needs at least one row-key column")
    pair = (
        f"named_struct('h', {_row_hash_spark(key_cols)}, "
        f"'v', cast({value_col} as double))"
    )
    hashed = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("stratum"), F.expr(pair).alias("p")
    )
    partial = (
        hashed.withColumn("sub", F.pmod(F.col("p.h"), F.lit(fanout)))
        .groupBy("stratum", "sub")
        .agg(
            F.expr(
                f"slice(array_distinct(array_sort(collect_list(p))), 1, {k})"
            ).alias("part")
        )
    )
    return partial.groupBy("stratum").agg(
        F.expr(
            f"slice(array_sort(array_distinct(flatten(collect_list(part)))), 1, {k})"
        ).alias("sample")
    )


def kmv_quantile_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two quantile sketches built over DISJOINT row sets: concatenate,
    keep the k structs with the smallest hashes.  (`array_distinct` guards a
    replayed batch: an identical `(h, v)` pair collapses instead of biasing
    the sample.)"""
    left = a.withColumnRenamed("sample", "s_a")
    right = b.withColumnRenamed("sample", "s_b")
    joined = left.join(right, "stratum", "full_outer")
    merged = (
        "slice(array_sort(array_distinct(concat("
        "coalesce(s_a, array()), coalesce(s_b, array())"
        f"))), 1, {k})"
    )
    return joined.select("stratum", F.expr(merged).alias("sample"))


def kmv_quantile_estimate(
    sketch: DataFrame, quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
) -> DataFrame:
    """Nearest-rank quantiles off a sketch: value at rank `ceil(q*n)` of the
    sample sorted by value (rank 1 floor so q=0 is the minimum).  All-integer
    indexing over identical doubles — no interpolation, so the DuckDB oracle
    reproduces every estimate bit-for-bit."""
    vals = "array_sort(transform(sample, s -> s.v))"
    cols = [
        F.col("stratum"),
        F.expr("cast(size(sample) as int)").alias("n_sample"),
    ]
    for q, name in zip(quantiles, _quantile_col_names(quantiles)):
        cols.append(
            F.expr(
                f"element_at({vals}, greatest(1, cast(ceil({q!r} * size(sample)) as int)))"
            ).alias(name)
        )
    return sketch.select(*cols)


def kmv_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_cols: list[str],
    k: int = 64,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    fanout: int = 64,
) -> DataFrame:
    """End-to-end per-group quantile estimates via a bottom-k row sample."""
    return kmv_quantile_estimate(
        kmv_quantile_sketch(df, group_col, value_col, key_cols, k, fanout), quantiles
    )


def kmv_quantiles_duck(
    table: str,
    group_col: str,
    value_col: str,
    key_cols: list[str],
    k: int = 64,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> str:
    """DuckDB oracle for `kmv_quantiles` — rank-select bottom-k (ties on h
    broken by v, the struct sort order Spark uses), then the same
    nearest-rank indexing."""
    h = _row_hash_duck(key_cols)
    qcols = ",\n           ".join(
        f"vals[greatest(1, CAST(ceil({q!r} * len(vals)) AS INT))] AS {name}"
        for q, name in zip(quantiles, _quantile_col_names(quantiles))
    )
    return f"""
    WITH h_t AS (SELECT DISTINCT {group_col} AS stratum, {h} AS h,
                        CAST({value_col} AS DOUBLE) AS v
                 FROM {table} WHERE {value_col} IS NOT NULL),
    r AS (SELECT stratum, v,
                 row_number() OVER (PARTITION BY stratum ORDER BY h, v) AS rn
          FROM h_t),
    s AS (SELECT stratum, list(v ORDER BY v) AS vals
          FROM r WHERE rn <= {k} GROUP BY stratum)
    SELECT stratum, CAST(len(vals) AS INT) AS n_sample,
           {qcols}
    FROM s
    """


# Count-Min Sketch parameters: d independent rows x w counters. Error bound:
# est - true <= 2N/w with probability 1 - (1/2)^d for stream size N.
CMS_D = 4
CMS_W = 4096


def _cms_positions(d: int, w: int, h: str, dialect: str) -> list[str]:
    from .hashing import minhash_coeffs, minhash_mix

    mod = "pmod" if dialect == "spark" else None
    out = []
    for a, b, c in minhash_coeffs(d):
        mix = minhash_mix(a, b, c, h, dialect)
        out.append(f"pmod({mix}, {w})" if mod else f"(({mix}) % {w})")
    return out


def cms_sketch(
    df: DataFrame, value_col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of `value_col`'s
    frequency distribution: `(r, c, cnt)` rows of the d x w counter table —
    at most d*w rows (64 KiB of longs at the defaults) regardless of input
    size, mergeable by summing counters (`cms_merge`), and — like KMV —
    EXACTLY reproducible cross-engine: positions are Mersenne-61 mixes of
    the 60-bit md5 value hash and every counter is an exact integer sum, so
    the DuckDB oracle checks the sketch and every estimate bit-for-bit.

    Plan: exact per-value counts first (one map-side-combined shuffle on the
    value — the aggregate any frequency job pays), then a model-sized
    explode of d positions per DISTINCT value into the counter aggregate.
    Occurrence-sized data crosses the wire once; the d-way fan-out touches
    only distinct values.
    """
    if d < 1 or w < 2:
        raise ValueError(f"cms_sketch needs d >= 1 and w >= 2, got d={d} w={w}")
    from .hashing import let_spark

    per_value = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("string").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    entries = ", ".join(
        f"named_struct('r', {i}, 'c', {p})"
        for i, p in enumerate(_cms_positions(d, w, "h", "spark"))
    )
    pos = let_spark(md5int_spark("v"), "h", f"array({entries})")
    return (
        per_value.select(F.col("cnt"), F.explode(F.expr(pos)).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS sketches built with the same (d, w): counters sum —
    sketch(A) + sketch(B) == sketch(A union-all B)."""
    return a.unionByName(b).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, values: DataFrame, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Frequency estimates for `values` (one string column `v`) against a
    CMS sketch: min over the d rows of the value's counter — `(v,
    est_count)`.  The sketch broadcasts (it is at most d*w rows)."""
    from .hashing import let_spark

    entries = ", ".join(
        f"named_struct('r', {i}, 'c', {p})"
        for i, p in enumerate(_cms_positions(d, w, "h", "spark"))
    )
    pos = let_spark(md5int_spark("v"), "h", f"array({entries})")
    probes = values.select(F.col("v"), F.explode(F.expr(pos)).alias("p")).select(
        "v", F.col("p.r").alias("r"), F.col("p.c").alias("c")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("v")
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_count: int,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Values whose CMS frequency estimate reaches `min_count`, with the
    estimate: `(value, est_count)`.  CMS only OVERESTIMATES (hash collisions
    add counts, never subtract), so this candidate set has NO false
    negatives — every truly-frequent value appears; verify exactly
    downstream if false positives matter.  Estimate = min over the d rows of
    the value's counter.
    """
    sketch = cms_sketch(df, value_col, d, w)
    values = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("string").alias("v"))
        .distinct()
    )
    return cms_estimate(sketch, values, d, w).where(
        F.col("est_count") >= min_count
    )


def cms_heavy_hitters_duck(
    table: str, value_col: str, min_count: int, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB oracle for `cms_heavy_hitters`: same value hash, same position
    mixes, same exact-integer counters and min-over-rows estimate."""
    h = md5int_duck("v")
    pos = _cms_positions(d, w, "h", "duck")
    pos_structs = ", ".join(
        f"{{'r': {i}, 'c': {p}}}" for i, p in enumerate(pos)
    )
    return f"""
    WITH pv AS (SELECT CAST({value_col} AS VARCHAR) AS v,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1),
    hp AS (SELECT v, cnt, {h} AS h FROM pv),
    expl AS (SELECT v, cnt, unnest([{pos_structs}]) AS p FROM hp),
    sketch AS (SELECT p.r AS r, p.c AS c, SUM(cnt) AS scnt
               FROM expl GROUP BY 1, 2),
    probes AS (SELECT v, p.r AS r, p.c AS c FROM expl),
    est AS (SELECT v, MIN(scnt) AS est_count
            FROM probes JOIN sketch USING (r, c) GROUP BY v)
    SELECT v, CAST(est_count AS BIGINT) AS est_count
    FROM est WHERE est_count >= {min_count}
    """
