"""Deterministic sampling / split-assignment operators for training-data
pipelines.

Everything keys off the cross-engine content hash `md5int` (llm/hashing.py),
never `rand()`: the sample is a pure function of the row, so it is (a)
reproducible across runs, engines, and cluster sizes, (b) stable under
re-partitioning and retries, and (c) verifiable bit-for-bit by the DuckDB
oracle. This is how production corpus pipelines do it — a re-run must not
silently move documents between train and validation.

All three operators are per-row filters/projections: no shuffle, full
whole-stage codegen, trivially 100 TB-safe. Only `per_stratum_smallest_hash`
shuffles (one hash-partitioned top-k per stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_plumber_spark.llm.hashing import md5int_spark

SAMPLE_MOD = 1_000_000


def _bucket_expr(id_col: str) -> str:
    # hash the id with a salt so sampling buckets are independent of any
    # other md5int-keyed structure (LSH bands, split assignment, ...)
    salted = f"concat('sample:', cast({id_col} as string))"
    return f"{md5int_spark(salted)} % {SAMPLE_MOD}"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    A row survives iff hash(id) mod 1e6 < rate(stratum) * 1e6 — exact
    per-stratum rates in expectation, zero coordination, no shuffle.
    Up/down-weighting data sources ("2x Wikipedia, 0.1x CommonCrawl") is
    exactly this operator with a rates table.
    """
    # F.when chain, not string-formatted SQL: stratum names are data, and a
    # quote inside one must not be able to rewrite the expression
    cutoff = None
    for k, v in sorted(rates.items()):
        cond = F.col(strata_col) == F.lit(k)
        thr = F.lit(int(v * SAMPLE_MOD))
        cutoff = F.when(cond, thr) if cutoff is None else cutoff.when(cond, thr)
    default_thr = F.lit(int(default_rate * SAMPLE_MOD))
    cutoff = default_thr if cutoff is None else cutoff.otherwise(default_thr)
    return df.where(F.expr(_bucket_expr(id_col)) < cutoff)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    out: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test, ...) by hash range.

    Weights are normalized; assignment is a pure function of the id, so the
    split survives re-runs and incremental appends (a new document never
    moves existing ones).
    """
    total = sum(weights.values())
    items = sorted(weights.items())
    if len(items) == 1:
        return df.withColumn(out, F.lit(items[0][0]))
    b = F.expr(_bucket_expr(id_col))
    acc = 0.0
    expr = None
    for name, w in items[:-1]:
        acc += w / total
        cond = b < F.lit(int(acc * SAMPLE_MOD))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out, expr.otherwise(F.lit(items[-1][0])))


def per_stratum_smallest_hash(
    df: DataFrame, strata_col: str, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic k-row sample per stratum: the k smallest-hashed rows.

    The distributed equivalent of a per-group reservoir sample, but stable:
    rank by hash(id) within each stratum, keep rank <= k. One shuffle on the
    stratum key; with AQE skew handling a giant stratum splits fine because
    the window only needs per-stratum locality.
    """
    w = Window.partitionBy(strata_col).orderBy(F.expr(_bucket_expr(id_col)), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def mixture_weighted_sample(
    df: DataFrame,
    strata_col: str,
    parts: dict[str, int],
    target_rows: int | None = None,
    id_col: str = "doc_id",
    allow_upsample: bool = False,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Sample strata to hit a target mixture (training-data "data mixing").

    `parts` gives the mixture as integer proportions ("4 parts en, 2 parts
    de, 1 part fr") — the way corpus recipes are actually written, and it
    keeps every derived quantity in exact integer arithmetic so the DuckDB
    oracle reproduces the sample bit-for-bit (no float-rounding boundary
    rows). Per stratum the keep-threshold in millionths is

        thr_k = parts_k * n * 1_000_000 // (sum(parts) * count_k)

    where `n` is the target corpus size: the caller's `target_rows`, capped
    (unless `allow_upsample`) at the largest size reachable without
    replicating rows, n_max = min_k(count_k * sum(parts) // parts_k).

    Downsampling keeps a row iff its salted content hash falls under the
    stratum threshold — a pure per-row filter, no shuffle. With
    `allow_upsample`, a stratum rarer than its mixture share is replicated:
    every row emits thr//1e6 whole copies plus one more iff its hash falls
    under thr%1e6, with `copy_col` numbering the copies (epoch-style
    reweighting: "see Wikipedia 2.4 times per epoch").

    Scale: the only full-data work is one map-side-combined count per
    stratum (result rows are bounded by the number of strata, so the
    collect is metadata-sized); thresholds ship back as literals in a
    when-chain. The sample itself is embarrassingly parallel and stable
    under re-partitioning, retries, and engine choice. thr_k's numerator is
    parts_k * n * 1e6 — within int64 up to corpora of ~10^12 rows per unit
    part; beyond that, pre-divide parts by their gcd.
    """
    counts = {
        r[0]: r[1] for r in df.groupBy(strata_col).agg(F.count(F.lit(1))).collect()
    }
    if any(p < 0 for p in parts.values()):
        raise ValueError("mixture parts must be non-negative")
    total = sum(parts.values())
    if total <= 0:
        raise ValueError("mixture parts must sum to a positive total")
    pos = {k: p for k, p in sorted(parts.items()) if p > 0}
    missing = sorted(k for k in pos if not counts.get(k))
    if missing:
        raise ValueError(
            f"mixture strata absent from the data: {missing} — every "
            "positively-weighted stratum needs at least one row"
        )
    n_max = min(counts[k] * total // p for k, p in pos.items())
    if target_rows is None:
        n = n_max
    elif allow_upsample:
        n = int(target_rows)
    else:
        n = min(int(target_rows), n_max)
    thr = {k: p * n * SAMPLE_MOD // (total * counts[k]) for k, p in pos.items()}

    bucket = F.expr(_bucket_expr(id_col))

    def _chain(vals: dict[str, int]):
        # when-chain of integer literals (not string-formatted SQL: stratum
        # names are data); whole/frac splits are computed in exact Python
        # integer arithmetic, never float division in the plan
        expr = None
        for k, t in vals.items():
            cond = F.col(strata_col) == F.lit(k)
            expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
        return expr.otherwise(F.lit(0))

    if not allow_upsample:
        return df.where(bucket < _chain(thr))
    whole = _chain({k: t // SAMPLE_MOD for k, t in thr.items()})
    frac = _chain({k: t % SAMPLE_MOD for k, t in thr.items()})
    n_copies = whole.cast("long") + (bucket < frac).cast("long")
    return (
        df.withColumn("__nc", n_copies)
        .where(F.col("__nc") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nc") - 1)))
        .drop("__nc")
    )


def pack_token_shards(
    df: DataFrame,
    budget: int,
    shards: int = 64,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pack documents into contiguous token-budget bins for training shards.

    Training-data pipelines materialize the corpus as shards of roughly
    `budget` tokens each (sequence packing's coarse outer level). The rule
    here is deterministic contiguous fill: order documents by salted hash
    (stable, engine-independent), accumulate token counts, and start a new
    bin whenever the EXCLUSIVE prefix sum crosses a budget boundary — so a
    bin holds whole documents and overshoots by at most one document.

    Scale: a single global ordering would be one giant window partition, so
    packing is two-level — documents hash into `shards` independent groups
    first, and the running sum windows over each group in parallel (the
    shuffle is one hash partition by shard). Bin ids are (shard, bin) pairs;
    each shard's bins fill to the same budget, so global shard sizing stays
    uniform by the law of large numbers. NOT append-stable by design:
    packing is a materialization step, re-run per corpus snapshot.
    """
    salted = f"concat('pack:', cast({id_col} as string))"
    shard = F.expr(f"{md5int_spark(salted)} % {shards}")
    w = Window.partitionBy("__shard").orderBy(F.expr(_bucket_expr(id_col)), F.col(id_col))
    return (
        df.withColumn("__shard", shard)
        .withColumn(
            "__before",
            F.coalesce(
                F.sum(F.col(token_col)).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(
            F.col(id_col),
            F.col(token_col),
            F.col("__shard").cast("int").alias("shard"),
            F.floor(F.col("__before") / budget).cast("int").alias("bin"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    shards: int = 64,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fine-grained sequence packing: lay documents contiguously and cut the
    stream into fixed `seq_len`-token training sequences, emitting one row
    per (sequence, document-fragment) — the attention-boundary metadata a
    packed-pretraining data loader needs (which doc occupies which token
    range of which sequence, so cross-document attention can be masked).

    Same deterministic two-level layout as pack_token_shards (hash shards ->
    salted-hash order -> exclusive prefix sum), then each document explodes
    into the sequences it crosses: a doc starting at global token `start`
    with n tokens spans sequences start//L .. (start+n-1)//L, contributing
    fragment [max(s*L, start), min((s+1)*L, start+n)) to sequence s.

    Scale: one shuffle (hash by shard) feeds the running-sum window; the
    explode is bounded by ceil(n/L)+1 rows per document. Sequence ids are
    (shard, seq) pairs, so shards pack independently and in parallel.
    Zero-token documents are excluded (they occupy no tokens).
    """
    salted = f"concat('pack:', cast({id_col} as string))"
    shard = F.expr(f"{md5int_spark(salted)} % {shards}")
    w = Window.partitionBy("__shard").orderBy(F.expr(_bucket_expr(id_col)), F.col(id_col))
    laid = (
        df.where(F.col(token_col) > 0)
        .withColumn("__shard", shard)
        .withColumn(
            "__start",
            F.coalesce(
                F.sum(F.col(token_col)).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    L = int(seq_len)
    return (
        laid.withColumn(
            "seq",
            F.explode(F.expr(
                f"sequence(__start div {L}, (__start + {token_col} - 1) div {L})"
            )),
        )
        .select(
            F.col("__shard").cast("int").alias("shard"),
            F.col("seq").cast("int").alias("seq"),
            F.col(id_col),
            (F.greatest(F.col("seq") * L, F.col("__start")) - F.col("seq") * L)
            .cast("int").alias("frag_start"),
            (
                F.least((F.col("seq") + 1) * L, F.col("__start") + F.col(token_col))
                - F.greatest(F.col("seq") * L, F.col("__start"))
            ).cast("int").alias("frag_len"),
        )
    )


def weighted_poisson_sample(
    df: DataFrame,
    weight_expr: str,
    target_fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weight-proportional Poisson sampling: row i is kept with probability
    p_i = min(1, c·w_i) where c = target_fraction·N / Σw — so the expected
    sample size is target_fraction·N and inclusion odds scale with the
    weight (quality score, token count, dup-cluster size…).  This is the
    reweighting primitive behind quality-upsampled corpus mixes
    (`mixture_weighted_sample` reweights whole strata; this reweights
    individual documents).

    Deterministic: inclusion tests the row's salted md5 hash against
    p_i·2^60 — a pure function of (row id, weight, corpus totals), so the
    sample is stable across runs, engines, partitionings, and retries, and
    the DuckDB oracle reproduces it row-for-row.  The hash-vs-threshold
    comparison flips only within one double ulp of the boundary (~2^-53
    relative), which no realistic corpus hits.

    Scale: ONE metadata-sized aggregate (N, Σw, bad-weight count — map-side
    combined to a single collected row, the same pattern as
    `mixture_weighted_sample`'s per-stratum counts) followed by a narrow
    codegen'd filter with the totals shipped back as literals; the corpus is
    never shuffled and never joined.  NULL/negative/NaN/Infinity weights are
    rejected loudly in that same single pass rather than silently dropped.
    """
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in (0, 1], got {target_fraction}")
    w = df.selectExpr("*", f"CAST({weight_expr} AS DOUBLE) AS __w")
    bad_w = (
        "__w IS NULL OR __w < 0 OR isnan(__w) OR __w = CAST('Infinity' AS DOUBLE)"
    )
    n, sum_w, n_bad = w.agg(
        F.count(F.lit(1)).cast("long"),
        F.expr("CAST(SUM(CAST(__w AS DECIMAL(28,6))) AS DOUBLE)"),
        F.expr(f"SUM(CASE WHEN {bad_w} THEN 1 ELSE 0 END)").cast("long"),
    ).collect()[0]
    if n_bad:
        raise ValueError(
            f"weight expression {weight_expr!r} produced {n_bad} "
            "NULL/negative/NaN/Infinity values"
        )
    if not n:
        return (
            w.where(F.lit(False))
            .withColumn("include_prob", F.expr("CAST(NULL AS DOUBLE)"))
            .drop("__w")
        )
    if not sum_w:
        raise ValueError(f"weight expression {weight_expr!r} sums to zero")
    salted = f"concat('wps:', cast({id_col} as string))"
    # repr() round-trips doubles exactly; string->double parse is correctly
    # rounded, so the literal is the same double the aggregate produced
    p = f"least(1.0, {target_fraction} * {n} * __w / CAST('{sum_w!r}' AS DOUBLE))"
    keep = f"{md5int_spark(salted)} < {p} * 1152921504606846976.0"
    return (
        w.where(keep)
        .withColumn("include_prob", F.expr(f"round({p}, 6)"))
        .drop("__w")
    )


def weighted_poisson_sample_duck(
    table: str,
    weight_expr: str,
    target_fraction: float,
    cols: list[str],
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for `weighted_poisson_sample` over the given passthrough
    columns — same salted hash, same decimal-exact Σw, same threshold
    expression.  Kept next to the Spark implementation so the two can only
    drift together."""
    from lakehouse_plumber_spark.llm.hashing import md5int_duck

    h = md5int_duck(f"'wps:' || cast({id_col} AS VARCHAR)")
    col_list = ", ".join(cols)
    p = f"least(1.0, {target_fraction} * n * wv / sw)"
    return f"""
    WITH w AS (SELECT {col_list},
                      CAST({weight_expr} AS DOUBLE) AS wv FROM {table}),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(wv AS DECIMAL(28,6))) AS DOUBLE) AS sw FROM w)
    SELECT {col_list},
           round({p}, 6) AS include_prob
    FROM w CROSS JOIN tot
    WHERE {h} < {p} * 1152921504606846976.0
    """


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_rows: int | None = None,
    id_col: str = "doc_id",
    scale: int = 1000,
    allow_upsample: bool = False,
) -> DataFrame:
    """Temperature-based mixture sampling: stratum k's share ∝ n_k^alpha —
    the multilingual low-resource upsampling recipe (mBERT exponentiated
    smoothing, XLM-R alpha=0.3–0.7; alpha=1 keeps natural proportions,
    alpha→0 approaches uniform).  Instead of a hand-written parts recipe
    (`mixture_weighted_sample`), the recipe is DERIVED from the corpus:
    parts_k = floor(n_k^alpha * scale), then the same exact-integer
    threshold machinery produces the sample.

    Cross-engine determinism: the only float step is n^alpha.  At the
    default alpha=0.5 it is computed with IEEE sqrt — correctly rounded in
    every engine, so floor(sqrt(n)*scale) and therefore the SAMPLE
    reproduce bit-for-bit (the DuckDB oracle uses sqrt too).  Other alphas
    go through pow(), which engines only guarantee to ~1 ulp; a last-ulp
    difference can step one integer part and move a boundary row — fine
    for training mixes, not for an exactness oracle, hence the registry
    pins alpha=0.5.

    Scale: one metadata-sized count-per-stratum collect; the sample is a
    pure per-row hash filter, no shuffle (see mixture_weighted_sample).
    """
    import math

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    base = df.where(F.col(strata_col).isNotNull())
    counts = {
        r[0]: r[1]
        for r in base.groupBy(strata_col).agg(F.count(F.lit(1))).collect()
    }
    if not counts:
        raise ValueError("temperature_sample: no non-null strata in the input")
    power = (
        (lambda c: math.sqrt(c)) if alpha == 0.5 else (lambda c: math.pow(c, alpha))
    )
    parts = {k: int(math.floor(power(c) * scale)) for k, c in counts.items()}
    return mixture_weighted_sample(
        base, strata_col, parts, target_rows=target_rows, id_col=id_col,
        allow_upsample=allow_upsample,
    )


def temperature_sample_duck(
    table: str,
    strata_col: str,
    id_col: str = "doc_id",
    scale: int = 1000,
) -> str:
    """DuckDB oracle for `temperature_sample` at alpha=0.5: parts from
    floor(sqrt(n)*scale) (IEEE sqrt — identical doubles), then the exact
    mixture-threshold integer arithmetic of `mixture_weighted_sample`."""
    from lakehouse_plumber_spark.llm.hashing import md5int_duck

    h = md5int_duck(f"'sample:' || CAST({id_col} AS VARCHAR)")
    return f"""
    WITH cnt AS (SELECT {strata_col} AS s, COUNT(*) AS c FROM {table}
                 WHERE {strata_col} IS NOT NULL GROUP BY 1),
    parts AS (SELECT s, c,
                     CAST(floor(sqrt(CAST(c AS DOUBLE)) * {scale}) AS BIGINT) AS p
              FROM cnt),
    tot AS (SELECT SUM(p) AS total FROM parts),
    nv AS (SELECT MIN((c * (SELECT total FROM tot)) // p) AS n FROM parts),
    thr AS (SELECT s,
                   (p * (SELECT n FROM nv) * {SAMPLE_MOD})
                     // ((SELECT total FROM tot) * c) AS t
            FROM parts)
    SELECT d.{id_col}, d.{strata_col} FROM {table} d
    JOIN thr ON d.{strata_col} = thr.s
    WHERE {h} % {SAMPLE_MOD} < thr.t
    """
