"""Skew mitigation utilities.

AQE's skew-join split (enabled in session.py) is the first line of defense;
explicit salting is for the cases AQE can't fix — a single hot key that
exceeds one executor even after splits, or aggregations (AQE skew handling
applies to joins only).

`salted_join`: big side gets a deterministic salt in [0, n); the small side
is replicated n times; the join key becomes (key, salt). Each hot key's rows
then spread across n reducers. `two_phase_agg`: pre-aggregate on
(key, salt) then finish on key — the map-side-combine trick made explicit
for high-cardinality-value aggs where partial aggregation degenerates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join robust to hot keys on the big side.

    The salt is derived from stable row content (xxhash64 of all big-side
    columns), not rand(): deterministic under retries, which matters for
    exactly-once sinks. Cost: small side inflates x salt — keep it for
    genuinely small dims (it is being broadcast anyway).
    """
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int")
    )
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    return big_s.join(small_s, on=on + ["__salt"], how=how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Aggregate with an explicit salted pre-phase: sum/count/min/max only
    (the algebraic aggregates that re-combine exactly)."""
    allowed = {"sum", "count", "min", "max"}
    bad = {fn for fn in aggs.values() if fn not in allowed}
    if bad:
        raise ValueError(f"two_phase_agg supports {sorted(allowed)}, got {sorted(bad)}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(salt)).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()]
    )
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(*keys).agg(
        *[recombine[fn](f"__p_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Equi-join with a Bloom pre-filter on the big side — the semi-join
    reduction Spark's runtime bloom filter applies when statistics allow
    (spark.sql.optimizer.runtime.bloomFilter.enabled), made explicit and
    deterministic for the cases the optimizer misses (UDF-opaque inputs,
    missing stats, or a small side that is itself a subquery).

    The small side's DISTINCT join keys fold into an `m_bits` bitmap
    (m/64 longs — 128 KiB at the default, independent of either input's
    size) via the same md5 + Mersenne-61 position derivation as the Bloom
    decontaminator; big-side rows whose key misses any of the `k_hashes`
    bits are dropped BEFORE the join's exchange, so shuffle bytes scale
    with the match rate instead of the big side's size.  False positives
    (~(1 - e^(-k*s/m))^k for s distinct keys) pass the pre-filter and are
    eliminated by the exact join that follows — the OUTPUT is exactly the
    plain join's, which is what the oracle checks.  `how` is limited to
    inner / left_semi: shapes where dropping non-matching big rows early
    is semantics-preserving (a left/full outer must keep them).

    Plan: one bitmap-bounded aggregate + collect on the small side (never
    data-sized), one broadcast 1-row array, a narrow big-side filter, then
    the ordinary join.
    """
    from lakehouse_plumber_spark.llm.hashing import (
        let_spark,
        md5int_spark,
        minhash_coeffs,
        minhash_mix,
    )

    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_filtered_join supports inner|left_semi (early big-side "
            f"drop must be semantics-preserving), got {how!r}"
        )
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    keys = on if isinstance(on, list) else [on]
    joined_key = ", ".join(f"cast({k} as string)" for k in keys)
    keyh = md5int_spark(f"concat_ws('|', {joined_key})")
    coeffs = minhash_coeffs(k_hashes)

    def _pos(c, h):
        a, b, cc = c
        return f"pmod({minhash_mix(a, b, cc, h, 'spark')}, {m_bits})"

    pos_arr = "array(" + ", ".join(_pos(c, "h") for c in coeffs) + ")"
    words = (
        small.selectExpr(f"{keyh} AS h")
        .distinct()
        .select(F.explode(F.expr(pos_arr)).alias("p"))
        .selectExpr(
            "CAST(p DIV 64 AS INT) AS w",
            "shiftleft(1L, CAST(p % 64 AS INT)) AS m",
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .collect()  # <= m_bits/64 rows — bitmap-bounded, never data-sized
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    bloom = big.sparkSession.createDataFrame([(bitmap,)], "__bloom array<bigint>")
    hit = " AND ".join(
        f"(element_at(__bloom, CAST({_pos(c, 'h')} DIV 64 AS INT) + 1) "
        f"& shiftleft(1L, CAST({_pos(c, 'h')} % 64 AS INT))) != 0"
        for c in coeffs
    )
    filtered = (
        big.crossJoin(F.broadcast(bloom))
        .where(F.expr(let_spark(keyh, "h", f"({hit})")))
        .drop("__bloom")
    )
    return filtered.join(small, keys, how)
