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
