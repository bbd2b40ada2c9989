"""As-of join: each left row matched to the latest right row at-or-before it.

Why not `left JOIN right ON key AND right.ts <= left.ts` + argmax? Catalyst
plans an inequality theta-join as BroadcastNestedLoopJoin (or a cartesian
product when neither side broadcasts) — O(n*m) per key and a driver OOM wait
at 100 TB. The union-tag formulation below is the scalable classic:

    union(tag left, tag right)
      -> one hash shuffle on the join keys
      -> per-key sort by (ts, side)
      -> running last-non-null of the right payload (window, no extra shuffle)
      -> keep left rows, unpack payload

One shuffle + one sort, identical asymptotics to a sort-merge join; works for
any key cardinality (the window state is one struct per key, not the right
side's history). Backward-inclusive semantics: a right row with ts equal to
the left row's ts matches (right sorts before left on ties).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"  # 0 = right (sorts first on ts ties -> inclusive), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[int] = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join (latest right row with right_ts <= left_ts per key).

    `left_ts`/`right_ts` must be mutually comparable orderable columns (use
    the same unit — e.g. unix micros — on both sides). Right columns other
    than keys/ts arrive prefixed with `prefix`; the match timestamp arrives
    as `<prefix><right_ts>`. `tolerance` (same unit as ts) drops matches
    older than `left_ts - tolerance`. Left rows with no match keep nulls.
    """
    keys = list(keys)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in payload_cols]
    )

    passthrough = [c for c in left.columns if c not in keys and c != left_ts]
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in passthrough],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = merged.filter(F.col(_SIDE) == 1).drop(_SIDE)

    match_ts = F.col(_PAYLOAD).getField(right_ts)
    if tolerance is not None:
        keep = match_ts >= (F.col("__ts") - F.lit(tolerance))
        out = out.withColumn(_PAYLOAD, F.when(keep, F.col(_PAYLOAD)))
        match_ts = F.col(_PAYLOAD).getField(right_ts)

    out = out.withColumn(f"{prefix}{right_ts}", match_ts)
    for c in payload_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(_PAYLOAD).getField(c))
    return out.drop(_PAYLOAD).withColumnRenamed("__ts", left_ts)
