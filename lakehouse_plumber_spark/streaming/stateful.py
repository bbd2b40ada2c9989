"""Custom stateful streaming operators via applyInPandasWithState.

The reference's surface has no stateful streaming operator of its own
(SURVEY §2.6: watermarks/session windows absent — users write SQL), but a
PySpark-native engine should expose the Structured Streaming stateful path for
the cases SQL can't cover. Sessionization is the canonical example: per-key
state (the open session) lives in the state store, survives across
micro-batches and restarts (checkpointed), and scales horizontally because
state is partitioned by the grouping key — exactly how a 1000-executor
deployment shards it.

Determinism contract: events are processed per key in (ts, tiebreak) order
within each batch; a session closes when the NEXT event for that key arrives
more than `gap_us` later. Over a bounded run (availableNow) the emitted rows
are therefore every session except each key's final one, which remains open
in state — a property a batch SQL oracle can reproduce exactly.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


@contextmanager
def state_parallelism(spark, n_rows: int, rows_per_partition: int = 2_000_000, lo: int = 8):
    """Scope `spark.sql.shuffle.partitions` — which fixes a streaming query's
    state-store partition count for its lifetime — to the input volume.

    Same philosophy as the engine's adaptive CDC/IMV bucket sizing: each
    state partition is a checkpointed store with per-batch file I/O, so a
    small feed should not pay for the cluster-wide default, and a huge feed
    should not squeeze into it. Power-of-two in [lo, current default]; use
    around the writeStream.start() of a NEW stateful query only (an existing
    checkpoint has its partitioning baked in).
    """
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    need = max(1, (n_rows + rows_per_partition - 1) // rows_per_partition)
    target = lo
    while target < need:
        target <<= 1
    target = min(max(target, lo), cur)
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        yield target
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(cur))

OUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long, total_value double"
)
STATE_SCHEMA = "start_us long, last_us long, n long, total double"

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches events_sessionize


def sessionize_stateful(
    events: DataFrame,
    gap_us: int = DEFAULT_GAP_US,
    key_col: str = "user_id",
    ts_us_col: str = "eus",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Session windows with arbitrary per-session aggregates, as a custom
    stateful operator (applyInPandasWithState, append mode).

    `events` must be a streaming DataFrame with an int64 event-time column
    (`ts_us_col`); state per key is one open session. Emits closed sessions.

    Scale: state is hash-partitioned on the key by the streaming shuffle; the
    pandas loop touches only each batch's rows plus O(1) state per key, so
    executor memory is bounded by batch size, not history.
    """

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (uid,) = key
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        df = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        order = np.lexsort(
            (df[order_col].to_numpy(dtype="int64"), df[ts_us_col].to_numpy(dtype="int64"))
        )
        eus = df[ts_us_col].to_numpy(dtype="int64")[order]
        vals = np.nan_to_num(df[value_col].to_numpy(dtype="float64")[order], nan=0.0)

        prev = (state.get if state.exists else None)
        # vectorized session split: new session where the gap to the previous
        # event exceeds gap_us (first event compares against stored state)
        starts = np.empty(len(eus), dtype=bool)
        starts[1:] = (eus[1:] - eus[:-1]) > gap_us
        starts[0] = prev is None or (eus[0] - prev[1]) > gap_us
        # per-session aggregates via reduceat over boundary indices — no pandas
        # groupby machinery in the per-key hot path
        bounds = np.flatnonzero(starts)
        if len(bounds) == 0 or bounds[0] != 0:
            bounds = np.concatenate(([0], bounds))
        start_us = eus[bounds]
        end_us = eus[np.concatenate((bounds[1:] - 1, [len(eus) - 1]))]
        n_events = np.diff(np.concatenate((bounds, [len(eus)])))
        total = np.add.reduceat(vals, bounds)

        closed_prev = None
        if prev is not None:
            p_start, p_last, p_n, p_tot = prev
            if not starts[0]:
                # first chunk continues the stored open session
                start_us[0] = p_start
                n_events[0] += p_n
                total[0] += p_tot
            else:
                closed_prev = (uid, p_start, p_last, p_n, p_tot)
        # last session stays open in state; the rest close now
        state.update(
            (int(start_us[-1]), int(end_us[-1]), int(n_events[-1]), float(total[-1]))
        )
        k = len(bounds) - 1
        if closed_prev is None and k == 0:
            return
        out = pd.DataFrame(
            {
                "user_id": np.full(k, uid, dtype="int64"),
                "start_us": start_us[:k],
                "end_us": end_us[:k],
                "n_events": n_events[:k].astype("int64"),
                "total_value": total[:k],
            }
        )
        if closed_prev is not None:
            out = pd.concat(
                [pd.DataFrame([closed_prev], columns=out.columns.tolist()), out],
                ignore_index=True,
            )
        yield out

    return events.groupBy(key_col).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
