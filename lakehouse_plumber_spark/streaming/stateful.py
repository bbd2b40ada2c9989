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

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
        (uid,) = key
        if state.exists:
            start, last, n, tot = state.get
        else:
            start = last = None
            n, tot = 0, 0.0
        closed = []
        df = pd.concat(list(pdfs), ignore_index=True)
        df = df.sort_values([ts_us_col, order_col])
        for eus, val in zip(df[ts_us_col], df[value_col]):
            eus = int(eus)
            val = 0.0 if val is None or pd.isna(val) else float(val)
            if last is not None and eus - last > gap_us:
                closed.append((uid, start, last, n, tot))
                start, n, tot = None, 0, 0.0
            if start is None:
                start = eus
            last = eus
            n += 1
            tot += val
        state.update((start, last, n, tot))
        yield pd.DataFrame(
            closed, columns=["user_id", "start_us", "end_us", "n_events", "total_value"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
