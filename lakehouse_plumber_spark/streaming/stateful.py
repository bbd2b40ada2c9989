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
        import numpy as np

        (uid,) = key
        df = pd.concat(list(pdfs), ignore_index=True).sort_values([ts_us_col, order_col])
        if not len(df):
            yield pd.DataFrame(
                columns=["user_id", "start_us", "end_us", "n_events", "total_value"]
            )
            return
        eus = df[ts_us_col].to_numpy(dtype="int64")
        vals = df[value_col].to_numpy(dtype="float64")
        vals = np.nan_to_num(vals, nan=0.0)

        prev = (state.get if state.exists else None)
        # vectorized session split: new session where the gap to the previous
        # event exceeds gap_us (first event compares against stored state)
        new_sess = np.empty(len(eus), dtype=bool)
        new_sess[1:] = (eus[1:] - eus[:-1]) > gap_us
        new_sess[0] = prev is None or (eus[0] - prev[1]) > gap_us
        sid = np.cumsum(new_sess)  # 0 => continues the stored open session

        agg = (
            df.assign(__sid=sid)
            .groupby("__sid", sort=True)
            .agg(
                start_us=(ts_us_col, "min"),
                end_us=(ts_us_col, "max"),
                n_events=(ts_us_col, "size"),
                total_value=(value_col, "sum"),
            )
            .reset_index()
        )
        closed = []
        if prev is not None:
            p_start, p_last, p_n, p_tot = prev
            if len(agg) and agg.loc[0, "__sid"] == 0:
                # first chunk continues the open session
                agg.loc[0, "start_us"] = p_start
                agg.loc[0, "n_events"] += p_n
                agg.loc[0, "total_value"] += p_tot
            else:
                closed.append((uid, p_start, p_last, p_n, p_tot))
        # last session stays open in state; the rest close now
        open_row = agg.iloc[-1]
        state.update(
            (int(open_row["start_us"]), int(open_row["end_us"]),
             int(open_row["n_events"]), float(open_row["total_value"]))
        )
        done = agg.iloc[:-1]
        frames = []
        if closed:
            frames.append(
                pd.DataFrame(
                    closed,
                    columns=["user_id", "start_us", "end_us", "n_events", "total_value"],
                )
            )
        if len(done):
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": uid,
                        "start_us": done["start_us"].astype("int64"),
                        "end_us": done["end_us"].astype("int64"),
                        "n_events": done["n_events"].astype("int64"),
                        "total_value": done["total_value"].astype("float64"),
                    }
                )
            )
        if not frames:
            yield pd.DataFrame(
                columns=["user_id", "start_us", "end_us", "n_events", "total_value"]
            )
        elif len(frames) == 1:
            yield frames[0]
        else:
            yield pd.concat(frames, ignore_index=True)

    return events.groupBy(key_col).applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
