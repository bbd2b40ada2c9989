"""AUTO CDC apply-changes: SCD type 1 and 2, plus snapshot CDC.

Re-implements the semantics of DLT's `create_auto_cdc_flow` /
`create_auto_cdc_from_snapshot_flow` (reference emits them at
src/lhp/templates/write/streaming_table.py.j2:45,114; config validator
src/lhp/core/validators/compatibility/cdc_config.py:36-76) as pure DataFrame
algebra — no applyInPandas, no driver loops, so the same plan runs on a
1000-executor cluster.

Core idea: everything is an *event stream rebuild over affected keys only*.

    events(key, seq, data..., __is_delete)
      -> per-key ordering by (seq, tiebreak)
      -> ignore_null_updates forward-fill (last non-null over window)
      -> change-run collapse on tracked columns (lag + cumulative sum)
      -> SCD2 intervals via run aggregation + lead(start)
      -> SCD1 = keep only the last run per key

Incrementality: a batch touches only its own keys. Current target rows for
those keys are decomposed back into events (each SCD2 version is an event at
its __start_at; a closed final version implies a delete event at its
__end_at), unioned with the new batch, and rebuilt. Untouched keys are
passed through via anti-join. With Delta this maps to MERGE; the compute is
bounded by (batch keys x their history), which shuffles only on the CDC keys —
the partitioning any cluster-scale merge needs anyway.

Out-of-order tolerance is merge-on-max-sequence, not watermark (reference
streaming_table.py.j2:50-55): late events slot into history deterministically
because the rebuild sorts by sequence, and re-delivered (key, seq) duplicates
dedup preferring the newest batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_plumber_spark.models import CDCConfig, SnapshotCDCConfig
from lakehouse_plumber_spark.tables import ParquetTableStore

START_COL = "__start_at"
END_COL = "__end_at"
_DEL = "__is_delete"
_TRUNC = "__is_truncate"
_PRIO = "__batch_priority"


def _seq_cols(cfg: CDCConfig) -> list[str]:
    return cfg.sequence_cols


def _data_columns(df_cols: list[str], cfg: CDCConfig) -> list[str]:
    """Columns stored in the target (column_list/except_column_list semantics)."""
    internal = {_DEL, _TRUNC, _PRIO, START_COL, END_COL}
    cols = [c for c in df_cols if c not in internal]
    if cfg.column_list:
        cols = [c for c in cols if c in set(cfg.column_list) | set(cfg.keys) | set(_seq_cols(cfg))]
    elif cfg.except_column_list:
        drop = set(cfg.except_column_list) - set(cfg.keys)
        cols = [c for c in cols if c not in drop]
    return cols


def _tracked_columns(data_cols: list[str], cfg: CDCConfig) -> list[str]:
    """SCD2: which column changes open a new history version."""
    non_key = [c for c in data_cols if c not in cfg.keys and c not in _seq_cols(cfg)]
    if cfg.track_history_column_list:
        return [c for c in non_key if c in cfg.track_history_column_list]
    if cfg.track_history_except_column_list:
        return [c for c in non_key if c not in cfg.track_history_except_column_list]
    return non_key


def _normalize_events(batch: DataFrame, cfg: CDCConfig) -> DataFrame:
    """Tag delete/truncate events and drop exact (key, seq) duplicates."""
    df = batch
    df = df.withColumn(
        _DEL,
        F.coalesce(F.expr(cfg.apply_as_deletes), F.lit(False)) if cfg.apply_as_deletes else F.lit(False),
    )
    df = df.withColumn(
        _TRUNC,
        F.coalesce(F.expr(cfg.apply_as_truncates), F.lit(False)) if cfg.apply_as_truncates else F.lit(False),
    )
    return df


def _dedup_key_seq(events: DataFrame, cfg: CDCConfig) -> DataFrame:
    """One event per (key, seq): prefer newest batch (_PRIO desc), then delete flags."""
    order = [F.col(_PRIO).desc(), F.col(_DEL).desc()]
    w = Window.partitionBy(*cfg.keys, *_seq_cols(cfg)).orderBy(*order)
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _apply_truncates(events: DataFrame, cfg: CDCConfig) -> DataFrame:
    """apply_as_truncates (SCD1): discard every event strictly older than the
    newest truncate event; truncate events themselves are not emitted."""
    if not cfg.apply_as_truncates:
        return events.drop(_TRUNC)
    seqs = _seq_cols(cfg)
    trunc = events.filter(F.col(_TRUNC)).agg(
        F.max(F.struct(*[F.col(c) for c in seqs])).alias("__t")
    )
    events = events.crossJoin(F.broadcast(trunc))
    keep = F.col("__t").isNull() | (F.struct(*[F.col(c) for c in seqs]) >= F.col("__t"))
    return events.filter(keep & ~F.col(_TRUNC)).drop("__t", _TRUNC)


def _forward_fill_nulls(events: DataFrame, cfg: CDCConfig, data_cols: list[str]) -> DataFrame:
    """ignore_null_updates: null columns in an upsert inherit the previous value."""
    if not cfg.ignore_null_updates:
        return events
    seqs = _seq_cols(cfg)
    w = (
        Window.partitionBy(*cfg.keys)
        .orderBy(*[F.col(c) for c in seqs], F.col(_PRIO))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = [c for c in data_cols if c not in cfg.keys and c not in seqs]
    for c in fill_cols:
        events = events.withColumn(
            c, F.when(F.col(_DEL), F.col(c)).otherwise(F.last(c, ignorenulls=True).over(w))
        )
    return events


def _rebuild_scd2(events: DataFrame, cfg: CDCConfig, data_cols: list[str]) -> DataFrame:
    """Rebuild full SCD2 history for the keys present in `events`."""
    seqs = _seq_cols(cfg)
    tracked = _tracked_columns(data_cols, cfg)
    seq_expr = F.struct(*[F.col(c) for c in seqs]) if len(seqs) > 1 else F.col(seqs[0])

    w = Window.partitionBy(*cfg.keys).orderBy(*[F.col(c) for c in seqs])
    tracked_struct = F.struct(*[F.col(c) for c in tracked]) if tracked else F.lit(0)
    change = (
        (F.row_number().over(w) == 1)
        | (~tracked_struct.eqNullSafe(F.lag(tracked_struct).over(w)))
        | F.col(_DEL)
        | F.coalesce(F.lag(F.col(_DEL)).over(w), F.lit(False))
    )
    events = events.withColumn("__chg", change.cast("int"))
    events = events.withColumn(
        "__run",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    events = events.withColumn("__seq_val", seq_expr)

    # per run: values from the latest event in the run (non-tracked cols update
    # in place), interval start = first seq of the run
    agg = (
        events.groupBy(*cfg.keys, "__run")
        .agg(
            F.min("__seq_val").alias(START_COL),
            F.max_by(
                F.struct(*[F.col(c) for c in data_cols if c not in cfg.keys], F.col(_DEL)),
                F.col("__seq_val"),
            ).alias("__vals"),
        )
        .select(
            *cfg.keys,
            "__run",
            START_COL,
            F.col("__vals").getField(_DEL).alias(_DEL),
            *[F.col("__vals").getField(c).alias(c) for c in data_cols if c not in cfg.keys],
        )
    )
    w2 = Window.partitionBy(*cfg.keys).orderBy(START_COL)
    agg = agg.withColumn(END_COL, F.lead(START_COL).over(w2))
    # delete runs close the predecessor (already via lead) and are not emitted
    out = agg.filter(~F.col(_DEL)).drop(_DEL, "__run")
    return out.select(*data_cols, START_COL, END_COL)


def _rebuild_scd1(events: DataFrame, cfg: CDCConfig, data_cols: list[str]) -> DataFrame:
    """Final state per key = event with max sequence; deletes drop the key.

    The winning event's sequence is retained in hidden `__seq` so later batches
    merge correctly against it (DLT keeps this state internally too)."""
    seqs = _seq_cols(cfg)
    w = Window.partitionBy(*cfg.keys).orderBy(*[F.col(c).desc() for c in seqs], F.col(_PRIO).desc())
    latest = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    out = latest.filter(~F.col(_DEL))
    seq_expr = F.struct(*[F.col(c) for c in seqs]) if len(seqs) > 1 else F.col(seqs[0])
    return out.withColumn("__seq", seq_expr).select(*data_cols, "__seq")


def _target_to_events(current: DataFrame, cfg: CDCConfig, data_cols: list[str], scd_type: int) -> DataFrame:
    """Decompose existing target rows for affected keys back into events."""
    seqs = _seq_cols(cfg)
    if scd_type == 1:
        ev = current
        if len(seqs) > 1:
            for i, c in enumerate(seqs):
                ev = ev.withColumn(c, F.col("__seq").getField(c))
        else:
            ev = ev.withColumn(seqs[0], F.col("__seq"))
        return ev.drop("__seq").withColumn(_DEL, F.lit(False))
    # SCD2: every version is an event at its __start_at; if the key's final
    # (max-start) version is closed, that close was a delete event.
    ev = current
    if len(seqs) > 1:
        for c in seqs:
            ev = ev.withColumn(c, F.col(START_COL).getField(c))
    else:
        ev = ev.withColumn(seqs[0], F.col(START_COL))
    w = Window.partitionBy(*cfg.keys).orderBy(F.col(START_COL).desc())
    ev = ev.withColumn("__rn", F.row_number().over(w))
    upserts = ev.select(*data_cols, F.lit(False).alias(_DEL))
    closers = ev.filter((F.col("__rn") == 1) & F.col(END_COL).isNotNull())
    if len(seqs) > 1:
        for c in seqs:
            closers = closers.withColumn(c, F.col(END_COL).getField(c))
    else:
        closers = closers.withColumn(seqs[0], F.col(END_COL))
    deletes = closers.select(*data_cols, F.lit(True).alias(_DEL))
    return upserts.unionByName(deletes)


def apply_changes(
    store: ParquetTableStore,
    target: str,
    batch: DataFrame,
    cfg: CDCConfig,
    partition_columns: Optional[list[str]] = None,
) -> None:
    """Merge one batch of change events into `target` (SCD1 or SCD2)."""
    data_cols = _data_columns(batch.columns, cfg)
    events = _normalize_events(batch.select(*[c for c in batch.columns]), cfg)
    events = events.withColumn(_PRIO, F.lit(1))
    events = _apply_truncates(events, cfg) if cfg.scd_type == 1 else events.drop(_TRUNC)
    events = events.select(*data_cols, _DEL, _PRIO)

    exists = store.exists(target)
    if exists:
        current = store.read(target)
        keys_df = events.select(*cfg.keys).distinct()
        affected = current.join(keys_df, on=cfg.keys, how="left_semi")
        untouched = current.join(keys_df, on=cfg.keys, how="left_anti")
        cur_events = _target_to_events(affected, cfg, data_cols, cfg.scd_type)
        cur_events = cur_events.withColumn(_PRIO, F.lit(0)).select(*data_cols, _DEL, _PRIO)
        events = events.unionByName(cur_events)
    else:
        untouched = None

    events = _dedup_key_seq(events, cfg)
    events = _forward_fill_nulls(events, cfg, data_cols)
    if cfg.scd_type == 2:
        rebuilt = _rebuild_scd2(events, cfg, data_cols)
    else:
        rebuilt = _rebuild_scd1(events, cfg, data_cols)

    if untouched is not None:
        rebuilt = untouched.select(*rebuilt.columns).unionByName(rebuilt)
    store.overwrite(target, rebuilt, partition_columns=partition_columns)


def apply_snapshot(
    store: ParquetTableStore,
    target: str,
    snapshot: DataFrame,
    version,
    cfg: SnapshotCDCConfig,
) -> None:
    """Derive CDC events from a full snapshot and apply them.

    Insert/update events: every row in the snapshot at seq=version (unchanged
    rows collapse into the previous run during the SCD rebuild, so re-sending
    the full snapshot is safe and idempotent). Delete events: keys open in the
    target but absent from the snapshot.
    """
    track_except = None
    if cfg.track_history_except_column_list:
        track_except = list(cfg.track_history_except_column_list) + ["__snapshot_version"]
    cdc = CDCConfig(
        keys=cfg.keys,
        sequence_by="__snapshot_version",
        scd_type=cfg.stored_as_scd_type,
        apply_as_deletes="__deleted = true",
        except_column_list=["__deleted"],
        track_history_column_list=cfg.track_history_column_list,
        track_history_except_column_list=track_except,
    )
    snap = snapshot.withColumn("__snapshot_version", F.lit(version))
    events = snap.withColumn("__deleted", F.lit(False))
    if store.exists(target):
        current = store.read(target)
        if cfg.stored_as_scd_type == 2:
            current = current.filter(F.col(END_COL).isNull())
        missing = current.join(snapshot.select(*cfg.keys).distinct(), on=cfg.keys, how="left_anti")
        missing = missing.withColumn("__snapshot_version", F.lit(version)).withColumn(
            "__deleted", F.lit(True)
        )
        keep_cols = [c for c in events.columns if c in missing.columns]
        events = events.unionByName(missing.select(*keep_cols), allowMissingColumns=True)
    apply_changes(store, target, events, cdc)
