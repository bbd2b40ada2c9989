"""Monitoring: persist and union pipeline event logs.

Reference ships a generated monitoring notebook that unions N pipelines'
DLT event logs into one Delta table, one independently-checkpointed stream
per source with mergeSchema (src/lhp/templates/monitoring/union_event_logs
.py.j2:1-60). In the executing engine the event log is first-party data:
each PipelineRunner accumulates rows; `persist_event_log` appends them to a
store table and `union_event_logs` reads N such tables (schema-merged) into
one frame for dashboards/alerting.

Scale: event logs are append-only and tiny relative to data; the union is a
`mergeSchema` parquet read over table paths — no shuffle until the consumer
aggregates.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_plumber_spark.runner import PipelineRunner
from lakehouse_plumber_spark.tables import ParquetTableStore

EVENT_LOG_TABLE = "_monitoring._all.event_log"


def persist_event_log(runner: PipelineRunner, table: str = EVENT_LOG_TABLE) -> str:
    """Append the runner's accumulated events to a store table; returns the
    table name. Idempotent per call-batch (events are drained after write)."""
    df = runner.event_log_df().withColumn("_logged_at", F.current_timestamp())
    runner.store.append(table, df)
    runner.event_log.clear()
    return table


def union_event_logs(
    spark: SparkSession, stores: Iterable[ParquetTableStore], table: str = EVENT_LOG_TABLE
) -> DataFrame:
    """One frame over every pipeline's event log (mergeSchema handles logs
    written by different engine versions)."""
    paths = [s.path(table) for s in stores if s.exists(table)]
    if not paths:
        return spark.createDataFrame(
            [],
            "pipeline string, flowgroup string, run_id string, action string, "
            "event string, details string, _logged_at timestamp",
        )
    return spark.read.option("mergeSchema", "true").parquet(*paths)
