"""BuildContext: per-run state threaded through operator executors."""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from lakehouse_plumber_spark.models import FlowGroup
from lakehouse_plumber_spark.tables import ParquetTableStore


@dataclass
class BuildContext:
    spark: SparkSession
    store: ParquetTableStore
    flowgroup: FlowGroup
    base_dir: str = "."  # resolves sql_path / module_path / schema_file
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    views: dict[str, DataFrame] = field(default_factory=dict)
    event_log: list[dict] = field(default_factory=list)
    # (action_name, Observation, fail_expectations) to assert after execution
    pending_checks: list[tuple] = field(default_factory=list)
    # structured DQ test outcomes, published post-run by the test-reporting
    # hook (reference templates/test_reporting/hook.py.j2:1-115)
    test_results: list[dict] = field(default_factory=list)
    # {target: (action_name, max_files, cluster_columns)} — auto-compaction
    # candidates collected during the run, performed by the runner AFTER all
    # actions so no registered DataFrame's file index is invalidated mid-build
    pending_compactions: dict[str, tuple] = field(default_factory=dict)
    conf: dict[str, Any] = field(default_factory=dict)
    # project-level (lhp.yaml) operational_metadata columns, {name: sql_expr}
    # — extend the audit-column vocabulary available to every action
    metadata_columns: dict[str, str] = field(default_factory=dict)
    # project-level (lhp.yaml) test_reporting block — the fallback when the
    # flowgroup declares none; test operators consult it to decide whether
    # collecting full violation counts is worth paying for
    test_reporting_default: Optional[dict] = None

    def resolve_path(self, p: str) -> str:
        if os.path.isabs(p):
            return p
        return os.path.join(self.base_dir, p)

    def register(self, name: str, df: DataFrame) -> None:
        self.views[name] = df
        # expose to spark.sql for sql transforms; streaming dfs register fine.
        # temp views are single-part: 3-part table names get dots folded so
        # SQL can still reference e.g. main.gold.t as main__gold__t
        df.createOrReplaceTempView(name.replace(".", "__"))

    def resolve_view(self, name: str) -> DataFrame:
        if name in self.views:
            return self.views[name]
        if self.store.exists(name):
            return self.store.read(name)
        return self.spark.table(name)

    def log(self, action: str, event: str, **details: Any) -> None:
        self.event_log.append(
            {
                "pipeline": self.flowgroup.pipeline,
                "flowgroup": self.flowgroup.flowgroup,
                "run_id": self.run_id,
                "action": action,
                "event": event,
                "details": details,
            }
        )

    def checkpoint(self, *parts: str) -> str:
        return self.store.checkpoint_dir(self.flowgroup.pipeline, self.flowgroup.flowgroup, *parts)

    def strip_internal(self, df: DataFrame) -> DataFrame:
        """Drop engine-internal __-prefixed columns (e.g. __seq) on read.

        SCD2's __start_at/__end_at are user-facing (reference consumes them in
        gold SQL: Example_Projects/acmi/SQL/gld/revenue_by_region_mv.sql:9-15)
        and are kept.
        """
        keep = {"__start_at", "__end_at"}
        if "__tombstone" in df.columns:
            # CDC tombstones are state, not data — hidden from readers
            df = df.filter(~df["__tombstone"])
        internal = [c for c in df.columns if c.startswith("__") and c not in keep]
        return df.drop(*internal) if internal else df
