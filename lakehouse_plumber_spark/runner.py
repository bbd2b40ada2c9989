"""PipelineRunner: execute a FlowGroup (or many) against a SparkSession.

The engine's equivalent of the DLT runtime the reference compiles for:
topo-sorts the action DAG (dag.py ≙ reference dependency_resolver), executes
each action via the operator registry, tracks named views, enforces
expectations, and emits an event log (≙ DLT event log flow_progress rows).

Cross-pipeline orchestration (reference `lhp deps` / job stages,
src/lhp/core/jobs/job_generator.py:60-108) is `run_many`: flowgroups are
staged by table-level dependencies and executed stage by stage.
"""

from __future__ import annotations

import sys
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from lakehouse_plumber_spark.context import BuildContext
from lakehouse_plumber_spark.dag import topo_sort, validate_flowgroup_graph
from lakehouse_plumber_spark.expectations import check_failures
from lakehouse_plumber_spark.models import FlowGroup
from lakehouse_plumber_spark.operators import REGISTRY
from lakehouse_plumber_spark.tables import ParquetTableStore, new_store


class PipelineRunner:
    def __init__(
        self,
        spark: SparkSession,
        store: Optional[ParquetTableStore] = None,
        base_dir: str = ".",
        project_config=None,
    ):
        self.spark = spark
        self.store = store or new_store(spark)
        self.base_dir = base_dir
        self.event_log: list[dict] = []
        # lhp.yaml project config (models.ProjectConfig): supplies the
        # project-wide audit-column vocabulary and the test_reporting
        # default a flowgroup without its own block falls back to
        self.project_config = project_config
        self.metadata_columns: dict = (
            project_config.metadata_columns() if project_config is not None else {}
        )

    def run(
        self,
        fg: FlowGroup,
        conf: Optional[dict] = None,
        defer_compactions: bool = False,
    ) -> BuildContext:
        """Execute one flowgroup; returns the BuildContext with views/event log."""
        validate_flowgroup_graph(fg.actions)
        ctx = BuildContext(
            spark=self.spark,
            store=self.store,
            flowgroup=fg,
            base_dir=self.base_dir,
            conf=conf or {},
            metadata_columns=self.metadata_columns,
            test_reporting_default=(
                self.project_config.test_reporting if self.project_config else None
            ),
        )
        from lakehouse_plumber_spark.reporting import publish_test_results

        try:
            for action in topo_sort(fg.actions):
                t0 = time.time()
                key = (action.type.value, action.sub_type)
                executor = REGISTRY.get(key)
                if executor is None:
                    raise ValueError(f"no operator registered for {key}")
                df = executor(ctx, action)
                if df is not None and action.target:
                    ctx.register(action.target, df)
                ctx.log(action.name, "action_completed", seconds=round(time.time() - t0, 3))

            # batch fail-expectation enforcement: force pending observed plans
            for name, obs, fail_exps in ctx.pending_checks:
                # observation requires the plan to have executed; writes usually did.
                metrics = check_failures(obs, fail_exps)
                ctx.log(name, "expectations_checked", **{k: v for k, v in metrics.items()})

            # auto-compaction deferred to after ALL actions: compacting
            # mid-run would delete the files behind already-registered
            # DataFrames (operators/write.py:run_pending_compactions).
            # run_many defers to its own between-stages point instead, where
            # sibling writers have finished and no reader has started.
            if ctx.pending_compactions and not defer_compactions:
                from lakehouse_plumber_spark.operators.write import run_pending_compactions

                run_pending_compactions([ctx])
        except BaseException:
            # the reference hook publishes at EVERY terminal state incl.
            # FAILED (hook.py.j2:36-44) — collected results must survive a
            # failing test action
            publish_test_results(ctx, "FAILED", reporting_cfg=self._reporting_cfg(fg))
            self.event_log.extend(ctx.event_log)
            raise
        publish_test_results(ctx, "COMPLETED", reporting_cfg=self._reporting_cfg(fg))
        self.event_log.extend(ctx.event_log)
        return ctx

    def backfill(
        self,
        fg: FlowGroup,
        partition_col: str,
        values: list,
        conf: Optional[dict] = None,
    ) -> BuildContext:
        """Partition-scoped re-run ("backfill these days"): execute the
        flowgroup, but every materialized_view write whose target is
        partitioned on `partition_col` is restricted to `values` and
        committed via dynamic partition overwrite — untouched partitions
        keep their files, so a backfill costs O(affected partitions), not
        O(table), and re-running it is idempotent (same values -> same
        files).  Because the restriction is applied as a filter on the MV
        output, Catalyst pushes it through the plan and the SOURCE scans
        prune too.  Writes not partitioned on `partition_col` run
        unchanged (full refresh) — backfill scoping is only sound where
        the partition boundary exists.
        """
        if not values:
            raise ValueError("backfill needs at least one partition value")
        c = dict(conf or {})
        c["__backfill__"] = (partition_col, list(values))
        return self.run(fg, conf=c)

    def _reporting_cfg(self, fg: FlowGroup):
        """Flowgroup test_reporting block, falling back to the project's."""
        if fg.test_reporting is not None:
            return fg.test_reporting
        return self.project_config.test_reporting if self.project_config else None

    def run_many(
        self,
        flowgroups: list[FlowGroup],
        conf: Optional[dict] = None,
    ) -> list[BuildContext]:
        """Run multiple flowgroups in dependency-stage order.

        Stage graph: a flowgroup depends on another when it reads a table the
        other writes (reference DependencyAnalysisService semantics, driven
        here by write-target/view names plus SQL/python ref extraction).
        `conf` is passed to every flowgroup's run (the CLI's --backfill
        rides here).
        """
        # one shared edge-builder AND stage computation with the CLI's
        # dag/deps/jobs commands (dag.cross_flowgroup_deps +
        # dag.execution_stages) — scheduling, reporting, and the exported
        # job plan must agree
        from lakehouse_plumber_spark.dag import cross_flowgroup_deps, execution_stages

        deps, warnings = cross_flowgroup_deps(flowgroups, self.base_dir)
        for w in warnings:
            print(w, file=sys.stderr)

        out: list[BuildContext] = [None] * len(flowgroups)  # type: ignore[list-item]
        for stage in execution_stages(deps, len(flowgroups)):
            for i in stage:
                out[i] = self.run(flowgroups[i], conf=conf, defer_compactions=True)
            # compact BETWEEN stages, not per-flowgroup and not after
            # everything. Per-flowgroup would delete the files behind a
            # SIBLING context's registered DataFrame (file indexes are
            # captured at read() time). Fully-global would leave later-stage
            # READERS (a load of the table into a differently-named view)
            # holding pre-compaction listings. Stage ordering guarantees
            # every reader of a table runs in a stage after its writers, so
            # the safe point is: after the writing stage, before the next
            # stage starts. All finished contexts get their target reads
            # refreshed; completed stages keep their compactions even if a
            # later stage fails.
            finished = [c for c in out if c is not None]
            if any(c.pending_compactions for c in finished):
                from lakehouse_plumber_spark.operators.write import run_pending_compactions

                # run() already flushed each context's event log into the
                # runner's — forward post-flush compaction events explicitly
                run_pending_compactions(finished, forward_log=self.event_log.append)
        return out

    def event_log_df(self) -> DataFrame:
        import json

        rows = [
            (
                e["pipeline"], e["flowgroup"], e["run_id"], e["action"], e["event"],
                json.dumps(e.get("details", {}), default=str),
            )
            for e in self.event_log
        ]
        return self.spark.createDataFrame(
            rows, "pipeline string, flowgroup string, run_id string, action string, event string, details string"
        )
