"""Test-reporting hook: DQ test outcomes reach pluggable reporters
(reference templates/test_reporting/hook.py.j2 + providers/delta_test_reporter.py)."""

from __future__ import annotations

import pytest

from lakehouse_plumber_spark.operators.tests import DataQualityTestFailed
from lakehouse_plumber_spark.parsers import load_flowgroup
from lakehouse_plumber_spark.runner import PipelineRunner
from lakehouse_plumber_spark.tables import ParquetTableStore


def _fg(on_violation, reporting):
    return load_flowgroup(
        {
            "pipeline": "p", "flowgroup": "fg",
            "test_reporting": reporting,
            "actions": [
                {"name": "ld", "type": "load", "target": "v_src",
                 "source": {"type": "sql",
                            "sql": "SELECT * FROM (VALUES (1), (2), (3)) AS t(id)"}},
                {"name": "ld2", "type": "load", "target": "v_tgt",
                 "source": {"type": "sql",
                            "sql": "SELECT * FROM (VALUES (1), (2)) AS t(id)"}},
                # fails: counts differ by 1 > tolerance 0
                {"name": "t_rowcount", "type": "test", "test_type": "row_count",
                 "on_violation": on_violation,
                 "source": {"source": "v_src", "target": "v_tgt", "tolerance": 0}},
                # passes
                {"name": "t_unique", "type": "test", "test_type": "uniqueness",
                 "on_violation": on_violation,
                 "source": {"source": "v_src", "columns": ["id"]}},
            ],
        }
    )


def _mk_runner(spark, tmp_path, sub):
    return PipelineRunner(spark, store=ParquetTableStore(spark=spark, root=str(tmp_path / sub)))


class TestReportingHook:
    def test_builtin_store_reporter_captures_failed_row_count(self, spark, tmp_path):
        runner = _mk_runner(spark, tmp_path, "wh1")
        runner.run(_fg("warn", {"config": {"result_table": "audit.results"}}))
        got = runner.store.read("audit.results")
        rows = {r["test_id"]: r for r in got.collect()}
        assert rows["t_rowcount"]["status"] == "FAIL"
        assert rows["t_rowcount"]["failed_records"] == 1
        assert rows["t_rowcount"]["expectation_name"] == "row_count"
        assert rows["t_unique"]["status"] == "PASS"
        assert rows["t_rowcount"]["terminal_state"] == "COMPLETED"

    def test_publishes_on_failed_run_with_terminal_state(self, spark, tmp_path):
        runner = _mk_runner(spark, tmp_path, "wh2")
        with pytest.raises(DataQualityTestFailed):
            runner.run(_fg("fail", {"config": {"result_table": "audit.results"}}))
        got = runner.store.read("audit.results").collect()
        # the failing test's result is published before the raise aborts the run
        assert {r["test_id"] for r in got} == {"t_rowcount"}
        assert got[0]["terminal_state"] == "FAILED"

    def test_custom_callable_provider(self, spark, tmp_path):
        seen = {}

        def my_reporter(results, config, context, spark):
            seen["results"] = results
            seen["config"] = config
            seen["context"] = context
            return {"published": len(results), "failed": 0}

        runner = _mk_runner(spark, tmp_path, "wh3")
        runner.run(_fg("warn", {"callable_fn": my_reporter, "config": {"k": "v"}}))
        assert {r["test_id"] for r in seen["results"]} == {"t_rowcount", "t_unique"}
        assert seen["config"] == {"k": "v"}
        assert seen["context"]["pipeline_name"] == "p"
        assert seen["context"]["terminal_state"] == "COMPLETED"

    def test_broken_provider_is_contained(self, spark, tmp_path):
        def broken(results, config, context, spark):
            raise RuntimeError("boom")

        runner = _mk_runner(spark, tmp_path, "wh4")
        ctx = runner.run(_fg("warn", {"callable_fn": broken}))
        events = [e for e in ctx.event_log if e["event"] == "publish_failed"]
        assert len(events) == 1 and "boom" in events[0]["details"]["error"]

    def test_module_path_provider(self, spark, tmp_path):
        provider = tmp_path / "my_provider.py"
        provider.write_text(
            "def publish_results(results, config, context, spark):\n"
            "    context['store'].append(\n"
            "        config['result_table'],\n"
            "        spark.createDataFrame([(r['test_id'], r['status']) for r in results],\n"
            "                              'test_id string, status string'))\n"
            "    return {'published': len(results), 'failed': 0}\n"
        )
        runner = _mk_runner(spark, tmp_path, "wh5")
        runner.base_dir = str(tmp_path)
        runner.run(_fg("warn", {"module_path": "my_provider.py",
                                "config": {"result_table": "audit.ext"}}))
        got = runner.store.read("audit.ext").collect()
        assert {(r["test_id"], r["status"]) for r in got} == {
            ("t_rowcount", "FAIL"), ("t_unique", "PASS")}

    def test_no_reporting_config_keeps_cheap_gate(self, spark, tmp_path):
        runner = _mk_runner(spark, tmp_path, "wh6")
        ctx = runner.run(_fg("warn", None))
        assert ctx.test_results == []

    def test_unresolvable_provider_is_contained(self, spark, tmp_path):
        """A bad module_path / function_name is a broken reporter: it must be
        logged as publish_failed, not raised out of the hook (ADVICE r3)."""
        runner = _mk_runner(spark, tmp_path, "wh7")
        ctx = runner.run(_fg("warn", {"module_path": "does/not/exist.py"}))
        events = [e for e in ctx.event_log if e["event"] == "publish_failed"]
        assert len(events) == 1

    def test_unresolvable_provider_does_not_mask_pipeline_failure(self, spark, tmp_path):
        """On the FAILED path the original test failure must surface, not an
        ImportError from the reporter resolution."""
        runner = _mk_runner(spark, tmp_path, "wh8")
        with pytest.raises(DataQualityTestFailed):
            runner.run(_fg("fail", {"module_path": "does/not/exist.py"}))
