"""Monitoring: event logs persist per store and union across pipelines."""

from __future__ import annotations

from lakehouse_plumber_spark.monitoring import persist_event_log, union_event_logs
from lakehouse_plumber_spark.parsers import load_flowgroup
from lakehouse_plumber_spark.runner import PipelineRunner
from lakehouse_plumber_spark.tables import ParquetTableStore


def _mini_fg(n):
    return load_flowgroup(
        {
            "pipeline": f"p{n}", "flowgroup": f"fg{n}",
            "actions": [
                {"name": "ld", "type": "load", "target": "v",
                 "source": {"type": "sql", "sql": f"SELECT {n} AS x"}},
                {"name": "wr", "type": "write", "source": "v",
                 "write_target": {"type": "materialized_view", "database": "m.s",
                                  "table": f"t{n}"}},
            ],
        }
    )


def test_persist_and_union(spark, tmp_path):
    runners = []
    for n in (1, 2):
        store = ParquetTableStore(spark=spark, root=str(tmp_path / f"wh{n}"))
        r = PipelineRunner(spark, store=store)
        r.run(_mini_fg(n))
        assert len(r.event_log) > 0
        persist_event_log(r)
        assert r.event_log == []  # drained
        runners.append(r)

    alllogs = union_event_logs(spark, [r.store for r in runners])
    rows = alllogs.select("pipeline", "event").collect()
    assert {r["pipeline"] for r in rows} == {"p1", "p2"}
    assert any(r["event"] == "mv_refreshed" for r in rows)


def test_union_empty(spark, tmp_path):
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "empty"))
    df = union_event_logs(spark, [store])
    assert df.count() == 0
