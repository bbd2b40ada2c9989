"""Delta-load time travel (versionAsOf/timestampAsOf), reconstructed from the
CDF emulation for append-only tables (native .option on a Delta store)."""

from __future__ import annotations

import pytest

from lakehouse_plumber_spark.parsers import load_flowgroup


def _append(runner, pred, n):
    fg = load_flowgroup(
        {
            "pipeline": "p", "flowgroup": f"ap{n}",
            "actions": [
                {"name": "ld", "type": "load", "target": "v",
                 "source": {"type": "sql",
                            "sql": f"SELECT n_nationkey, n_name FROM nation WHERE {pred}"}},
                {"name": "wr", "type": "write", "source": "v",
                 "write_target": {"type": "streaming_table", "database": "m.s",
                                  "table": "nat_hist",
                                  "table_properties": {"delta.enableChangeDataFeed": "true"}}},
            ],
        }
    )
    runner.run(fg)


def _read_version(runner, v):
    fg = load_flowgroup(
        {
            "pipeline": "p", "flowgroup": f"rd{v}",
            "actions": [
                {"name": "ld", "type": "load", "target": "v_t",
                 "source": {"type": "delta", "database": "m.s", "table": "nat_hist",
                            "options": {"versionAsOf": v}}},
                {"name": "wr", "type": "write", "source": "v_t",
                 "write_target": {"type": "materialized_view", "database": "m.s",
                                  "table": f"tt{v}"}},
            ],
        }
    )
    return runner.run(fg).resolve_view(f"m.s.tt{v}")


def test_version_as_of(spark, runner, testdata):
    _append(runner, "n_nationkey < 10", 1)
    _append(runner, "n_nationkey >= 10", 2)
    assert _read_version(runner, 0).count() == 10
    assert _read_version(runner, 1).count() == 25


def test_time_travel_requires_cdf(spark, runner, testdata):
    fg = load_flowgroup(
        {
            "pipeline": "p", "flowgroup": "nocdf",
            "actions": [
                {"name": "ld", "type": "load", "target": "v",
                 "source": {"type": "sql", "sql": "SELECT 1 AS x"}},
                {"name": "wr", "type": "write", "source": "v",
                 "write_target": {"type": "materialized_view", "database": "m.s",
                                  "table": "plain"}},
            ],
        }
    )
    runner.run(fg)
    rd = load_flowgroup(
        {
            "pipeline": "p", "flowgroup": "rdfail",
            "actions": [
                {"name": "ld", "type": "load", "target": "v_t",
                 "source": {"type": "delta", "database": "m.s", "table": "plain",
                            "options": {"versionAsOf": 0}}},
                {"name": "wr", "type": "write", "source": "v_t",
                 "write_target": {"type": "materialized_view", "database": "m.s",
                                  "table": "ttf"}},
            ],
        }
    )
    with pytest.raises(ValueError, match="time travel"):
        runner.run(rd)
