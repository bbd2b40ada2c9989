"""Compile-to-source round trip: the generated standalone script (no engine
import) must produce the same table as PipelineRunner executing the same
flowgroup — the reference's core "the generated code is what executes"
invariant (reference README.md:9-11), restored for the batch surface.
"""

from __future__ import annotations

import pytest

from lakehouse_plumber_spark.codegen import compile_flowgroup
from lakehouse_plumber_spark.parsers import load_flowgroup

FG_SPEC = {
    "pipeline": "gold", "flowgroup": "nation_rollup",
    "actions": [
        {"name": "ld", "type": "load", "target": "v_n",
         "source": {"type": "delta", "table": "nation",
                    "where_clause": ["n_regionkey < 3"]}},
        {"name": "tx", "type": "transform", "transform_type": "sql",
         "source": "v_n", "target": "v_agg",
         "sql": "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n FROM v_n GROUP BY n_regionkey"},
        {"name": "wr", "type": "write", "source": "v_agg",
         "write_target": {"type": "materialized_view", "database": "main.gold",
                          "table": "nations_per_region"}},
    ],
}


def test_compiled_source_matches_engine(spark, runner, testdata, tmp_path):
    fg = load_flowgroup(FG_SPEC)

    # engine execution
    ctx = runner.run(fg)
    engine_rows = sorted(
        tuple(r) for r in ctx.resolve_view("main.gold.nations_per_region").collect()
    )

    # compiled standalone execution
    src = compile_flowgroup(fg)
    assert "import lakehouse_plumber_spark" not in src  # standalone, no engine import
    ns: dict = {}
    exec(compile(src, "<generated>", "exec"), ns)
    written = ns["build"](spark, str(tmp_path / "gen_out"))
    gen_rows = sorted(tuple(r) for r in written["main.gold.nations_per_region"].collect())

    assert engine_rows == gen_rows and len(gen_rows) == 3


def test_streaming_actions_refuse_compilation(spark):
    fg = load_flowgroup(
        {
            "pipeline": "p", "flowgroup": "f",
            "actions": [
                {"name": "ld", "type": "load", "target": "v",
                 "source": {"type": "sql", "sql": "SELECT 1 AS k, 1 AS s"}},
                {"name": "wr", "type": "write", "source": "v",
                 "write_target": {"type": "streaming_table", "database": "m.s",
                                  "table": "t", "mode": "cdc",
                                  "cdc_config": {"keys": ["k"], "sequence_by": "s",
                                                 "scd_type": 1}}},
            ],
        }
    )
    with pytest.raises(NotImplementedError, match="PipelineRunner"):
        compile_flowgroup(fg)
