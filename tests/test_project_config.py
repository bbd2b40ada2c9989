"""Project-level lhp.yaml support (reference models/_project.py): include
globs scope discovery, operational_metadata declares project-wide audit
columns, test_reporting provides the project default for the post-run hook,
and the sandbox block carries the team rename policy."""

from __future__ import annotations

import json
import os

import pytest
import yaml

from lakehouse_plumber_spark.__main__ import main
from lakehouse_plumber_spark.models import SpecError
from lakehouse_plumber_spark.parsers import (
    discover_flowgroups,
    load_flowgroup,
    load_project_config,
)
from lakehouse_plumber_spark.runner import PipelineRunner
from lakehouse_plumber_spark.tables import ParquetTableStore


def _fg_yaml(pipeline, flowgroup, table):
    return yaml.safe_dump({
        "pipeline": pipeline, "flowgroup": flowgroup,
        "actions": [
            {"name": "ld", "type": "load",
             "source": {"type": "sql", "sql": "SELECT 1 AS id"}, "target": "v"},
            {"name": "wr", "type": "write", "source": "v",
             "write_target": {"type": "materialized_view", "catalog": "m",
                              "schema": "s", "table": table}},
        ],
    })


def test_include_globs_scope_discovery(tmp_path):
    proj = tmp_path / "proj"
    (proj / "pipelines" / "one").mkdir(parents=True)
    (proj / "pipelines" / "two").mkdir(parents=True)
    (proj / "pipelines" / "one" / "a.yaml").write_text(_fg_yaml("one", "a", "t1"))
    (proj / "pipelines" / "two" / "b.yaml").write_text(_fg_yaml("two", "b", "t2"))
    (proj / "lhp.yaml").write_text(yaml.safe_dump(
        {"name": "p", "include": ["one/**"]}
    ))
    fgs = discover_flowgroups(str(proj))
    assert [(f.pipeline, f.flowgroup) for f in fgs] == [("one", "a")]
    # an explicit include argument overrides the project's
    fgs = discover_flowgroups(str(proj), include=["pipelines/**/*.yaml"])
    assert len(fgs) == 2


def test_project_metadata_columns_applied(spark, tmp_path):
    (tmp_path / "lhp.yaml").write_text(yaml.safe_dump({
        "name": "p",
        "operational_metadata": {"columns": {
            "_env_tag": {"expression": "F.lit('prod')",
                         "description": "fixed env tag"},
            "_id_doubled": {"expression": "id * 2"},
        }},
    }))
    project = load_project_config(str(tmp_path))
    assert project.metadata_columns() == {
        "_env_tag": "'prod'", "_id_doubled": "id * 2"
    }
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
    runner = PipelineRunner(spark, store=store, project_config=project)
    fg = load_flowgroup({
        "pipeline": "p", "flowgroup": "f",
        "actions": [
            {"name": "ld", "type": "load",
             "operational_metadata": ["_env_tag", "_id_doubled"],
             "source": {"type": "sql", "sql": "SELECT 21 AS id"}, "target": "v"},
            {"name": "wr", "type": "write", "source": "v",
             "write_target": {"type": "materialized_view", "catalog": "m",
                              "schema": "s", "table": "t"}},
        ],
    })
    row = runner.run(fg).resolve_view("m.s.t").collect()[0]
    assert row._env_tag == "prod" and row._id_doubled == 42


def test_project_expression_translation_and_refusal():
    from lakehouse_plumber_spark.metadata import project_expression

    assert project_expression("F.col('_metadata.file_path')") == "_metadata.file_path"
    assert project_expression("F.current_timestamp()") == "current_timestamp()"
    assert project_expression("upper(name)") == "upper(name)"
    with pytest.raises(SpecError, match="unsupported"):
        project_expression("F.xxhash64(*[F.col(c) for c in df.columns])")


def test_project_test_reporting_fallback(spark, tmp_path, monkeypatch):
    (tmp_path / "provider.py").write_text(
        "import json\n"
        "def publish_results(results, config, context, spark):\n"
        "    open(config['out'], 'w').write(json.dumps(results))\n"
    )
    out = str(tmp_path / "results.json")
    (tmp_path / "lhp.yaml").write_text(yaml.safe_dump({
        "name": "p",
        "test_reporting": {"module_path": "provider.py",
                           "function_name": "publish_results",
                           "config": {"out": out}},
    }))
    project = load_project_config(str(tmp_path))
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
    runner = PipelineRunner(spark, store=store, base_dir=str(tmp_path),
                            project_config=project)
    fg = load_flowgroup({
        "pipeline": "p", "flowgroup": "f",  # NOTE: no flowgroup-level block
        "actions": [
            {"name": "lda", "type": "load",
             "source": {"type": "sql", "sql": "SELECT 1 AS x"}, "target": "v_a"},
            {"name": "ldb", "type": "load",
             "source": {"type": "sql", "sql": "SELECT 2 AS x"}, "target": "v_b"},
            {"name": "t", "type": "test", "test_type": "row_count",
             "on_violation": "warn",
             "source": {"source": "v_a", "target": "v_b", "tolerance": 5},
             "target": "t_out"},
        ],
    })
    runner.run(fg)
    results = json.loads(open(out).read())
    assert results and results[0]["test_id"] == "t" and results[0]["status"] == "PASS"


def test_sandbox_policy_from_lhp_yaml(tmp_path, capsys):
    proj = tmp_path / "proj"
    (proj / "pipelines").mkdir(parents=True)
    (proj / "pipelines" / "a.yaml").write_text(_fg_yaml("a", "w", "t"))
    (proj / "lhp.yaml").write_text(yaml.safe_dump({
        "name": "p",
        "sandbox": {"table_pattern": "dev_{namespace}_{table}",
                    "allowed_envs": ["dev"]},
    }))
    (proj / "substitutions").mkdir()
    (proj / "substitutions" / "dev.yaml").write_text("dev: {}\n")
    (proj / "substitutions" / "prod.yaml").write_text("prod: {}\n")
    # team pattern applies
    rc = main(["jobs", str(proj), "--env", "dev", "--sandbox", "alice",
               "--format", "json"])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0  # grouping unchanged; the rename shows in compile below
    rc = main(["compile", str(proj), "--env", "dev", "--sandbox", "alice",
               "-o", str(tmp_path / "gen")])
    capsys.readouterr()
    assert rc == 0
    src = (tmp_path / "gen" / "a__w.py").read_text()
    assert "dev_alice_t" in src
    # disallowed env refuses the sandbox run
    with pytest.raises(SystemExit, match="allowed_envs"):
        main(["compile", str(proj), "--env", "prod", "--sandbox", "alice",
              "-o", str(tmp_path / "gen2")])


def test_cli_run_persists_event_log_table(spark, tmp_path, capsys):
    proj = tmp_path / "proj"
    (proj / "pipelines").mkdir(parents=True)
    (proj / "pipelines" / "a.yaml").write_text(_fg_yaml("a", "w", "t"))
    (proj / "lhp.yaml").write_text(yaml.safe_dump({
        "name": "myproj",
        "event_log": {"catalog": "main", "schema": "_meta"},
    }))
    rc = main(["run", str(proj)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "event log persisted to main._meta.myproj_event_log" in out
