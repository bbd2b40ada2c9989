"""Spec-layer tests (no Spark): presets deep-merge chain, Jinja template
expansion, %{var}/${token}/${secret:...} substitution, expectation-format
aliases, and action-graph validation — the reference's compiler-test surface
(SURVEY §5) mapped onto the executing engine.
"""

from __future__ import annotations

import os

import pytest
import yaml

from lakehouse_plumber_spark.dag import CycleError
from lakehouse_plumber_spark.expectations import parse_expectations
from lakehouse_plumber_spark.parsers import deep_merge, load_flowgroup, load_flowgroup_file
from lakehouse_plumber_spark.substitution import UnresolvedTokenError, substitute

BASE_ACTIONS = [
    {"name": "ld", "type": "load", "source": {"type": "sql", "sql": "SELECT 1"},
     "target": "v_a"},
    {"name": "wr", "type": "write", "source": "v_a",
     "write_target": {"type": "materialized_view", "database": "m.s", "table": "t"}},
]


class TestSubstitution:
    def test_tokens_variables_secrets(self, monkeypatch):
        monkeypatch.setenv("LHP_SECRET_KAFKA_PASSWORD", "s3cr3t")
        spec = {
            "path": "/data/${env}/in",
            "local": "%{prefix}_table",
            "pw": "${secret:kafka/password}",
            "nested": {"keep": 1, "deep": ["${env}"]},
        }
        out = substitute(spec, tokens={"env": "dev"}, variables={"prefix": "raw"})
        assert out["path"] == "/data/dev/in"
        assert out["local"] == "raw_table"
        assert out["pw"] == "s3cr3t"
        assert out["nested"]["deep"] == ["dev"]

    def test_unresolved_token_raises(self):
        with pytest.raises(UnresolvedTokenError):
            substitute({"p": "${missing}"}, tokens={}, variables={})


class TestPresetsTemplates:
    def test_deep_merge_scalars_lists_dicts(self):
        base = {"a": {"x": 1, "y": 2}, "lst": [1, 2], "s": "base"}
        over = {"a": {"y": 3}, "lst": [9], "s": "win"}
        m = deep_merge(base, over)
        assert m == {"a": {"x": 1, "y": 3}, "lst": [9], "s": "win"}

    def test_preset_chain_with_extends(self, tmp_path):
        (tmp_path / "presets").mkdir()
        (tmp_path / "presets" / "base.yaml").write_text(
            yaml.safe_dump({"defaults": {"variables": {"tier": "bronze", "fmt": "json"}}})
        )
        (tmp_path / "presets" / "gold.yaml").write_text(
            yaml.safe_dump({"extends": "base", "defaults": {"variables": {"tier": "gold"}}})
        )
        fg = load_flowgroup(
            {"pipeline": "p", "flowgroup": "f", "presets": ["gold"],
             "actions": BASE_ACTIONS},
            presets_dir=str(tmp_path / "presets"),
        )
        # gold overrides tier, inherits fmt from base
        assert fg.variables["tier"] == "gold" and fg.variables["fmt"] == "json"

    def test_template_expansion_with_parameters(self, tmp_path):
        (tmp_path / "templates").mkdir()
        (tmp_path / "templates" / "ingest.yaml").write_text(
            """
pipeline: "{{ pipe }}"
flowgroup: "{{ table }}_ingest"
actions:
  - name: ld
    type: load
    source: {type: sql, sql: "SELECT * FROM {{ table }}"}
    target: v_raw
  - name: wr
    type: write
    source: v_raw
    write_target: {type: materialized_view, database: m.s, table: "{{ table }}_mv"}
"""
        )
        fg = load_flowgroup(
            {"use_template": "ingest", "template_parameters": {"pipe": "bronze", "table": "nation"}},
            templates_dir=str(tmp_path / "templates"),
        )
        assert fg.flowgroup == "nation_ingest"
        assert fg.actions[0].source["sql"] == "SELECT * FROM nation"
        assert fg.actions[1].write_target.table == "nation_mv"

    def test_file_loader_finds_sibling_dirs(self, tmp_path):
        (tmp_path / "presets").mkdir()
        (tmp_path / "presets" / "std.yaml").write_text(
            yaml.safe_dump({"defaults": {"variables": {"who": "std"}}})
        )
        (tmp_path / "pipelines").mkdir()
        fgf = tmp_path / "pipelines" / "fg.yaml"
        fgf.write_text(
            yaml.safe_dump({"pipeline": "p", "flowgroup": "f", "presets": ["std"],
                            "actions": BASE_ACTIONS})
        )
        fg = load_flowgroup_file(str(fgf))
        assert fg.variables["who"] == "std"


class TestGraphValidation:
    def test_cycle_detected(self):
        actions = [
            {"name": "a", "type": "transform", "transform_type": "sql",
             "source": "v_b", "sql": "SELECT * FROM v_b", "target": "v_a"},
            {"name": "b", "type": "transform", "transform_type": "sql",
             "source": "v_a", "sql": "SELECT * FROM v_a", "target": "v_b"},
            {"name": "wr", "type": "write", "source": "v_a",
             "write_target": {"type": "materialized_view", "database": "m.s", "table": "t"}},
        ]
        with pytest.raises(CycleError):
            load_flowgroup({"pipeline": "p", "flowgroup": "f", "actions": actions})


class TestExpectationFormats:
    def test_reference_aliases(self):
        exps = parse_expectations(
            [
                {"name": "a", "constraint": "x > 0", "failureAction": "drop"},
                {"message": "b", "expression": "y IS NOT NULL", "type": "expect_or_fail"},
                {"expression": "z < 9"},
            ]
        )
        assert [(e.name, e.constraint, e.action) for e in exps] == [
            ("a", "x > 0", "drop"),
            ("b", "y IS NOT NULL", "fail"),
            ("z < 9", "z < 9", "warn"),
        ]

    def test_dict_forms(self):
        native = parse_expectations({"pk_set": {"constraint": "id IS NOT NULL", "action": "fail"}})
        assert native[0].name == "pk_set" and native[0].action == "fail"
        refstyle = parse_expectations({"id > 0": {"name": "positive", "failureAction": "drop"}})
        assert refstyle[0].constraint == "id > 0"
        assert refstyle[0].name == "positive" and refstyle[0].action == "drop"
