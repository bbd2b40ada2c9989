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

    def test_template_parameter_defaults_and_required(self, tmp_path):
        """Reference template_engine.py:106,129-155: declared defaults are
        applied when a parameter is omitted; a missing required parameter is
        a clean error, not a raw Jinja undefined failure."""
        (tmp_path / "templates").mkdir()
        (tmp_path / "templates" / "ingest.yaml").write_text(
            """
pipeline: "{{ pipe }}"
flowgroup: "{{ table }}_ingest"
parameters:
  - name: table
    required: true
  - name: pipe
    default: bronze
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
            {"use_template": "ingest", "template_parameters": {"table": "nation"}},
            templates_dir=str(tmp_path / "templates"),
        )
        assert fg.pipeline == "bronze"  # default applied

        with pytest.raises(ValueError, match="missing required.*table"):
            load_flowgroup(
                {"use_template": "ingest", "template_parameters": {"pipe": "x"}},
                templates_dir=str(tmp_path / "templates"),
            )

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


class TestCdcCompatibilityValidators:
    """Reference compatibility/cdc_fanin.py + cdc_schema.py: invalid CDC
    fan-in specs must fail validation, not run."""

    @staticmethod
    def _cdc_write(name, tbl="s.t", create=True, scd=1, keys=("id",), seq="seq", **wt_extra):
        return {
            "name": name, "type": "write", "source": f"v_{name}",
            "write_target": {
                "type": "streaming_table", "database": tbl.rsplit(".", 1)[0],
                "table": tbl.rsplit(".", 1)[1], "create_table": create, "mode": "cdc",
                "cdc_config": {"keys": list(keys), "sequence_by": seq, "scd_type": scd},
                **wt_extra,
            },
        }

    @staticmethod
    def _load(view):
        return {"name": f"ld_{view}", "type": "load", "target": view,
                "source": {"type": "sql", "sql": "SELECT 1 AS id, 1 AS seq"}}

    def _fg(self, actions):
        loads = [self._load(a["source"]) for a in actions if a["type"] == "write"]
        return load_flowgroup({"pipeline": "p", "flowgroup": "f", "actions": loads + actions})

    def test_mode_mix_rejected(self):
        std = {"name": "w_std", "type": "write", "source": "v_w_std",
               "write_target": {"type": "streaming_table", "database": "s",
                                "table": "t", "create_table": False, "mode": "standard"}}
        with pytest.raises(ValueError, match="mixes cdc"):
            self._fg([self._cdc_write("w_cdc", "s.t"), std])

    def test_shared_cdc_field_mismatch_rejected(self):
        with pytest.raises(ValueError, match="sequence_by"):
            self._fg([
                self._cdc_write("w1", "s.t"),
                self._cdc_write("w2", "s.t", create=False, seq="other_seq"),
            ])

    def test_shared_target_field_mismatch_rejected(self):
        with pytest.raises(ValueError, match="partition_columns"):
            self._fg([
                self._cdc_write("w1", "s.t", partition_columns=["id"]),
                self._cdc_write("w2", "s.t", create=False),
            ])

    def test_compatible_fanin_accepted(self):
        fg = self._fg([
            self._cdc_write("w1", "s.t"),
            self._cdc_write("w2", "s.t", create=False),
        ])
        assert len(fg.actions) == 4

    def test_scd2_schema_missing_interval_columns_rejected(self):
        with pytest.raises(ValueError, match="__start_at"):
            self._fg([self._cdc_write(
                "w1", "s.t", scd=2,
                table_schema="id BIGINT, seq BIGINT, v STRING",
            )])

    def test_scd2_schema_with_interval_columns_accepted(self):
        fg = self._fg([self._cdc_write(
            "w1", "s.t", scd=2,
            table_schema="id BIGINT, seq BIGINT, v STRING, __start_at BIGINT, __end_at BIGINT",
        )])
        assert len(fg.actions) == 2


class TestCloudFilesOptionValidation:
    """Reference cloudfiles.py:30-55: unknown cloudFiles.* keys are spec
    errors; known-but-unhonored keys are surfaced, not silently dropped."""

    def test_unknown_option_rejected(self):
        from lakehouse_plumber_spark.operators.load import validate_cloudfiles_options

        with pytest.raises(ValueError, match="maxFilesPerTriger"):
            validate_cloudfiles_options({"cloudFiles.maxFilesPerTriger": "10"}, "a")

    def test_unknown_option_suggests_near_miss(self):
        # reference field-suggestion layer: the typo points at the real key
        from lakehouse_plumber_spark.operators.load import validate_cloudfiles_options

        with pytest.raises(ValueError, match="did you mean cloudFiles.maxFilesPerTrigger"):
            validate_cloudfiles_options({"cloudFiles.maxFilesPerTriger": "10"}, "a")

    def test_known_unhonored_reported_not_dropped(self):
        from lakehouse_plumber_spark.operators.load import validate_cloudfiles_options

        ignored = validate_cloudfiles_options(
            {"cloudFiles.maxFilesPerTrigger": "10", "cloudFiles.useNotifications": "true"}, "a"
        )
        assert ignored == ["cloudFiles.useNotifications"]

    def test_validate_options_escape_hatch(self):
        from lakehouse_plumber_spark.operators.load import validate_cloudfiles_options

        assert validate_cloudfiles_options(
            {"cloudFiles.validateOptions": "false", "cloudFiles.bogus": "1"}, "a"
        ) == []


class TestParseCache:
    """Content-hash parse cache (reference src/lhp/parsers/parse_cache.py):
    same bytes hit, edited bytes miss, corrupt entries fall back."""

    def _proj(self, tmp_path):
        proj = tmp_path / "proj"
        (proj / "pipelines").mkdir(parents=True)
        (proj / "pipelines" / "fg.yaml").write_text(
            "pipeline: p\nflowgroup: f\nactions:\n"
            "  - {name: ld, type: load, target: v,\n"
            "     source: {type: sql, sql: 'SELECT 1 AS x'}}\n"
            "  - name: wr\n    type: write\n    source: v\n"
            "    write_target: {type: materialized_view, catalog: c, schema: s, table: t}\n"
        )
        return proj

    def test_second_discovery_hits_cache(self, tmp_path):
        import os

        from lakehouse_plumber_spark.parsers import discover_flowgroups

        proj = self._proj(tmp_path)
        fgs1 = discover_flowgroups(str(proj))
        cache_dir = proj / ".lhp" / "cache" / "parse"
        entries = [f for f in os.listdir(cache_dir) if f.endswith(".pkl")]
        assert len(entries) == 1
        # poison the yaml file mtime-style edit is irrelevant: same bytes ->
        # same key; discovery must return the identical flowgroup from cache
        fgs2 = discover_flowgroups(str(proj))
        assert fgs1[0].model_dump() == fgs2[0].model_dump()

    def test_edited_file_misses_and_reparses(self, tmp_path):
        import os

        from lakehouse_plumber_spark.parsers import discover_flowgroups

        proj = self._proj(tmp_path)
        discover_flowgroups(str(proj))
        (proj / "pipelines" / "fg.yaml").write_text(
            (proj / "pipelines" / "fg.yaml").read_text().replace(
                "table: t", "table: t2")
        )
        fgs = discover_flowgroups(str(proj))
        assert fgs[0].actions[1].write_target.table == "t2"
        cache_dir = proj / ".lhp" / "cache" / "parse"
        assert len([f for f in os.listdir(cache_dir) if f.endswith(".pkl")]) == 2

    def test_corrupt_entry_falls_back_to_parse(self, tmp_path):
        import os

        from lakehouse_plumber_spark.parsers import discover_flowgroups

        proj = self._proj(tmp_path)
        discover_flowgroups(str(proj))
        cache_dir = proj / ".lhp" / "cache" / "parse"
        entry = next(f for f in os.listdir(cache_dir) if f.endswith(".pkl"))
        (cache_dir / entry).write_bytes(b"not a pickle")
        fgs = discover_flowgroups(str(proj))
        assert fgs[0].actions[1].write_target.table == "t"

    def test_opt_out_env_var(self, tmp_path, monkeypatch):
        import os

        from lakehouse_plumber_spark.parsers import discover_flowgroups

        monkeypatch.setenv("LHP_NO_PARSE_CACHE", "1")
        proj = self._proj(tmp_path)
        discover_flowgroups(str(proj))
        assert not (proj / ".lhp").exists()

    def test_template_defaults_apply_with_unquoted_jinja_scalars(self, tmp_path):
        """The common unquoted `{{ x }}` form breaks a full-file YAML
        pre-parse; declared defaults/required must still be honored via the
        parameters-block extraction, and an undefined parameter must raise a
        clean ValueError, not a raw Jinja traceback."""
        (tmp_path / "templates").mkdir()
        (tmp_path / "templates" / "ingest.yaml").write_text(
            """
pipeline: {{ pipe }}
flowgroup: {{ table }}_ingest
parameters:
  - name: table
    required: true
  - name: pipe
    default: bronze
actions:
  - name: ld
    type: load
    source: {type: sql, sql: "SELECT 1 AS x"}
    target: v_raw
  - name: wr
    type: write
    source: v_raw
    write_target: {type: materialized_view, database: m.s, table: {{ table }}_mv}
"""
        )
        fg = load_flowgroup(
            {"use_template": "ingest", "template_parameters": {"table": "nation"}},
            templates_dir=str(tmp_path / "templates"),
        )
        assert fg.pipeline == "bronze" and fg.flowgroup == "nation_ingest"

        with pytest.raises(ValueError, match="missing required.*table"):
            load_flowgroup(
                {"use_template": "ingest", "template_parameters": {}},
                templates_dir=str(tmp_path / "templates"),
            )

    def test_template_undefined_param_is_clean_error(self, tmp_path):
        (tmp_path / "templates").mkdir()
        # no parameters block at all: StrictUndefined failures must still be
        # surfaced as ValueError so validate reports FAIL, not a traceback
        (tmp_path / "templates" / "t.yaml").write_text(
            "pipeline: p\nflowgroup: {{ oops }}\nactions: []\n"
        )
        with pytest.raises(ValueError, match="oops"):
            load_flowgroup(
                {"use_template": "t", "template_parameters": {}},
                templates_dir=str(tmp_path / "templates"),
            )

    def test_template_parameters_block_zero_indent_and_comments(self, tmp_path):
        """The zero-indent list style and column-0 comments are valid YAML
        inside the parameters block — the textual fallback must keep them."""
        (tmp_path / "templates").mkdir()
        (tmp_path / "templates" / "t.yaml").write_text(
            """
pipeline: {{ pipe }}
flowgroup: f
parameters:
- name: pipe
  default: bronze
# a comment at column 0 inside the block
- name: extra
  default: x
actions:
  - name: ld
    type: load
    source: {type: sql, sql: "SELECT 1 AS x"}
    target: v
  - name: wr
    type: write
    source: v
    write_target: {type: materialized_view, database: m.s, table: t}
"""
        )
        fg = load_flowgroup(
            {"use_template": "t", "template_parameters": {}},
            templates_dir=str(tmp_path / "templates"),
        )
        assert fg.pipeline == "bronze"

    def test_template_syntax_error_is_clean_error(self, tmp_path):
        (tmp_path / "templates").mkdir()
        (tmp_path / "templates" / "bad.yaml").write_text(
            "pipeline: p\nflowgroup: f\nactions: []\n{% endfor %}\n"
        )
        with pytest.raises(ValueError, match="template 'bad'"):
            load_flowgroup(
                {"use_template": "bad", "template_parameters": {}},
                templates_dir=str(tmp_path / "templates"),
            )


class TestTableReadEdges:
    def test_self_referential_delta_load_is_not_a_cycle(self):
        """A flowgroup that delta-loads the table it also writes reads the
        PRE-RUN content (the incremental self-reference pattern) — the
        table read must not create an intra-flowgroup edge, or topo_sort
        would report a false cycle."""
        spec = {
            "pipeline": "p", "flowgroup": "f",
            "actions": [
                {"name": "ld", "type": "load",
                 "source": {"type": "delta", "catalog": "m", "schema": "s", "table": "t"},
                 "target": "v_prev"},
                {"name": "tr", "type": "transform", "transform_type": "sql",
                 "source": "v_prev", "sql": "SELECT * FROM v_prev", "target": "v_next"},
                {"name": "wr", "type": "write", "source": "v_next",
                 "write_target": {"type": "streaming_table", "catalog": "m",
                                  "schema": "s", "table": "t"}},
            ],
        }
        fg = load_flowgroup(spec)  # must not raise CycleError
        # but the read IS a cross-flowgroup edge via table_reads —
        # fully-qualified spelling only (no bare-leaf false matches)
        assert fg.actions[0].table_reads() == ["m.s.t"]
        assert "m.s.t" not in fg.actions[0].source_views()

    def test_jdbc_table_is_not_a_dependency_edge(self):
        a = load_flowgroup({
            "pipeline": "p", "flowgroup": "f",
            "actions": [
                {"name": "ld", "type": "load",
                 "source": {"type": "jdbc", "url": "jdbc:derby:x", "table": "orders"},
                 "target": "v"},
                {"name": "wr", "type": "write", "source": "v",
                 "write_target": {"type": "materialized_view", "database": "m.s",
                                  "table": "t"}},
            ],
        }).actions[0]
        # a jdbc `table:` names an external RDBMS table no flowgroup produces
        assert a.table_reads() == []
        assert "orders" not in a.source_views()

    def test_unqualified_delta_table_emits_bare_leaf(self):
        a = load_flowgroup({
            "pipeline": "p", "flowgroup": "f",
            "actions": [
                {"name": "ld", "type": "load",
                 "source": {"type": "delta", "table": "t"}, "target": "v"},
                {"name": "wr", "type": "write", "source": "v",
                 "write_target": {"type": "materialized_view", "database": "m.s",
                                  "table": "x"}},
            ],
        }).actions[0]
        assert a.table_reads() == ["t"]


class TestSchemaTransformFileShapes:
    """The reference's schema_transforms/ files come in three shapes; all
    normalize to the same rename->cast->enforce flow (reference
    tests/e2e/fixtures/testing_project/schema_transforms/)."""

    def _run(self, spark, spec):
        from lakehouse_plumber_spark.parsers import load_flowgroup
        from lakehouse_plumber_spark.runner import PipelineRunner

        fg = load_flowgroup({
            "pipeline": "p", "flowgroup": "f",
            "actions": [
                {"name": "ld", "type": "load",
                 "source": {"type": "sql",
                            "sql": "SELECT 7 AS l_orderkey, '9.5' AS l_quantity, 'x' AS extra"},
                 "target": "v"},
                {"name": "sc", "type": "transform", "transform_type": "schema",
                 "source": "v", "target": "v2", "enforcement": "strict",
                 "schema_inline": spec},
                {"name": "wr", "type": "write", "source": "v2",
                 "write_target": {"type": "materialized_view", "catalog": "m",
                                  "schema": "s", "table": "t"}},
            ],
        })
        runner = PipelineRunner(spark)
        return runner.run(fg).resolve_view("m.s.t")

    def test_arrow_string_shape(self, spark):
        out = self._run(spark, {"columns": [
            "l_orderkey -> order_id: BIGINT",
            "l_quantity -> quantity: DECIMAL(18,2)",
        ]})
        assert out.columns == ["order_id", "quantity"]
        row = out.collect()[0]
        assert row.order_id == 7 and float(row.quantity) == 9.5

    def test_mapping_and_casting_blocks(self, spark):
        out = self._run(spark, {
            "column_mapping": {"l_orderkey": "order_id", "l_quantity": "quantity"},
            "type_casting": {"quantity": "DOUBLE"},
        })
        assert out.columns == ["order_id", "quantity"]
        row = out.collect()[0]
        assert row.order_id == 7 and row.quantity == 9.5

    def test_cast_only_string_entry(self, spark):
        out = self._run(spark, {"columns": [
            "l_orderkey: STRING",
            "l_quantity -> quantity: DOUBLE",
        ]})
        row = out.collect()[0]
        assert row.l_orderkey == "7" and row.quantity == 9.5

    def test_mapping_conflicting_with_columns_entry_merges(self, spark):
        """A column_mapping rename whose target is also declared under
        columns must merge (rename preserved), not be dropped."""
        out = self._run(spark, {
            "columns": [{"name": "order_id", "type": "BIGINT"}],
            "column_mapping": {"l_orderkey": "order_id"},
        })
        assert out.columns == ["order_id"]
        assert out.collect()[0].order_id == 7

    def test_duplicate_mapping_targets_and_cast_on_merge(self, spark):
        from lakehouse_plumber_spark.operators.transform import _normalize_schema_columns

        # two mappings to one target: no crash, first rename wins
        out = _normalize_schema_columns({"column_mapping": {"a": "x", "b": "x"}})
        assert out == [{"name": "x", "rename_from": "a"}]
        # mapping merged into a columns entry keeps its type_casting
        out = _normalize_schema_columns({
            "columns": [{"name": "order_id"}],
            "column_mapping": {"l_orderkey": "order_id"},
            "type_casting": {"order_id": "BIGINT"},
        })
        assert out == [{"name": "order_id", "rename_from": "l_orderkey",
                        "type": "BIGINT"}]
