"""Unity Catalog tagging parity (reference uc_tagging_hook_generator.py /
tags_file_parser.py / models/_uc_tagging.py): inline table tags, unified
schema+tags sidecars with column tags, value coercions, absent != empty,
identifier-mismatch warning, additive apply. Mapped onto the store's meta
sidecar (a UC-backed store turns these into ALTER TABLE ... SET TAGS)."""

from __future__ import annotations

import pytest
import yaml

from lakehouse_plumber_spark.parsers import load_flowgroup
from lakehouse_plumber_spark.runner import PipelineRunner
from lakehouse_plumber_spark.tables import ParquetTableStore


def _mv_spec(**wt_extra):
    return {
        "pipeline": "p", "flowgroup": "f",
        "actions": [
            {"name": "ld", "type": "load",
             "source": {"type": "sql", "sql": "SELECT 1 AS id, 'a@b.c' AS email"},
             "target": "v"},
            {"name": "wr", "type": "write", "source": "v",
             "write_target": {"type": "materialized_view", "catalog": "m",
                              "schema": "s", "table": "t", **wt_extra}},
        ],
    }


def test_inline_table_tags_applied_and_coerced(spark, tmp_path):
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
    runner = PipelineRunner(spark, store=store)
    runner.run(load_flowgroup(_mv_spec(tags={"team": "data-eng", "pii": "", "owner": None})))
    assert store.get_meta("m.s.t", "uc_tags") == {"team": "data-eng", "pii": "", "owner": ""}
    # inline path never carries column tags
    assert store.get_meta("m.s.t", "uc_column_tags") is None
    ev = runner.event_log_df()
    assert ev.where("event = 'tags_applied'").count() == 1


def test_tags_file_unified_table_and_column_tags(spark, tmp_path):
    sidecar = tmp_path / "schemas" / "t.yaml"
    sidecar.parent.mkdir()
    sidecar.write_text(yaml.safe_dump({
        "name": "t",
        "columns": [
            {"name": "id", "type": "BIGINT"},                       # no tags key
            {"name": "email", "type": "STRING",
             "tags": {"classification": "pii", "masked": ""}},
        ],
        # NOTE: no top-level tags: key — absent != empty
    }))
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
    runner = PipelineRunner(spark, store=store, base_dir=str(tmp_path))
    runner.run(load_flowgroup(_mv_spec(tags_file="schemas/t.yaml")))
    # absent table tags: the uc_tags meta is never created
    assert store.get_meta("m.s.t", "uc_tags") is None
    assert store.get_meta("m.s.t", "uc_column_tags") == {
        "email": {"classification": "pii", "masked": ""}
    }


def test_tags_file_identifier_mismatch_logged_and_applied(spark, tmp_path):
    sidecar = tmp_path / "other.yaml"
    sidecar.write_text(yaml.safe_dump({"table": "something_else",
                                       "tags": {"team": "x"}}))
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
    runner = PipelineRunner(spark, store=store, base_dir=str(tmp_path))
    runner.run(load_flowgroup(_mv_spec(tags_file="other.yaml")))
    # applied to the WRITE TARGET's table, with a mismatch event
    assert store.get_meta("m.s.t", "uc_tags") == {"team": "x"}
    ev = runner.event_log_df()
    assert ev.where("event = 'tags_file_identifier_mismatch'").count() == 1


def test_tags_apply_additively_across_runs(spark, tmp_path):
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
    runner = PipelineRunner(spark, store=store)
    runner.run(load_flowgroup(_mv_spec(tags={"team": "a", "stage": "dev"})))
    runner.run(load_flowgroup(_mv_spec(tags={"team": "b"})))
    # update wins for re-declared keys, undeclared keys survive (additive —
    # the reference's remove_undeclared_tags=False default)
    assert store.get_meta("m.s.t", "uc_tags") == {"team": "b", "stage": "dev"}


def test_tags_and_tags_file_are_mutually_exclusive():
    with pytest.raises(ValueError, match="tags_file"):
        load_flowgroup(_mv_spec(tags={"a": "b"}, tags_file="x.yaml"))


def test_streaming_table_tags_file(spark, tmp_path):
    sidecar = tmp_path / "st.yaml"
    sidecar.write_text(yaml.safe_dump({
        "table": "st", "tags": {"owner": "me"},
        "columns": [{"name": "id", "tags": {"key": "primary"}}],
    }))
    spec = {
        "pipeline": "p", "flowgroup": "g",
        "actions": [
            {"name": "ld", "type": "load",
             "source": {"type": "sql", "sql": "SELECT 1 AS id"}, "target": "v"},
            {"name": "wr", "type": "write", "source": "v",
             "write_target": {"type": "streaming_table", "catalog": "m",
                              "schema": "s", "table": "st",
                              "tags_file": "st.yaml"}},
        ],
    }
    store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
    runner = PipelineRunner(spark, store=store, base_dir=str(tmp_path))
    runner.run(load_flowgroup(spec))
    assert store.get_meta("m.s.st", "uc_tags") == {"owner": "me"}
    assert store.get_meta("m.s.st", "uc_column_tags") == {"id": {"key": "primary"}}


def test_compiled_script_emits_uc_tags_artifact(spark, tmp_path):
    """compile-to-source resolves tags at compile time and the generated
    build() writes one _uc_tags.json artifact per run — the standalone
    analogue of the reference's generated tagging hook."""
    import json

    from lakehouse_plumber_spark.codegen import compile_flowgroup

    sidecar = tmp_path / "t.yaml"
    sidecar.write_text(yaml.safe_dump({
        "table": "t", "tags": {"team": "x"},
        "columns": [{"name": "id", "tags": {"key": "primary"}}],
    }))
    fg = load_flowgroup(_mv_spec(tags_file="t.yaml"))
    src = compile_flowgroup(fg, base_dir=str(tmp_path))
    ns: dict = {}
    exec(compile(src, "<gen>", "exec"), ns)
    out = tmp_path / "gen"
    ns["build"](spark, str(out))
    doc = json.loads((out / "_uc_tags.json").read_text())
    assert doc == {"m.s.t": {"table_tags": {"team": "x"},
                             "column_tags": {"id": {"key": "primary"}}}}
