"""Developer-sandbox rename pass (reference --sandbox, src/lhp/core/sandbox/):
produced tables and every read of them get per-developer names; out-of-scope
refs pass through untouched."""

from __future__ import annotations

import os

import pytest

from lakehouse_plumber_spark.__main__ import main
from lakehouse_plumber_spark.parsers import load_flowgroup
from lakehouse_plumber_spark.sandbox import (
    SandboxConfigError,
    SandboxStrategy,
    apply_sandbox,
    produced_tables,
)

PROJECT = os.path.join(os.path.dirname(__file__), "fixtures", "cli_project")


class TestStrategy:
    def test_default_pattern(self):
        s = SandboxStrategy(namespace="alice")
        assert s.rename_leaf("orders") == "alice_orders"

    def test_pattern_must_have_both_placeholders(self):
        with pytest.raises(SandboxConfigError, match="missing required"):
            SandboxStrategy(namespace="a", table_pattern="{namespace}_fixed")

    def test_pattern_rejects_unknown_placeholder(self):
        with pytest.raises(SandboxConfigError, match="unsupported placeholder"):
            SandboxStrategy(namespace="a", table_pattern="{user}_{table}")

    def test_pattern_rejects_non_identifier_literals(self):
        with pytest.raises(SandboxConfigError, match="literal segment"):
            SandboxStrategy(namespace="a", table_pattern="{namespace}-{table}")

    def test_pattern_rejects_decorated_placeholders(self):
        with pytest.raises(SandboxConfigError, match="bare"):
            SandboxStrategy(namespace="a", table_pattern="{namespace}_{table!r}")
        with pytest.raises(SandboxConfigError, match="bare"):
            SandboxStrategy(namespace="a", table_pattern="{namespace}_{table:>10}")

    def test_pattern_rejects_unparseable_format_string(self):
        with pytest.raises(SandboxConfigError, match="format string"):
            SandboxStrategy(namespace="a", table_pattern="{namespace}_{table")

    def test_namespace_must_be_identifier(self):
        with pytest.raises(SandboxConfigError, match="identifier"):
            SandboxStrategy(namespace="a b")


def _fgs():
    producer = load_flowgroup({
        "pipeline": "bronze", "flowgroup": "cust",
        "actions": [
            {"name": "ld", "type": "load", "target": "v_c",
             "source": {"type": "sql", "sql": "SELECT * FROM customer"}},
            {"name": "wr", "type": "write", "source": "v_c",
             "write_target": {"type": "materialized_view", "catalog": "main",
                              "schema": "bronze", "table": "Customers"}},
        ],
    })
    consumer = load_flowgroup({
        "pipeline": "gold", "flowgroup": "sum",
        "actions": [
            {"name": "tx", "type": "transform", "transform_type": "sql",
             "source": "main.bronze.customers",
             "sql": "SELECT c_mktsegment, COUNT(*) AS n FROM main.bronze.customers "
                    "JOIN nation ON 1=1 GROUP BY c_mktsegment",
             "target": "v_s"},
            {"name": "wr", "type": "write", "source": "v_s",
             "write_target": {"type": "materialized_view", "catalog": "main",
                              "schema": "gold", "table": "summary"}},
        ],
    })
    return [producer, consumer]


class TestRewrite:
    def test_produced_index_covers_mv_targets(self):
        assert set(produced_tables(_fgs())) == {
            "main.bronze.customers", "main.gold.summary"}

    def test_write_and_reads_renamed_sources_untouched(self):
        out = apply_sandbox(_fgs(), "alice")
        # producer: leaf renamed, original site casing preserved
        assert out[0].actions[1].write_target.table == "alice_Customers"
        assert out[0].actions[1].write_target.catalog == "main"
        # external source table untouched
        assert "FROM customer" in out[0].actions[0].source["sql"]
        # consumer: chained source ref + SQL ref renamed, out-of-scope join not
        assert out[1].actions[0].source == "main.bronze.alice_customers"
        assert "main.bronze.alice_customers" in out[1].actions[0].sql
        assert "JOIN nation" in out[1].actions[0].sql
        assert out[1].actions[1].write_target.table == "alice_summary"

    def test_input_flowgroups_not_mutated(self):
        fgs = _fgs()
        apply_sandbox(fgs, "alice")
        assert fgs[0].actions[1].write_target.table == "Customers"
        assert fgs[1].actions[0].source == "main.bronze.customers"

    def test_short_ref_matches_unique_producer_only(self):
        fgs = _fgs()
        out = apply_sandbox(fgs, "bob")
        strategy = SandboxStrategy(namespace="bob")
        from lakehouse_plumber_spark.sandbox import _match
        produced = produced_tables(fgs)
        assert _match("bronze.customers", produced) == "main.bronze.customers"
        assert _match("customers", produced) == "main.bronze.customers"
        assert _match("nation", produced) is None
        del out, strategy

    def test_delta_sink_table_name_in_scope(self):
        fgs = _fgs() + [load_flowgroup({
            "pipeline": "p", "flowgroup": "snk",
            "actions": [
                {"name": "ld", "type": "load", "target": "v",
                 "source": {"type": "sql", "sql": "SELECT 1 AS value"}},
                {"name": "s", "type": "write", "source": "v",
                 "write_target": {"type": "sink", "sink_type": "delta",
                                  "options": {"tableName": "main.bronze.customers"}}},
            ],
        })]
        out = apply_sandbox(fgs, "eve")
        assert out[2].actions[1].write_target.options["tableName"] == \
            "main.bronze.eve_customers"


def test_cli_run_with_sandbox_rewrites_targets(spark, testdata, capsys):
    rc = main(["run", PROJECT, "--env", "dev", "--sandbox", "dev1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "main.bronze.dev1_customers rows=" in out
    assert "main.gold.dev1_customer_summary rows=" in out
    # sandboxed gold reads the SANDBOXED bronze (same counts as unsandboxed)
    n = int(next(line.split("rows=")[1] for line in out.splitlines()
                 if "main.bronze.dev1_customers rows=" in line))
    assert n == spark.table("customer").where("c_acctbal >= 0").count()


def test_cli_compile_with_sandbox(tmp_path, capsys):
    rc = main(["compile", PROJECT, "--env", "dev", "--sandbox", "dev2",
               "-o", str(tmp_path)])
    capsys.readouterr()
    assert rc == 0
    gold = (tmp_path / "gold__summary.py").read_text()
    assert "main.bronze.dev2_customers" in gold
    assert "main.gold.dev2_customer_summary" in gold


def test_in_process_callables_survive_rewrite(spark):
    """model_dump excludes callables; the rewrite must carry them over so
    programmatically-built specs still run after sandboxing."""
    def my_load(spark_, params):
        return spark_.range(3).withColumnRenamed("id", "k")

    fgs = [load_flowgroup({
        "pipeline": "p", "flowgroup": "cb",
        "actions": [
            {"name": "ld", "type": "load", "target": "v",
             "source": {"type": "python"}, "callable_fn": my_load},
            {"name": "wr", "type": "write", "source": "v",
             "write_target": {"type": "materialized_view", "catalog": "m",
                              "schema": "s", "table": "t"}},
        ],
    })]
    out = apply_sandbox(fgs, "carol")
    assert out[0].actions[0].callable_fn is my_load
    assert out[0].actions[1].write_target.table == "carol_t"


def test_bare_ref_qualifiers_rewritten_with_table():
    """`SELECT customers.c_name FROM customers` must rename the qualifier
    along with the FROM, or the rewritten query no longer resolves; dotted
    schema chains (x.y.z) are not qualifiers and stay put."""
    fgs = [load_flowgroup({
        "pipeline": "p", "flowgroup": "q",
        "actions": [
            {"name": "ld", "type": "load", "target": "v",
             "source": {"type": "sql", "sql": "SELECT 1 AS c_name"}},
            {"name": "w0", "type": "write", "source": "v",
             "write_target": {"type": "materialized_view", "table": "customers"}},
        ],
    }), load_flowgroup({
        "pipeline": "p2", "flowgroup": "r",
        "actions": [
            {"name": "tx", "type": "transform", "transform_type": "sql",
             "source": "customers",
             "sql": "SELECT customers.c_name, other.x FROM customers "
                    "JOIN other ON customers.c_name = other.y",
             "target": "v2"},
            {"name": "w1", "type": "write", "source": "v2",
             "write_target": {"type": "materialized_view", "table": "out_t"}},
        ],
    })]
    out = apply_sandbox(fgs, "dana")
    sql = out[1].actions[0].sql
    assert "FROM dana_customers" in sql
    assert "dana_customers.c_name" in sql and "customers.c_name" not in sql.replace("dana_customers.c_name", "")
    # out-of-scope table + its qualifier untouched
    assert "JOIN other" in sql and "other.x" in sql and "other.y" in sql


def test_dotted_ref_leaf_qualifiers_and_struct_chains():
    """Leaf-name qualifiers of a DOTTED in-scope ref (Spark accepts
    `customers.c_name` with FROM main.bronze.customers) and struct-field
    chains (`customers.address.city`) must follow the rename."""
    fgs = _fgs()  # produces main.bronze.Customers
    fgs.append(load_flowgroup({
        "pipeline": "p3", "flowgroup": "qq",
        "actions": [
            {"name": "tx", "type": "transform", "transform_type": "sql",
             "source": "main.bronze.customers",
             "sql": "SELECT customers.c_name, customers.address.city "
                    "FROM main.bronze.customers",
             "target": "v3"},
            {"name": "w", "type": "write", "source": "v3",
             "write_target": {"type": "materialized_view", "table": "out3"}},
        ],
    }))
    out = apply_sandbox(fgs, "erin")
    sql = out[2].actions[0].sql
    assert "FROM main.bronze.erin_customers" in sql
    assert "erin_customers.c_name" in sql
    assert "erin_customers.address.city" in sql


def test_sql_rewrite_inside_dynamic_constructs():
    """IDENTIFIER('fqn') and table_changes('fqn', v) carry their ref as a
    quoted string; in-scope refs must be rewritten inside the quotes
    (reference testing_project/19_dependency_bindings contract)."""
    from lakehouse_plumber_spark.sandbox import SandboxStrategy, _rewrite_sql

    strategy = SandboxStrategy(namespace="dev1")
    produced = {"main.bronze.dim": "dim"}
    sql = (
        "SELECT * FROM IDENTIFIER('main.bronze.dim') "
        "WHERE id NOT IN (SELECT id FROM table_changes('main.bronze.dim', 0)) "
        "AND note = 'main.bronze.dim untouched literal'"
    )
    out = _rewrite_sql(sql, strategy, produced)
    assert "IDENTIFIER('main.bronze.dev1_dim')" in out
    assert "table_changes('main.bronze.dev1_dim', 0)" in out
    # a ref-shaped string in an ordinary literal is NOT a table position...
    # (the scan only treats IDENTIFIER/table_changes quotes as refs) — but
    # any occurrence of the exact in-scope FQN is rewritten by the generic
    # replacement; out-of-scope tables stay untouched either way
    out2 = _rewrite_sql("SELECT * FROM IDENTIFIER('other.cat.tbl')", strategy, produced)
    assert out2 == "SELECT * FROM IDENTIFIER('other.cat.tbl')"
