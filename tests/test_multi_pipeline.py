"""Cross-pipeline execution order: run_many must stage flowgroups by
table-read -> table-write dependencies, including reads that appear only
inside SQL text (reference: DependencyAnalysisService + sqlglot extraction).
"""

from __future__ import annotations

import pytest

from lakehouse_plumber_spark.dag import sql_table_refs
from lakehouse_plumber_spark.parsers import load_flowgroup


class TestSqlTableRefs:
    def test_from_join_and_stream(self):
        sql = """
        -- comment FROM fake_table
        WITH cte AS (SELECT * FROM main.bronze.a)
        SELECT * FROM cte
        JOIN main.bronze.b ON 1=1
        JOIN stream(main.bronze.c) s ON 1=1
        WHERE x = 'FROM not_a_table'
        """
        assert sql_table_refs(sql) == {"main.bronze.a", "main.bronze.b", "main.bronze.c"}

    def test_subquery_not_captured_as_name(self):
        refs = sql_table_refs("SELECT * FROM (SELECT 1) t JOIN real_tbl r ON 1=1")
        assert refs == {"real_tbl"}


def test_run_many_orders_by_sql_reads(spark, runner, testdata):
    """Flowgroup B's MV reads a table A writes — only via SQL text. Submitted
    out of order, run_many must execute A first."""
    fg_a = load_flowgroup(
        {
            "pipeline": "p1", "flowgroup": "make_base",
            "actions": [
                {"name": "ld", "type": "load", "target": "v_n",
                 "source": {"type": "sql", "sql": "SELECT n_nationkey, n_name FROM nation"}},
                {"name": "wr", "type": "write", "source": "v_n",
                 "write_target": {"type": "materialized_view", "database": "main.x",
                                  "table": "base_nation"}},
            ],
        }
    )
    fg_b = load_flowgroup(
        {
            "pipeline": "p2", "flowgroup": "consume_base",
            "actions": [
                {"name": "wr", "type": "write",
                 "write_target": {"type": "materialized_view", "database": "main.x",
                                  "table": "nation_count",
                                  "sql": "SELECT CAST(COUNT(*) AS BIGINT) AS n "
                                         "FROM main.x.base_nation"}},
            ],
        }
    )
    # B submitted first; without SQL-read extraction this fails (table missing)
    ctxs = runner.run_many([fg_b, fg_a])
    out = ctxs[0].resolve_view("main.x.nation_count")
    assert out.collect()[0]["n"] == 25


def test_run_many_detects_cycle(spark, runner):
    a = load_flowgroup(
        {
            "pipeline": "p1", "flowgroup": "a",
            "actions": [
                {"name": "wr", "type": "write",
                 "write_target": {"type": "materialized_view", "database": "m.x",
                                  "table": "t1", "sql": "SELECT * FROM m.x.t2"}},
            ],
        }
    )
    b = load_flowgroup(
        {
            "pipeline": "p2", "flowgroup": "b",
            "actions": [
                {"name": "wr", "type": "write",
                 "write_target": {"type": "materialized_view", "database": "m.x",
                                  "table": "t2", "sql": "SELECT * FROM m.x.t1"}},
            ],
        }
    )
    with pytest.raises(ValueError, match="cycle"):
        runner.run_many([a, b])


class TestPythonDependencyExtraction:
    """Reference AST visitors (python_parser.py:1-427, _extraction_visitor.py):
    table reads inside python bodies become DAG edges."""

    def test_extracts_read_api_allowlist(self):
        from lakehouse_plumber_spark.pydeps import extract_python_table_refs

        code = '''
TBL = "main.bronze.orders"
def f(spark, params):
    a = spark.table(TBL)
    b = spark.read.table("main.bronze." + "customer")
    c = spark.readStream.format("delta").table(f"main.{'bronze'}.lineitem")
    d = spark.read.format("cloudFiles").load("main.landing.raw")  # external root
    e = spark.sql("SELECT * FROM main.silver.enriched JOIN main.silver.dims ON 1=1")
    return a
'''
        res = extract_python_table_refs(code)
        assert res.tables == {
            "main.bronze.orders", "main.bronze.customer", "main.bronze.lineitem",
            "main.silver.enriched", "main.silver.dims",
        }
        assert res.warnings == []

    def test_runtime_only_name_yields_advisory_not_silence(self):
        from lakehouse_plumber_spark.pydeps import extract_python_table_refs

        code = '''
def f(spark, params):
    return spark.table(params["tbl"])
'''
        res = extract_python_table_refs(code)
        assert res.tables == set()
        assert any("LHP-DEP-002" in w for w in res.warnings)

    def test_run_many_orders_by_python_read(self, spark, runner, testdata):
        """Flowgroup B's ONLY dependency on A is a spark.table() call inside a
        python load body — submitted out of order, run_many must run A first."""
        from lakehouse_plumber_spark.parsers import load_flowgroup

        fg_a = load_flowgroup(
            {
                "pipeline": "p1", "flowgroup": "py_base",
                "actions": [
                    {"name": "ld", "type": "load", "target": "v_n",
                     "source": {"type": "sql",
                                "sql": "SELECT n_nationkey, n_name FROM nation"}},
                    {"name": "wr", "type": "write", "source": "v_n",
                     "write_target": {"type": "materialized_view", "database": "main.y",
                                      "table": "pybase_nation"}},
                ],
            }
        )

        def py_load(spark_, params):
            # the folded temp-view spelling a python body actually uses
            return spark_.table("main__y__pybase_nation")

        fg_b = load_flowgroup(
            {
                "pipeline": "p2", "flowgroup": "py_consume",
                "actions": [
                    {"name": "ld", "type": "load", "target": "v_base",
                     "source": {"type": "python"}, "callable_fn": py_load},
                    {"name": "wr", "type": "write", "source": "v_base",
                     "write_target": {"type": "materialized_view", "database": "main.y",
                                      "table": "pycount",
                                      "sql": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v_base"}},
                ],
            }
        )
        ctxs = runner.run_many([fg_b, fg_a])
        assert ctxs[0].resolve_view("main.y.pycount").collect()[0]["n"] == 25

    def test_non_spark_receivers_do_not_fabricate_edges(self):
        """catalog.table() / self.sql() / obj.table() are NOT Spark reads;
        counting them fabricates dependency edges (and, with the runner's
        view-name folding, even cycles) — ADVICE r3."""
        from lakehouse_plumber_spark.pydeps import extract_python_table_refs

        code = '''
def f(spark, params):
    a = catalog.table("main.x.t1")
    b = self.table("main.x.t2")
    c = conn.sql("SELECT * FROM main.x.t3")
    d = self.helper.sql("SELECT * FROM main.x.t4")
    return a
'''
        res = extract_python_table_refs(code)
        assert res.tables == set()

    def test_sessionlike_receivers_still_count(self):
        from lakehouse_plumber_spark.pydeps import extract_python_table_refs

        code = '''
def f(spark_sess, params):
    a = spark_sess.table("main.x.t1")
    b = self.spark.sql("SELECT * FROM main.x.t2")
    c = my_session.table("main.x.t3")
    return a
'''
        res = extract_python_table_refs(code)
        assert res.tables == {"main.x.t1", "main.x.t2", "main.x.t3"}


class TestGraphCache:
    """Persistent dependency-graph cache (reference graph_cache.py): second
    `deps` run hits, edits invalidate by key construction."""

    def _proj(self, tmp_path):
        proj = tmp_path / "gproj"
        (proj / "pipelines").mkdir(parents=True)
        (proj / "pipelines" / "a.yaml").write_text(
            "pipeline: pa\nflowgroup: fa\nactions:\n"
            "  - {name: ld, type: load, target: v,\n"
            "     source: {type: sql, sql: 'SELECT 1 AS x'}}\n"
            "  - name: wr\n    type: write\n    source: v\n"
            "    write_target: {type: materialized_view, catalog: c, schema: s, table: base}\n"
        )
        (proj / "pipelines" / "b.yaml").write_text(
            "pipeline: pb\nflowgroup: fb\nactions:\n"
            "  - {name: ld, type: load, target: v2,\n"
            "     source: {type: sql, sql: 'SELECT * FROM c.s.base'}}\n"
            "  - name: wr\n    type: write\n    source: v2\n"
            "    write_target: {type: materialized_view, catalog: c, schema: s, table: derived}\n"
        )
        return proj

    def test_deps_cached_and_invalidated(self, tmp_path, capsys):
        import os

        from lakehouse_plumber_spark.__main__ import main

        proj = self._proj(tmp_path)
        assert main(["deps", str(proj)]) == 0
        out1 = capsys.readouterr().out
        assert "stage 2: pb/fb" in out1
        gdir = proj / ".lhp" / "cache" / "graph"
        entries = [f for f in os.listdir(gdir) if f.endswith(".json")]
        assert len(entries) == 1

        # cache hit: same output, no new entry
        assert main(["deps", str(proj)]) == 0
        assert capsys.readouterr().out == out1
        assert len([f for f in os.listdir(gdir) if f.endswith(".json")]) == 1

        # edit flips the dependency around -> new key, correct new stages
        (proj / "pipelines" / "b.yaml").write_text(
            (proj / "pipelines" / "b.yaml").read_text().replace("c.s.base", "elsewhere")
        )
        assert main(["deps", str(proj)]) == 0
        out2 = capsys.readouterr().out
        assert "stage 1: pb/fb" in out2
        assert len([f for f in os.listdir(gdir) if f.endswith(".json")]) == 2


def test_graph_cache_key_covers_algorithm_version(tmp_path, monkeypatch):
    """Upgrading the edge-builder must invalidate cached graphs even when no
    spec changed — the graph is pure in (file contents, builder code), so
    the key carries GRAPH_ALGO_VERSION."""
    from lakehouse_plumber_spark import graph_cache as gc

    f = tmp_path / "spec.yaml"
    f.write_text("pipeline: p\n")
    k1 = gc.project_graph_key([str(f)])
    monkeypatch.setattr(gc, "GRAPH_ALGO_VERSION", gc.GRAPH_ALGO_VERSION + 1)
    k2 = gc.project_graph_key([str(f)])
    assert k1 != k2


class TestDynamicSqlRefs:
    def test_identifier_and_table_changes_refs_extracted(self):
        sql = """
        SELECT * FROM IDENTIFIER('main.bronze.dim')
        WHERE id NOT IN (SELECT id FROM table_changes('main.bronze.dim', 0))
        """
        assert sql_table_refs(sql) == {"main.bronze.dim"}
        # plain string literals are still masked, not misread as refs
        assert sql_table_refs("SELECT 'from fake.tbl' AS s FROM real_t") == {"real_t"}

    def test_dynamic_sql_creates_cross_flowgroup_edge(self, spark, tmp_path):
        """A consumer whose ONLY reference to the producer's table is inside
        IDENTIFIER()/table_changes() must still stage after it, and the SQL
        must execute against the store-managed table + its change feed."""
        from lakehouse_plumber_spark.parsers import load_flowgroup
        from lakehouse_plumber_spark.runner import PipelineRunner
        from lakehouse_plumber_spark.tables import ParquetTableStore

        producer = load_flowgroup({
            "pipeline": "a", "flowgroup": "w",
            "actions": [
                {"name": "ld", "type": "load",
                 "source": {"type": "sql", "sql": "SELECT id, id * 2 AS v FROM RANGE(10)"},
                 "target": "v_in"},
                {"name": "wr", "type": "write", "source": "v_in",
                 "write_target": {"type": "streaming_table", "catalog": "m",
                                  "schema": "s", "table": "dim",
                                  "table_properties": {"delta.enableChangeDataFeed": "true"}}},
            ],
        })
        consumer = load_flowgroup({
            "pipeline": "b", "flowgroup": "r",
            "actions": [
                {"name": "probe", "type": "transform", "transform_type": "sql",
                 "sql": """
                   SELECT COUNT(*) AS n_rows,
                          (SELECT COUNT(*) FROM table_changes('m.s.dim', 0)) AS n_changes
                   FROM IDENTIFIER('m.s.dim')
                 """,
                 "target": "v_probe"},
                {"name": "wr", "type": "write", "source": "v_probe",
                 "write_target": {"type": "materialized_view", "catalog": "m",
                                  "schema": "g", "table": "probe_out"}},
            ],
        })
        store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
        runner = PipelineRunner(spark, store=store)
        # consumer listed FIRST: only the dep edge can order it after the writer
        ctxs = runner.run_many([consumer, producer])
        row = ctxs[0].resolve_view("m.g.probe_out").collect()[0]
        assert row.n_rows == 10 and row.n_changes == 10


class TestParameterBoundPythonRefs:
    """YAML parameters bind into python bodies for dependency extraction
    (reference testing_project/19_dependency_bindings): subscript reads
    resolve, declared lists statically unroll one edge per element."""

    def test_loop_unrolled_parameter_reads(self):
        from lakehouse_plumber_spark.pydeps import extract_python_table_refs

        code = (
            "def union_configured_tables(df, spark, parameters):\n"
            "    result = df\n"
            "    for t in parameters['tables']:\n"
            "        result = result.unionByName(spark.read.table(t))\n"
            "    return result\n"
        )
        out = extract_python_table_refs(
            code,
            parameters={"tables": ["main.bronze.alpha", "main.bronze.beta"]},
            function_name="union_configured_tables",
        )
        assert out.tables == {"main.bronze.alpha", "main.bronze.beta"}
        assert not out.warnings

    def test_subscript_parameter_read_and_custom_arg_name(self):
        from lakehouse_plumber_spark.pydeps import extract_python_table_refs

        code = (
            "def f(df, spark, cfg):\n"
            "    return df.join(spark.table(cfg['dim_table']), 'k')\n"
        )
        out = extract_python_table_refs(
            code, parameters={"dim_table": "main.silver.dim"}, function_name="f"
        )
        assert out.tables == {"main.silver.dim"}

    def test_unknown_parameter_stays_opaque_warning(self):
        from lakehouse_plumber_spark.pydeps import extract_python_table_refs

        code = (
            "def f(df, spark, parameters):\n"
            "    return spark.table(parameters['nope'])\n"
        )
        out = extract_python_table_refs(code, parameters={"other": "x"},
                                        function_name="f")
        assert out.tables == set()
        assert any("runtime-only" in w for w in out.warnings)

    def test_parameter_loop_creates_cross_flowgroup_edge(self, spark, tmp_path):
        """End-to-end: the ONLY link from consumer to producer is a table
        name inside parameters['tables']; run_many must still stage the
        producer first."""
        from lakehouse_plumber_spark.parsers import load_flowgroup
        from lakehouse_plumber_spark.runner import PipelineRunner
        from lakehouse_plumber_spark.tables import ParquetTableStore

        mod = tmp_path / "union_mod.py"
        mod.write_text(
            "def union_tables(df, spark, parameters):\n"
            "    out = df\n"
            "    for t in parameters['tables']:\n"
            "        out = out.unionByName(spark.table(t))\n"
            "    return out\n"
        )
        producer = load_flowgroup({
            "pipeline": "a", "flowgroup": "w",
            "actions": [
                {"name": "ld", "type": "load",
                 "source": {"type": "sql", "sql": "SELECT id FROM RANGE(5)"},
                 "target": "v"},
                {"name": "wr", "type": "write", "source": "v",
                 "write_target": {"type": "materialized_view", "catalog": "m",
                                  "schema": "s", "table": "alpha"}},
            ],
        })
        consumer = load_flowgroup({
            "pipeline": "b", "flowgroup": "r",
            "actions": [
                {"name": "seed", "type": "load",
                 "source": {"type": "sql", "sql": "SELECT id + 100 AS id FROM RANGE(5)"},
                 "target": "v_seed"},
                {"name": "u", "type": "transform", "transform_type": "python",
                 "source": "v_seed", "target": "v_all",
                 "module_path": "union_mod.py", "function_name": "union_tables",
                 # folded temp-view spelling — how python bodies read another
                 # flowgroup's table at runtime; the dep graph reconciles it
                 # to the dotted writer (cross_flowgroup_deps)
                 "parameters": {"tables": ["m__s__alpha"]}},
                {"name": "wr", "type": "write", "source": "v_all",
                 "write_target": {"type": "materialized_view", "catalog": "m",
                                  "schema": "g", "table": "all_rows"}},
            ],
        })
        store = ParquetTableStore(spark=spark, root=str(tmp_path / "wh"))
        runner = PipelineRunner(spark, store=store, base_dir=str(tmp_path))
        ctxs = runner.run_many([consumer, producer])  # consumer listed first
        assert ctxs[0].resolve_view("m.g.all_rows").count() == 10


def test_table_changes_in_comment_or_without_log_left_verbatim(spark, runner):
    """A table_changes ref with no change log (e.g. commented-out legacy SQL)
    must not break the action at registration time."""
    from lakehouse_plumber_spark.parsers import load_flowgroup

    fg = load_flowgroup({
        "pipeline": "p", "flowgroup": "f",
        "actions": [
            {"name": "t", "type": "transform", "transform_type": "sql",
             "sql": "SELECT 1 AS x -- old: table_changes('legacy.gone', 0)",
             "target": "v"},
            {"name": "wr", "type": "write", "source": "v",
             "write_target": {"type": "materialized_view", "catalog": "m",
                              "schema": "s", "table": "t"}},
        ],
    })
    assert runner.run(fg).resolve_view("m.s.t").collect()[0].x == 1
