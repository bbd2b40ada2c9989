"""Python-source dependency extraction: table reads hidden in python actions.

Reference: ``lhp deps`` parses python load/transform bodies with a
scope-aware AST visitor (src/lhp/core/dependencies/python_parser.py:1-427,
_extraction_visitor.py:1-459) so tables read via ``spark.table(...)`` /
``spark.read.table(...)`` / ``spark.sql(...)`` become cross-pipeline DAG
edges. Without it, a python transform that reads another flowgroup's output
is an invisible edge and stages can run in the wrong order.

This module is the engine's equivalent at the scope the engine needs:

- read-API allowlist: ``spark.table``, ``spark.read.table``, ``spark.read
  .load`` / ``.table`` after ``.format(fmt)`` with fmt in the internal set
  (delta/iceberg/hive — reference python_parser.py:27-34; ``cloudFiles`` and
  custom datasource short names are external roots, NOT internal tables),
  ``spark.readStream`` the same, and ``spark.sql(<literal>)`` routed through
  :func:`dag.sql_table_refs`;
- static string resolution: module/function-level constant bindings and
  f-strings/.format()/% with fully-constant parts resolve to their value
  (reference _static_resolution.py); anything runtime-only is reported as an
  *opaque read* warning (≙ LHP-DEP-002 advisories) instead of silently
  dropped.

Driver-side only — parses source text, never touches data.
"""

from __future__ import annotations

import ast
from dataclasses import dataclass, field
from typing import Optional

from lakehouse_plumber_spark.dag import sql_table_refs

_INTERNAL_TABLE_FORMATS = {"delta", "iceberg", "hive", "unity_catalog", "parquet"}
_READER_ROOTS = {"read", "readStream"}

# receiver names that plausibly hold a SparkSession (the reference's extractor
# is scope-aware; this is the name-heuristic equivalent)
_SPARK_ROOT_RE = None  # compiled lazily below


def _spark_rooted(chain: list[str]) -> bool:
    """True when any receiver segment before the method looks like a Spark
    session (spark, spark_sess, session, my_session) or is a reader root."""
    import re

    global _SPARK_ROOT_RE
    if _SPARK_ROOT_RE is None:
        _SPARK_ROOT_RE = re.compile(r"^(spark\w*|\w*session|sqlcontext)$", re.IGNORECASE)
    return any(
        seg in _READER_ROOTS or _SPARK_ROOT_RE.match(seg) for seg in chain[:-1]
    )


@dataclass
class PyDepsResult:
    tables: set[str] = field(default_factory=set)
    # human-readable advisories for reads whose target is runtime-only
    warnings: list[str] = field(default_factory=list)


def _const_str(
    node: ast.expr,
    bindings: dict[str, str],
    param_vals: Optional[dict] = None,
    param_aliases: frozenset = frozenset(),
) -> Optional[str]:
    """Resolve a node to a static string if possible (constants, bound names,
    f-strings / ``+`` / ``.format`` / ``%`` over static parts, and
    YAML-parameter subscripts like ``parameters["key"]`` — the reference's
    parameter-binding resolution, _static_resolution.py)."""
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    if isinstance(node, ast.Name):
        return bindings.get(node.id)
    if (
        isinstance(node, ast.Subscript)
        and isinstance(node.value, ast.Name)
        and node.value.id in param_aliases
        and param_vals is not None
    ):
        key = _const_str(node.slice, bindings, param_vals, param_aliases)
        val = param_vals.get(key) if isinstance(key, str) else None
        return val if isinstance(val, str) else None
    if isinstance(node, ast.JoinedStr):
        parts = []
        for v in node.values:
            if isinstance(v, ast.Constant):
                parts.append(str(v.value))
            elif isinstance(v, ast.FormattedValue):
                s = _const_str(v.value, bindings, param_vals, param_aliases)
                if s is None:
                    return None
                parts.append(s)
            else:
                return None
        return "".join(parts)
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        a, b = (_const_str(node.left, bindings, param_vals, param_aliases),
                _const_str(node.right, bindings, param_vals, param_aliases))
        return a + b if a is not None and b is not None else None
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Mod):
        a = _const_str(node.left, bindings, param_vals, param_aliases)
        if a is None:
            return None
        args: list[str] = []
        elts = node.right.elts if isinstance(node.right, ast.Tuple) else [node.right]
        for e in elts:
            s = _const_str(e, bindings, param_vals, param_aliases)
            if s is None:
                return None
            args.append(s)
        try:
            return a % tuple(args)
        except (TypeError, ValueError):
            return None
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "format"
    ):
        base = _const_str(node.func.value, bindings, param_vals, param_aliases)
        if base is None:
            return None
        args, kwargs = [], {}
        for a in node.args:
            s = _const_str(a, bindings, param_vals, param_aliases)
            if s is None:
                return None
            args.append(s)
        for kw in node.keywords:
            s = _const_str(kw.value, bindings, param_vals, param_aliases) if kw.arg else None
            if s is None:
                return None
            kwargs[kw.arg] = s
        try:
            return base.format(*args, **kwargs)
        except (IndexError, KeyError, ValueError):
            return None
    return None


def _attr_chain(node: ast.expr) -> list[str]:
    """``spark.read.format("x").table`` -> ["spark","read","format()","table"]."""
    chain: list[str] = []
    while True:
        if isinstance(node, ast.Attribute):
            chain.append(node.attr)
            node = node.value
        elif isinstance(node, ast.Call):
            chain.append("()")
            node = node.func
        elif isinstance(node, ast.Name):
            chain.append(node.id)
            return list(reversed(chain))
        else:
            chain.append("?")
            return list(reversed(chain))


def _reader_format(node: ast.expr, bindings: dict[str, str]) -> Optional[str]:
    """Walk down a reader chain collecting the innermost .format("...") arg."""
    while True:
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            if node.func.attr == "format" and node.args:
                return _const_str(node.args[0], bindings)
            node = node.func.value
        elif isinstance(node, ast.Attribute):
            node = node.value
        else:
            return None


class _Extractor(ast.NodeVisitor):
    def __init__(
        self,
        parameters: Optional[dict] = None,
        function_name: Optional[str] = None,
    ) -> None:
        self.result = PyDepsResult()
        self.bindings: dict[str, str] = {}
        # YAML-declared action parameters bind into the body (reference
        # _static_resolution.py parameter binding): subscripts like
        # parameters["key"] resolve to their declared values, and iterating
        # a declared list statically unrolls one edge per element
        self.param_vals: dict = parameters or {}
        self.param_aliases: set[str] = {"parameters", "params"}
        self.function_name = function_name

    def _resolve(self, node: ast.expr) -> Optional[str]:
        return _const_str(
            node, self.bindings, self.param_vals, frozenset(self.param_aliases)
        )

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        # the declared entry function's LAST positional arg receives the
        # action's parameters dict (call shapes f(df, spark, params) /
        # f([dfs], spark, params) / f(spark, params))
        if (
            self.param_vals
            and self.function_name is not None
            and node.name == self.function_name
            and len(node.args.args) >= 2
        ):
            self.param_aliases.add(node.args.args[-1].arg)
        self.generic_visit(node)

    def _static_iterable(self, node: ast.expr) -> Optional[list[str]]:
        """A for-loop iterable whose elements are statically known strings."""
        if (
            isinstance(node, ast.Subscript)
            and isinstance(node.value, ast.Name)
            and node.value.id in self.param_aliases
        ):
            key = self._resolve(node.slice)
            val = self.param_vals.get(key) if isinstance(key, str) else None
            if isinstance(val, list) and all(isinstance(x, str) for x in val):
                return list(val)
        if isinstance(node, (ast.List, ast.Tuple)):
            vals = [self._resolve(e) for e in node.elts]
            if vals and all(v is not None for v in vals):
                return vals  # type: ignore[return-value]
        return None

    def visit_For(self, node: ast.For) -> None:
        # static loop unrolling (reference dep_bindings fixture): iterating a
        # declared parameter list visits the body once per element with the
        # loop variable bound — one dependency edge per configured table
        vals = self._static_iterable(node.iter)
        if vals is not None and isinstance(node.target, ast.Name):
            saved = self.bindings.get(node.target.id)
            for v in vals:
                self.bindings[node.target.id] = v
                for stmt in node.body:
                    self.visit(stmt)
            if saved is None:
                self.bindings.pop(node.target.id, None)
            else:
                self.bindings[node.target.id] = saved
            for stmt in node.orelse:
                self.visit(stmt)
            return
        self.generic_visit(node)

    # --- constant bindings (one scope-wide dict: good enough for the
    # helper-module shapes python actions take; reassignment overwrites) ---
    def visit_Assign(self, node: ast.Assign) -> None:
        if len(node.targets) == 1 and isinstance(node.targets[0], ast.Name):
            val = self._resolve(node.value)
            if val is not None:
                self.bindings[node.targets[0].id] = val
        self.generic_visit(node)

    def visit_AnnAssign(self, node: ast.AnnAssign) -> None:
        if node.value is not None and isinstance(node.target, ast.Name):
            val = self._resolve(node.value)
            if val is not None:
                self.bindings[node.target.id] = val
        self.generic_visit(node)

    def visit_Call(self, node: ast.Call) -> None:
        func = node.func
        if isinstance(func, ast.Attribute):
            chain = _attr_chain(func)
            # bare .sql()/.table() only count when the receiver chain passes
            # through a Spark-session-looking name (spark*, *session) or a
            # reader root — otherwise catalog.table()/self.sql() etc. would
            # fabricate dependency edges (and with the runner's view-name
            # folding, even cycles) out of unrelated APIs
            if func.attr == "sql" and node.args and _spark_rooted(chain):
                sql = self._resolve(node.args[0])
                if sql is not None:
                    self.result.tables |= sql_table_refs(sql)
                else:
                    self.result.warnings.append(
                        f"line {node.lineno}: spark.sql(...) with runtime-only "
                        f"query string — reads not statically resolvable (LHP-DEP-002)"
                    )
            elif func.attr == "sql" and node.args and not _spark_rooted(chain):
                # not counted as an edge, but don't drop it SILENTLY: if the
                # argument is a constant with table refs, surface an advisory
                # so a renamed session variable is diagnosable
                sql = self._resolve(node.args[0])
                refs = sql_table_refs(sql) if sql else set()
                if refs:
                    recv = ".".join(chain[:-1]) or "?"
                    self.result.warnings.append(
                        f"line {node.lineno}: .sql() on non-session receiver "
                        f"{recv!r} — refs {sorted(refs)} not counted as "
                        f"dependencies (LHP-DEP-003); rename the variable to "
                        f"*session/spark* or add depends_on"
                    )
            elif func.attr in ("table", "load") and node.args:
                is_direct_table = func.attr == "table" and (
                    # spark.table(...) / spark.read.table / spark.readStream.table
                    (len(chain) >= 2 and chain[-2] in _READER_ROOTS)
                    or (len(chain) == 2 and _spark_rooted(chain))  # spark.table
                )
                fmt = _reader_format(func.value, self.bindings)
                reader_chain = any(c in _READER_ROOTS for c in chain)
                internal = is_direct_table or (
                    func.attr == "load"
                    and reader_chain
                    and fmt is not None
                    and fmt.lower() in _INTERNAL_TABLE_FORMATS
                )
                if func.attr == "table" and reader_chain and fmt is not None:
                    # .format("cloudFiles").table(...) etc: external root
                    internal = fmt.lower() in _INTERNAL_TABLE_FORMATS
                if internal:
                    name = self._resolve(node.args[0])
                    if name is not None:
                        if func.attr == "load":
                            # a path, not a table name — only count dotted
                            # identifiers (paths have / in them)
                            if "/" not in name and "." in name:
                                self.result.tables.add(name)
                        else:
                            self.result.tables.add(name)
                    else:
                        self.result.warnings.append(
                            f"line {node.lineno}: table read with runtime-only "
                            f"name — not statically resolvable (LHP-DEP-002)"
                        )
        self.generic_visit(node)


def extract_python_table_refs(
    code: str,
    parameters: Optional[dict] = None,
    function_name: Optional[str] = None,
) -> PyDepsResult:
    """Internal-table reads (+ opaque-read advisories) from one python body."""
    try:
        tree = ast.parse(code)
    except SyntaxError:
        return PyDepsResult(warnings=["unparseable python source"])
    ex = _Extractor(parameters=parameters, function_name=function_name)
    ex.visit(tree)
    return ex.result


def action_python_refs(action, base_dir: str = ".") -> PyDepsResult:
    """Refs for one action's python body: module_path file or in-process
    callable (source recovered via inspect, the reference's source_extractor
    seam)."""
    import inspect
    import os
    import textwrap

    code = None
    if getattr(action, "module_path", None):
        p = action.module_path
        if not os.path.isabs(p):
            p = os.path.join(base_dir, p)
        try:
            with open(p) as f:
                code = f.read()
        except OSError:
            return PyDepsResult(warnings=[f"cannot read module {p!r}"])
    elif getattr(action, "callable_fn", None) is not None:
        try:
            code = textwrap.dedent(inspect.getsource(action.callable_fn))
        except (OSError, TypeError):
            return PyDepsResult()
    if code is None and isinstance(getattr(action, "source", None), dict):
        mp = action.source.get("module_path")
        if mp:
            p = mp if os.path.isabs(mp) else os.path.join(base_dir, mp)
            try:
                with open(p) as f:
                    code = f.read()
            except OSError:
                return PyDepsResult(warnings=[f"cannot read module {p!r}"])
        elif action.source.get("callable_fn") is not None:
            try:
                code = textwrap.dedent(inspect.getsource(action.source["callable_fn"]))
            except (OSError, TypeError):
                return PyDepsResult()
    if code is None:
        return PyDepsResult()
    parameters = getattr(action, "parameters", None)
    function_name = getattr(action, "function_name", None)
    if isinstance(getattr(action, "source", None), dict):
        parameters = parameters or action.source.get("parameters")
        function_name = function_name or action.source.get("function_name")
    return extract_python_table_refs(
        code, parameters=parameters, function_name=function_name
    )
