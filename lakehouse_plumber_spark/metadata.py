"""Operational metadata columns (automatic audit columns).

Reference defaults (src/lhp/core/codegen/operational_metadata/metadata.py:28-54)
with preset->flowgroup->action selection resolution and `false` veto
(metadata.py:170-205). Expressions are restricted to a whitelist of column
functions (metadata.py:127-152) evaluated via `F.expr`.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_COLUMNS: dict[str, str] = {
    "_ingestion_timestamp": "current_timestamp()",
    "_source_file": "_metadata.file_path",
    "_pipeline_run_id": "__RUN_ID__",  # substituted with a literal at apply time
    "_pipeline_name": "__PIPELINE__",
    "_flowgroup_name": "__FLOWGROUP__",
}


def resolve_selection(
    action_sel: Optional[Union[bool, list[str]]],
    flowgroup_sel: Optional[Union[bool, list[str]]],
    available: dict[str, str],
) -> list[str]:
    """Action-level wins over flowgroup-level; `False` vetoes; `True` = all."""
    sel = action_sel if action_sel is not None else flowgroup_sel
    if sel is None or sel is False:
        return []
    if sel is True:
        return list(available)
    return [c for c in sel if c in available]


def apply_metadata(
    df: DataFrame,
    columns: list[str],
    pipeline: str,
    flowgroup: str,
    run_id: str,
    custom_columns: Optional[dict[str, str]] = None,
    has_file_source: bool = True,
) -> DataFrame:
    available = dict(DEFAULT_COLUMNS)
    if custom_columns:
        available.update(custom_columns)
    for name in columns:
        expr = available[name]
        if expr == "__RUN_ID__":
            col = F.lit(run_id)
        elif expr == "__PIPELINE__":
            col = F.lit(pipeline)
        elif expr == "__FLOWGROUP__":
            col = F.lit(flowgroup)
        elif expr == "_metadata.file_path":
            # only valid on file-backed sources; null elsewhere
            col = F.col("_metadata.file_path") if has_file_source else F.lit(None).cast("string")
        else:
            col = F.expr(expr)
        df = df.withColumn(name, col)
    return df


def project_expression(expr: str) -> str:
    """Translate a project-config metadata expression into SQL.

    lhp.yaml expressions in the reference are PYTHON snippets destined for
    generated code (``F.col('_metadata.file_path')``,
    ``F.current_timestamp()``); this engine evaluates SQL via F.expr. Plain
    SQL passes through verbatim; the common pyspark forms translate;
    anything else is refused loudly (a silently-dropped audit column is
    worse than a validate-time error).
    """
    import re

    from lakehouse_plumber_spark.models import SpecError

    e = expr.strip()
    if not e.startswith("F."):
        return e
    m = re.fullmatch(r"F\.col\(\s*['\"]([^'\"]+)['\"]\s*\)", e)
    if m:
        return m.group(1)
    m = re.fullmatch(r"F\.lit\(\s*(.+?)\s*\)", e)
    if m:
        return m.group(1)
    m = re.fullmatch(r"F\.(\w+)\(\s*\)", e)
    if m:
        return f"{m.group(1)}()"
    raise SpecError(
        f"unsupported operational_metadata expression {expr!r}: use a SQL "
        "expression, or one of the F.col('...')/F.lit(...)/F.<fn>() forms"
    )
