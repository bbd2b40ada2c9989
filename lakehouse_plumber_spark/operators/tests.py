"""The nine data-quality test operators. Reference inventory: SURVEY §2.4
(shared scaffolding src/lhp/generators/test/_base.py:22-96).

Each executor returns a *violation DataFrame* (rows that break the assertion);
`on_violation: fail` raises when it is non-empty, `warn` logs. The violation
frame is also registered under the action's target view so it can be persisted
like the reference's `dp.table(temporary=True)` outputs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_plumber_spark.context import BuildContext
from lakehouse_plumber_spark.models import Action, ViolationAction


class DataQualityTestFailed(AssertionError):
    pass


def _enforce(ctx: BuildContext, action: Action, violations: DataFrame) -> DataFrame:
    reporting = getattr(ctx.flowgroup, "test_reporting", None) or ctx.test_reporting_default
    # a full count is only paid when a reporter consumes it; the gate itself
    # needs just existence (limit(1))
    n = violations.count() if reporting else violations.limit(1).count()
    ctx.log(action.name, "test_evaluated", violations_found=bool(n))
    if reporting:
        from datetime import datetime, timezone

        # one row per test action, shaped like the reference hook's
        # flow_progress extraction (hook.py.j2:46-84)
        ctx.test_results.append(
            {
                "test_id": action.name,
                "flow_name": ctx.flowgroup.flowgroup,
                "expectation_name": action.sub_type or "test",
                "passed_records": None,  # violation-frame tests have no pass count
                "failed_records": int(n),
                "status": "PASS" if n == 0 else "FAIL",
                "collected_at": datetime.now(timezone.utc).isoformat(),
            }
        )
    if n and action.on_violation == ViolationAction.FAIL:
        sample = [r.asDict(recursive=True) for r in violations.limit(5).collect()]
        raise DataQualityTestFailed(f"test {action.name!r} failed; sample violations: {sample}")
    return violations


def _src(action: Action) -> dict[str, Any]:
    return dict(action.source) if isinstance(action.source, dict) else {"source": action.source}


def test_row_count(ctx: BuildContext, action: Action) -> DataFrame:
    """abs(count(source) - count(target)) <= tolerance (reference test/row_count.py)."""
    s = _src(action)
    a = ctx.resolve_view(s["source"]).agg(F.count(F.lit(1)).alias("source_count"))
    b = ctx.resolve_view(s["target"] if "target" in s else s["reference"]).agg(
        F.count(F.lit(1)).alias("target_count")
    )
    tol = int(s.get("tolerance", 0))
    probe = a.crossJoin(b).withColumn("tolerance", F.lit(tol))
    violations = probe.filter(
        F.abs(F.col("source_count") - F.col("target_count")) > F.col("tolerance")
    )
    return _enforce(ctx, action, violations)


def test_uniqueness(ctx: BuildContext, action: Action) -> DataFrame:
    """GROUP BY cols HAVING COUNT(*)>1 (reference test/uniqueness.py)."""
    s = _src(action)
    cols = s["columns"] if isinstance(s.get("columns"), list) else [s.get("columns") or s.get("column")]
    df = ctx.resolve_view(s["source"])
    if s.get("filter"):
        df = df.filter(s["filter"])
    violations = (
        df.groupBy(*cols).agg(F.count(F.lit(1)).alias("duplicate_count")).filter("duplicate_count > 1")
    )
    return _enforce(ctx, action, violations)


def test_referential_integrity(ctx: BuildContext, action: Action) -> DataFrame:
    """Orphan detection via left anti join (reference test/referential_integrity.py)."""
    s = _src(action)
    src_cols = s["source_columns"]
    ref_cols = s.get("reference_columns", src_cols)
    src = ctx.resolve_view(s["source"])
    ref = ctx.resolve_view(s["reference"])
    cond = [src[a].eqNullSafe(ref[b]) for a, b in zip(src_cols, ref_cols)]
    violations = src.join(ref, on=cond, how="left_anti")
    return _enforce(ctx, action, violations)


def test_completeness(ctx: BuildContext, action: Action) -> DataFrame:
    """required columns all non-null (reference test/completeness.py)."""
    s = _src(action)
    required = s["required_columns"]
    df = ctx.resolve_view(s["source"])
    pred = None
    for c in required:
        clause = F.col(c).isNull()
        pred = clause if pred is None else (pred | clause)
    return _enforce(ctx, action, df.filter(pred))


def test_range(ctx: BuildContext, action: Action) -> DataFrame:
    """col between min and max (reference test/range.py)."""
    s = _src(action)
    col = F.col(s["column"])
    pred = F.lit(False)
    if "min_value" in s:
        pred = pred | (col < F.lit(s["min_value"]))
    if "max_value" in s:
        pred = pred | (col > F.lit(s["max_value"]))
    df = ctx.resolve_view(s["source"])
    return _enforce(ctx, action, df.filter(pred | col.isNull()))


def test_schema_match(ctx: BuildContext, action: Action) -> DataFrame:
    """Compare schemas of source vs reference (reference test/schema_match.py;
    implemented against df.schema — information_schema isn't guaranteed on OSS)."""
    s = _src(action)
    src = ctx.resolve_view(s["source"]).schema
    ref = ctx.resolve_view(s["reference"]).schema
    rows = []
    src_map = {f.name: f.dataType.simpleString() for f in src.fields}
    ref_map = {f.name: f.dataType.simpleString() for f in ref.fields}
    for name in sorted(set(src_map) | set(ref_map)):
        a, b = src_map.get(name), ref_map.get(name)
        status = "match" if a == b else ("missing_in_source" if a is None else "missing_in_reference" if b is None else "type_mismatch")
        if status != "match":
            rows.append((name, a, b, status))
    violations = ctx.spark.createDataFrame(
        rows, "column_name string, source_type string, reference_type string, status string"
    )
    return _enforce(ctx, action, violations)


def test_all_lookups_found(ctx: BuildContext, action: Action) -> DataFrame:
    """Left anti join against a lookup table (reference test/all_lookups_found.py)."""
    s = _src(action)
    src = ctx.resolve_view(s["source"])
    lookup = ctx.resolve_view(s["lookup_table"])
    lcols = s["lookup_columns"]
    rcols = s.get("lookup_result_columns") or lcols
    cond = [src[a].eqNullSafe(lookup[b]) for a, b in zip(lcols, rcols)]
    violations = src.join(lookup, on=cond, how="left_anti")
    return _enforce(ctx, action, violations)


def test_custom_sql(ctx: BuildContext, action: Action) -> DataFrame:
    """Arbitrary SQL returning violation rows (reference test/custom_sql.py)."""
    query = action.sql or _src(action).get("sql")
    if not query and action.sql_path:
        with open(ctx.resolve_path(action.sql_path)) as f:
            query = f.read()
    violations = ctx.spark.sql(query)
    return _enforce(ctx, action, violations)


def test_custom_expectations(ctx: BuildContext, action: Action) -> DataFrame:
    """User expectations over SELECT * FROM source (reference test/custom_expectations.py)."""
    from lakehouse_plumber_spark.expectations import parse_expectations

    s = _src(action)
    df = ctx.resolve_view(s["source"])
    exps = parse_expectations(action.expectations_inline or s.get("expectations"))
    pred = None
    for e in exps:
        clause = ~F.coalesce(F.expr(e.constraint), F.lit(False))
        pred = clause if pred is None else (pred | clause)
    return _enforce(ctx, action, df.filter(pred))
