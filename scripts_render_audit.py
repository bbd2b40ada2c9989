"""Rendering-proof audit (VERDICT r10 item #2): for every registry entry,
compare Spark vs DuckDB under a DRIVER-FAITHFUL strict stringify — str(v)
per cell with NO Decimal->float normalization — in addition to the sweep's
numeric canon.  A row that passes numeric but fails strict is exactly the
text_quality_model bug class (trailing-zero DECIMAL renderings etc.).

Usage: python scripts_render_audit.py [sf_dir]  -> prints one line per entry.
"""
from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

from tests.oracle_harness import duck_connection, canonicalize
import math


def canon_strict(df) -> list[tuple]:
    """Driver-faithful: sort columns by name, stringify each cell with str()
    (None->'NULL', bytes->hex, bool->'0'/'1', NaN->'NaN'), sort rows."""
    cols = sorted(df.columns)

    def cv(v):
        if v is None:
            return "NULL"
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted(
        tuple(cv(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("render-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    con = duck_connection(sf_dir)
    n_strict_only = 0
    for name, fn in q.items():
        sql = o.get(name)
        if sql is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
            duck_pd = con.execute(sql).fetchdf()
            num_ok = canonicalize(spark_pd) == canonicalize(duck_pd)
            strict_ok = canon_strict(spark_pd) == canon_strict(duck_pd)
            dtypes = {
                c: str(spark_pd[c].dtype) for c in spark_pd.columns
            }
            has_num = any(
                d.startswith("float") or d == "object" for d in dtypes.values()
            )
            tag = "OK"
            if num_ok and not strict_ok:
                tag = "STRICT-ONLY-FAIL"
                n_strict_only += 1
                a = canon_strict(spark_pd)
                b = canon_strict(duck_pd)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:2]
                print(f"{name}: {tag} diffs={diffs}")
                continue
            if not num_ok:
                tag = "NUMERIC-FAIL"
            print(f"{name}: {tag}" + (" (float/obj cols)" if has_num and tag == "OK" else ""))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            traceback.print_exc(limit=2)
    print(f"TOTAL strict-only fails: {n_strict_only}")


if __name__ == "__main__":
    main()
