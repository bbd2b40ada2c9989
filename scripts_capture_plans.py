"""Capture .explain("formatted") for benched queries into plans/$LHP_PLANS_DIR (default r15).

Usage: python scripts_capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes plans/r14/<query>_<suffix>.txt)
  query:  optional subset; default = HEADLINE + EXTENDED from bench.py

Notes: for the pipe_* entries the query function executes the pipeline and
returns the result table read — the captured plan is the plan of the
RETURNED DataFrame (what the bench times with .count() includes the
pipeline run; the returned-read plan is still the contracted output).
Explain itself is driver-side analysis; non-pipe queries execute nothing.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import EXTENDED, HEADLINE  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + EXTENDED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from lakehouse_plumber_spark import get_spark, register_testdata

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf_dir)
    entry.warm(spark, sf_dir)
    qs = entry.queries()

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", os.environ.get("LHP_PLANS_DIR", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
