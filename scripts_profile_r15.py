"""Per-query job profiler (r15): run a declared query warm, then once under a
job group, and print each job's duration/description from the Spark UI REST API.

Usage: python scripts_profile_r15.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from lakehouse_plumber_spark import get_spark, register_testdata

    spark = get_spark("profile_r15", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for df in register_testdata(spark, sf_dir).values():
        df.limit(1).count()
    entry.warm(spark, sf_dir)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(t_ms: float) -> list[dict]:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            js = json.load(r)
        out = []
        for j in js:
            # submissionTime like '2026-08-17T21:00:00.000GMT'
            st = j.get("submissionTime", "")
            try:
                ts = time.mktime(time.strptime(st[:19], "%Y-%m-%dT%H:%M:%S"))
            except ValueError:
                continue
            if ts * 1000 >= t_ms - 1500:
                out.append(j)
        return sorted(out, key=lambda j: j["jobId"])

    for name in sys.argv[1:]:
        fn = qs[name]
        # warm run (codegen/JIT), twice for streaming shapes
        fn(spark, sf_dir).count()
        fn(spark, sf_dir).count()
        t0 = time.time()
        t0_ms = t0 * 1000
        fn(spark, sf_dir).count()
        wall = time.time() - t0
        time.sleep(0.5)
        js = jobs_after(t0_ms)
        print(f"\n=== {name}: wall {wall:.3f}s, {len(js)} jobs ===")
        for j in js:
            dur = "?"
            if j.get("completionTime") and j.get("submissionTime"):
                fmt = "%Y-%m-%dT%H:%M:%S.%f"
                try:
                    from datetime import datetime

                    s = datetime.strptime(j["submissionTime"][:23], fmt)
                    e = datetime.strptime(j["completionTime"][:23], fmt)
                    dur = f"{(e - s).total_seconds():.3f}s"
                except Exception:
                    dur = "?"
            desc = (j.get("description") or j.get("name") or "")[:110]
            print(f"  job {j['jobId']:>5} {dur:>9} tasks={j.get('numTasks', '?'):>5} {desc}")
            for sid in sorted(j.get("stageIds", [])):
                try:
                    with urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
                    ) as r:
                        sts = json.load(r)
                except Exception:
                    continue
                for st in sts:
                    if st.get("status") == "SKIPPED":
                        continue
                    nm = (st.get("name") or "")[:90]
                    print(
                        f"      stage {sid:>5} {st.get('status','?'):>9} "
                        f"tasks={st.get('numCompleteTasks','?'):>5} "
                        f"exec={st.get('executorRunTime','?'):>6}ms "
                        f"in={st.get('inputBytes',0)>>20}MB sh_r={st.get('shuffleReadBytes',0)>>20}MB {nm}"
                    )


if __name__ == "__main__":
    main()
