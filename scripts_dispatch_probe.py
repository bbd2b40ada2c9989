"""Host-state probe: task-dispatch latency vs raw CPU speed (round 14).

Separates the two host-degradation modes this box exhibits:
- raw CPU speed: `range(1e9).count()` — 32 fat whole-stage-codegen tasks,
  ~0.17 s when healthy;
- scheduling latency: a job of 3200 near-empty tasks (~0.1-0.3 ms/task
  healthy => <1 s) and a 32-empty-task job (per-job fixed overhead,
  tens of ms healthy).

Round-14 finding (BASELINE.md): CPU at quiet speed while dispatch read
~1.0-1.7 ms/task and ~0.2 s/job — the profile that inflates many-jobs /
tiny-task query shapes (streaming micro-batches, sub-second multi-stage
aggs) 1.6-2.1x while leaving q1-class scan-aggs at their quiet level.
Usage: python scripts_dispatch_probe.py   (prints one JSON line)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_plumber_spark import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("dispatch_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).repartition(10).count()
    spark.range(10_000_000).count()
    res: dict[str, list[float]] = {}
    for _ in range(3):
        t0 = time.time(); spark.range(1_000_000_000).count()
        res.setdefault("cpu_1e9_count", []).append(time.time() - t0)
        t0 = time.time(); spark.range(3200).repartition(3200).count()
        res.setdefault("dispatch_3200_tasks", []).append(time.time() - t0)
        t0 = time.time(); spark.range(32).repartition(32).count()
        res.setdefault("dispatch_32_tasks", []).append(time.time() - t0)
    out = {k: round(min(v), 3) for k, v in res.items()}
    out["per_task_ms"] = round(
        (out["dispatch_3200_tasks"] - out["dispatch_32_tasks"]) / 3168 * 1000, 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
