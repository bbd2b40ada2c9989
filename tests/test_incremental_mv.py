"""Incremental MV maintenance: multi-batch merge == full recompute; bucketed
state is pruned (untouched buckets not rewritten); non-mergeable aggregates
rejected at spec-validation time."""

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_plumber_spark.models import IncrementalConfig
from lakehouse_plumber_spark.operators.incremental import (
    BUCKET_COL,
    finalize_incremental,
    incremental_update,
    parse_aggs,
)
from lakehouse_plumber_spark.tables import new_store

AGGS = {
    "n": "count(*)",
    "total": "sum(CAST(v AS DECIMAL(18,6)))",
    "lo": "min(v)",
    "hi": "max(v)",
    "mean": "avg(v)",
}


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def test_multi_batch_equals_full_recompute(spark):
    store = new_store(spark)
    batches = [
        [("a", 1.0), ("a", 2.0), ("b", 10.0)],
        [("a", 3.0), ("c", 5.0)],
        [("b", -1.0), ("c", 0.5), ("a", 4.0)],
    ]
    for b in batches:
        incremental_update(store, "t.state", _mk(spark, b), ["k"], AGGS)
    finalize_incremental(store, "t.mv", "t.state", ["k"], AGGS)

    full = (
        _mk(spark, [r for b in batches for r in b])
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(v AS DECIMAL(18,6))")).alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("mean"),
        )
    )
    got = {r.k: r for r in store.read("t.mv").collect()}
    want = {r.k: r for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].n == want[k].n
        assert got[k].total == want[k].total
        assert got[k].lo == want[k].lo and got[k].hi == want[k].hi
        assert abs(float(got[k].mean) - want[k].mean) < 1e-9


def test_bucket_pruning_leaves_untouched_partitions(spark):
    store = new_store(spark)
    incremental_update(store, "t.state", _mk(spark, [("a", 1.0), ("b", 2.0)]), ["k"], AGGS)
    path = store.path("t.state")
    parts = sorted(d for d in os.listdir(path) if d.startswith(f"{BUCKET_COL}="))
    assert len(parts) == 2
    mtimes = {d: os.path.getmtime(os.path.join(path, d)) for d in parts}

    # second batch touches only key "a" -> only a's bucket dir rewritten
    incremental_update(store, "t.state", _mk(spark, [("a", 5.0)]), ["k"], AGGS)
    parts2 = sorted(d for d in os.listdir(path) if d.startswith(f"{BUCKET_COL}="))
    assert parts2 == parts
    changed = [d for d in parts if os.path.getmtime(os.path.join(path, d)) != mtimes[d]]
    assert len(changed) == 1


def test_non_mergeable_aggregates_rejected():
    with pytest.raises(ValueError, match="mergeable"):
        parse_aggs({"bad": "median(v)"})
    with pytest.raises(ValueError, match="mergeable"):
        IncrementalConfig(group_by=["k"], aggs={"bad": "count_distinct(v)"})
    # and via the spec layer
    with pytest.raises(ValueError):
        IncrementalConfig(group_by=[], aggs={"n": "count(*)"})
