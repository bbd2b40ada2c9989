"""materialize_once: the configurable eager-materialization backend behind
every operator-level single-evaluation site (r15, VERDICT r14 item #2).

Contract under test:
- all three modes produce identical operator output (parity);
- persist mode keeps lineage (InMemoryTableScan, no severed-RDD scan) while
  still evaluating eagerly (consumers read the cache, not the plan);
- pin_lineage callers NEVER get a lineage-preserving frame in persist mode
  (mutation protection: their plans read tables the caller then rewrites);
- checkpoint mode without a configured directory fails loudly by name.
"""

import pytest
from pyspark.sql import functions as F

from lakehouse_plumber_spark.materialize import (
    DIR_CONF,
    MODE_CONF,
    materialize_once,
    materialize_pinned,
)


@pytest.fixture()
def mode(spark, request):
    spark.conf.set(MODE_CONF, request.param)
    if request.param == "checkpoint":
        spark.conf.set(DIR_CONF, "/tmp/lhp_ckpt_tests")
    yield request.param
    spark.conf.set(MODE_CONF, "localCheckpoint")


def test_checkpoint_mode_requires_dir(spark, testdata):
    spark.conf.set(MODE_CONF, "checkpoint")
    spark.conf.unset(DIR_CONF)
    try:
        if not spark.sparkContext._jsc.sc().checkpointDir().isEmpty():
            pytest.skip("session already has a checkpoint dir")
        with pytest.raises(ValueError, match=DIR_CONF.replace(".", r"\.")):
            materialize_once(spark.table("documents").select("doc_id"))
    finally:
        spark.conf.set(MODE_CONF, "localCheckpoint")


@pytest.mark.parametrize("mode", ["localCheckpoint", "persist", "checkpoint"], indirect=True)
def test_operator_parity_across_modes(spark, testdata, mode):
    import lakehouse_plumber_spark.llm.dedup as D

    docs = spark.table("documents")
    got = sorted(map(tuple, D.minhash_lsh_dedup(docs).collect()))
    spark.conf.set(MODE_CONF, "localCheckpoint")
    ref = sorted(map(tuple, D.minhash_lsh_dedup(docs).collect()))
    assert got == ref and len(ref) > 0


def test_persist_mode_keeps_lineage_and_evaluates_eagerly(spark, testdata):
    spark.conf.set(MODE_CONF, "persist")
    try:
        df = spark.table("documents").select("doc_id").withColumn("h", F.xxhash64("doc_id"))
        out = materialize_once(df)
        # eager: the cache is already filled (no job needed to read it)
        stored = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in stored
        # lineage preserved: the cached plan still shows the source relation,
        # never a severed ExistingRDD leaf
        assert "ExistingRDD" not in stored
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        spark.conf.set(MODE_CONF, "localCheckpoint")


def test_pin_lineage_severs_even_in_persist_mode(spark, testdata):
    spark.conf.set(MODE_CONF, "persist")
    try:
        df = spark.table("documents").select("doc_id")
        out = materialize_pinned(df)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan or "ExistingRDD" in plan
        assert "InMemoryRelation" not in plan
    finally:
        spark.conf.set(MODE_CONF, "localCheckpoint")


def test_streaming_input_rejected_by_name(spark, testdata, tmp_path):
    """A streaming frame cannot be evaluated eagerly; the guard must name the
    contract instead of surfacing the backend's opaque AnalysisException
    (ADVICE r14 item 1, closed for all materialize_once call sites at once)."""
    src = str(tmp_path / "stream_src")
    spark.table("documents").select("doc_id").limit(5).write.parquet(src)
    stream = spark.readStream.schema("doc_id long").parquet(src)
    with pytest.raises(ValueError, match="batch DataFrame"):
        materialize_once(stream)
    with pytest.raises(ValueError, match="foreachBatch"):
        materialize_pinned(stream)


def test_unknown_mode_rejected(spark, testdata):
    spark.conf.set(MODE_CONF, "cache")
    try:
        with pytest.raises(ValueError, match="cache"):
            materialize_once(spark.table("documents").select("doc_id"))
    finally:
        spark.conf.set(MODE_CONF, "localCheckpoint")
