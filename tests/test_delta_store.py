"""DeltaTableStore semantics — runs only where delta-spark is installed.

This sandbox image has no delta-spark on the classpath, so every test here
SKIPS locally (pytest.importorskip). On a Delta-enabled cluster the module
asserts that the Delta store honors the exact contract the parquet store's
tests pin (tests/test_tables.py): same logical semantics, native mechanisms
(transactional overwrite, dynamic partition overwrite, OPTIMIZE with
dataChange=false, DeltaTable.merge, CDF-schema change feed, DELETE-based
retention).
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip("delta", reason="delta-spark not installed on this image")

from pyspark.sql import SparkSession, functions as F

from lakehouse_plumber_spark.tables import DeltaTableStore, new_store


@pytest.fixture(scope="module")
def dspark():
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-store-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


@pytest.fixture()
def dstore(dspark, tmp_path):
    return DeltaTableStore(spark=dspark, root=str(tmp_path))


def test_new_store_selects_delta_when_session_ready(dspark, tmp_path):
    st = new_store(dspark, str(tmp_path))
    assert isinstance(st, DeltaTableStore)


def test_append_overwrite_roundtrip(dspark, dstore):
    t = "m.s.t"
    df = dspark.range(0, 10).withColumn("v", F.lit(1))
    dstore.append(t, df)
    dstore.append(t, df)
    assert dstore.exists(t)
    assert dstore.read(t).count() == 20
    # transactional overwrite, including down to zero rows (schema survives
    # in the commit log — the parquet store needs an empty-footer rewrite)
    dstore.overwrite(t, df.limit(0))
    assert dstore.read(t).count() == 0
    assert [f.name for f in dstore.read(t).schema.fields] == ["id", "v"]


def test_overwrite_partitions_touches_only_present_partitions(dspark, dstore):
    t = "m.s.p"
    base = dspark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id INT, part STRING, v INT"
    )
    dstore.overwrite(t, base, partition_columns=["part"])
    patch = dspark.createDataFrame([(9, "a", 99)], "id INT, part STRING, v INT")
    dstore.overwrite_partitions(t, patch, ["part"])
    rows = {(r.id, r.part) for r in dstore.read(t).collect()}
    assert rows == {(9, "a"), (3, "b")}  # partition b untouched


def test_merge_keyed_upsert_and_delete(dspark, dstore):
    t = "m.s.merge"
    dstore.append(
        t, dspark.createDataFrame([(1, "x"), (2, "y")], "id INT, v STRING")
    )
    updates = dspark.createDataFrame(
        [(2, "y2"), (3, "z"), (1, "DELETE")], "id INT, v STRING"
    )
    dstore.merge_keyed(t, updates, keys=["id"], delete_on="s.v = 'DELETE'")
    rows = {(r.id, r.v) for r in dstore.read(t).collect()}
    assert rows == {(2, "y2"), (3, "z")}


def test_change_feed_roundtrip_and_prune(dspark, dstore):
    t = "m.s.cdf"
    df = dspark.range(0, 5).withColumn("v", F.lit(1))
    dstore.append(t, df)
    v0 = dstore.log_changes(t, df.limit(3), "insert")
    v1 = dstore.log_changes(t, df.limit(2), "update_postimage")
    assert v1 == v0 + 1
    # CDF-schema columns present; version-bounded read prunes to one commit
    chg = dstore.read_changes(t, starting_version=v1)
    assert set(chg.columns) >= {"_change_type", "_commit_version", "_commit_timestamp"}
    assert chg.count() == 2
    # transactional retention: pruning the first commit leaves the second
    assert dstore.prune_changes(t, v0) == 1
    left = dstore.read_changes(t).select("_commit_version").distinct().collect()
    assert [r[0] for r in left] == [v1]
    dstore.prune_changes(t, v1)
    assert not dstore.has_changes(t)


def test_compact_keeps_streaming_consumers_valid(dspark, dstore, tmp_path):
    """OPTIMIZE is dataChange=false: a table already consumed as a stream is
    compacted WITHOUT the parquet store's refusal, and a checkpointed
    streaming read afterwards ingests nothing new."""
    t = "m.s.opt"
    df = dspark.range(0, 100).withColumn("v", F.lit(1))
    for _ in range(4):
        dstore.append(t, df)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (
        dstore.read_stream(t)
        .writeStream.format("delta")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
        .awaitTermination()
    )
    n0 = dspark.read.format("delta").load(out).count()
    res = dstore.compact(t)  # no force= needed, unlike the parquet store
    assert res["files_after"] <= res["files_before"]
    (
        dstore.read_stream(t)
        .writeStream.format("delta")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
        .awaitTermination()
    )
    assert dspark.read.format("delta").load(out).count() == n0


def test_read_table_changes_from_real_cdf(dspark, dstore):
    t = "m.s.realcdf"
    df = dspark.range(0, 3).withColumn("v", F.lit(1))
    dstore.append(t, df)
    dspark.sql(
        f"ALTER TABLE delta.`{dstore.path(t)}` "
        "SET TBLPROPERTIES (delta.enableChangeDataFeed = true)"
    )
    dstore.merge_keyed(
        t,
        dspark.createDataFrame([(0, 9), (7, 7)], "id LONG, v INT"),
        keys=["id"],
    )
    chg = dstore.read_table_changes(t, starting_version=2)
    types = {r["_change_type"] for r in chg.select("_change_type").collect()}
    assert "insert" in types and {"update_preimage", "update_postimage"} <= types
