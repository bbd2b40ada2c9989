"""Salted join / two-phase agg equivalence with the plain operations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_plumber_spark.skew import salted_join, two_phase_agg


def test_salted_join_matches_plain(spark):
    # one hot key (90% of rows) + tail
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], "k long, label string")
    plain = big.join(small, on=["k"]).groupBy("label").count()
    salted = salted_join(big, small, on=["k"]).groupBy("label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"), F.min("v").alias("min_v"), F.max("v").alias("max_v")
    )
    twop = two_phase_agg(df, ["k"], {"v": "sum"}).join(
        two_phase_agg(df, ["k"], {"v": "min"}), "k"
    ).join(two_phase_agg(df, ["k"], {"v": "max"}), "k")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, twop.select("k", "sum_v", "min_v", "max_v").collect()))
    assert a == b


def test_two_phase_agg_rejects_nonalgebraic(spark):
    df = spark.range(10).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        two_phase_agg(df, ["k"], {"v": "avg"})
