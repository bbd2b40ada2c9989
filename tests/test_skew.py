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


def test_bloom_filtered_join_equals_plain_join(spark):
    """The bitmap only PRE-filters: output must equal the plain inner join
    exactly, false positives included-then-eliminated."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.skew import bloom_filtered_join

    big = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("payload")
    )
    small = spark.range(100).select(
        (F.col("id") * 37).alias("k"), F.lit("dim").alias("tag")
    )
    got = sorted(tuple(r) for r in bloom_filtered_join(big, small, ["k"]).collect())
    want = sorted(tuple(r) for r in big.join(small, ["k"]).collect())
    assert got == want and len(want) > 0
    # left_semi variant
    semi = sorted(r.k for r in bloom_filtered_join(big, small, ["k"], how="left_semi").collect())
    assert semi == sorted(r.k for r in big.join(small, ["k"], "left_semi").collect())


def test_bloom_filtered_join_prefilters_before_exchange(spark):
    """Plan shape: the big side carries the bitmap Filter below the join's
    exchange, so shuffle input is match-rate-sized."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.skew import bloom_filtered_join

    big = spark.range(50_000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    small = spark.range(50).select((F.col("id") * 997).alias("k"))
    out = bloom_filtered_join(big, small, ["k"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "element_at" in plan  # the bitmap test is in the plan as a filter
    # exact count preserved
    assert out.count() == 50


def test_bloom_filtered_join_validation(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.skew import bloom_filtered_join

    df = spark.range(10).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="left_semi"):
        bloom_filtered_join(df, df, ["k"], how="left")
    with _pytest.raises(ValueError, match="m_bits"):
        bloom_filtered_join(df, df, ["k"], m_bits=1000)
    with _pytest.raises(ValueError, match="k_hashes"):
        bloom_filtered_join(df, df, ["k"], k_hashes=0)
