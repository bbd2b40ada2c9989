"""KMV sketch, document chunking, and BM25 retrieval unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_plumber_spark.llm.search import bm25_topk
from lakehouse_plumber_spark.llm.sketches import (
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from lakehouse_plumber_spark.llm.text import chunk_documents


# --------------------------------------------------------------------------
# KMV sketch
# --------------------------------------------------------------------------


def _values_df(spark, n, groups=2):
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("g"),
        # duplicate every value 3x so distinct != row count
        (F.col("id") % (n // 3 + 1)).alias("v"),
    )


def test_kmv_exact_below_k(spark):
    df = _values_df(spark, 90, groups=1)  # 31 distinct values
    out = kmv_distinct(df, "g", "v", k=64).collect()
    assert len(out) == 1
    row = out[0]
    exact = df.select("v").distinct().count()
    assert row.n_mins == exact
    assert row.est_distinct == exact


def test_kmv_estimate_within_error_bound(spark):
    # 10k distinct values, k=256 -> relative error concentrated around
    # 1/sqrt(k-2) ~ 6.3%; assert a generous 4-sigma band
    df = spark.range(10_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    row = kmv_distinct(df, "g", "v", k=256).collect()[0]
    assert row.n_mins == 256
    assert abs(row.est_distinct - 10_000) / 10_000 < 0.25


def test_kmv_merge_equals_sketch_of_union(spark):
    df = spark.range(5_000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    a = df.where("v % 2 = 0")
    b = df.where("v % 2 = 1")
    merged = kmv_merge(kmv_sketch(a, "g", "v", k=32), kmv_sketch(b, "g", "v", k=32), k=32)
    direct = kmv_sketch(df, "g", "v", k=32)
    lhs = {r.stratum: r.mins for r in merged.collect()}
    rhs = {r.stratum: r.mins for r in direct.collect()}
    assert lhs == rhs
    # estimates therefore agree too
    est_m = {r.stratum: r.est_distinct for r in kmv_estimate(merged, k=32).collect()}
    est_d = {r.stratum: r.est_distinct for r in kmv_estimate(direct, k=32).collect()}
    assert est_m == est_d


def test_kmv_fanout_invariance(spark):
    df = spark.range(2_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    a = kmv_sketch(df, "g", "v", k=16, fanout=4).collect()[0].mins
    b = kmv_sketch(df, "g", "v", k=16, fanout=128).collect()[0].mins
    assert a == b


def test_kmv_ignores_nulls_and_rejects_tiny_k(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2)], "g string, v int"
    )
    row = kmv_distinct(df, "g", "v", k=8).collect()[0]
    assert row.n_mins == 2 and row.est_distinct == 2
    with pytest.raises(ValueError):
        kmv_sketch(df, "g", "v", k=1)


# --------------------------------------------------------------------------
# chunking
# --------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c")]), chunk_tokens=8, stride=4
    ).collect()
    assert len(out) == 1
    assert out[0].chunk_idx == 0
    assert out[0].n_chunk_tokens == 3
    assert out[0].chunk_text == "a b c"


def test_chunk_empty_and_null_docs_dropped(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, None), (3, "   "), (4, "x")]),
        chunk_tokens=4,
        stride=2,
    ).collect()
    assert [r.doc_id for r in out] == [4]


def test_chunk_windows_cover_all_tokens_in_order(spark):
    toks = [f"t{i}" for i in range(23)]
    out = chunk_documents(
        _docs(spark, [(7, " ".join(toks))]), chunk_tokens=8, stride=5
    ).collect()
    out.sort(key=lambda r: r.chunk_idx)
    # ceil((23-8)/5)+1 = 4 chunks
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    for r in out:
        start = r.chunk_idx * 5
        expect = toks[start : start + 8]
        assert r.chunk_text.split(" ") == expect
        assert r.n_chunk_tokens == len(expect)
    # every token appears in some chunk
    seen = set()
    for r in out:
        seen.update(r.chunk_text.split(" "))
    assert seen == set(toks)


def test_chunk_rejects_bad_stride(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=0, stride=0)


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def test_bm25_ranks_matching_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark fast engine"),
            (2, "spark is ok"),
            (3, "nothing relevant here at all"),
            (4, "pandas pandas pandas"),
        ],
    )
    out = bm25_topk(docs, ["spark"], k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]  # only matching docs, tf order
    assert [r.rank for r in out] == [1, 2]
    assert out[0].score > out[1].score > 0
    assert out[0].n_terms_hit == 1


def test_bm25_multi_term_and_length_normalization(spark):
    # same tf, shorter doc should win under b>0 length normalization
    docs = _docs(
        spark,
        [
            (1, "alpha beta"),
            (2, "alpha beta " + " ".join(["filler"] * 50)),
        ],
    )
    out = bm25_topk(docs, ["alpha", "beta"], k=5).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].n_terms_hit == 2 and out[1].n_terms_hit == 2


def test_bm25_postings_escapes_backslash_and_quote_terms(spark):
    """r14 regression: the postings plan embeds query terms as Spark SQL
    string literals in its pre-filter; a term containing a backslash was
    silently dropped (Spark literal parsing ate the backslash) and a
    trailing backslash raised ParseException.  Both plans must agree on
    such terms — the unrolled plan's escaping (_spark_str_lit) is the
    reference."""
    from lakehouse_plumber_spark.llm.search import bm25_topk_postings

    docs = _docs(
        spark,
        [
            (1, "see \\alpha beta"),
            (2, "beta beta gamma"),
            (3, "it's o'clock beta"),
            (4, "trailing\\ token"),
        ],
    )
    for terms in (["\\alpha", "gamma"], ["o'clock"], ["trailing\\"]):
        unrolled = bm25_topk(docs, terms, k=10).collect()
        postings = bm25_topk_postings(docs, terms, k=10).collect()
        assert unrolled == postings, terms
        assert unrolled, terms  # the odd terms really do match documents


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(1, "a")]), [])


# --------------------------------------------------------------------------
# weighted Poisson sampling
# --------------------------------------------------------------------------


def test_weighted_poisson_expected_size_and_monotone_weights(spark):
    from lakehouse_plumber_spark.llm.sampling import weighted_poisson_sample

    df = spark.range(4000).selectExpr(
        "id AS doc_id", "CAST(1 + id % 10 AS DOUBLE) AS w"
    )
    out = weighted_poisson_sample(df, "w", target_fraction=0.25, id_col="doc_id")
    rows = out.collect()
    # expected size 1000; 4-sigma band on a Poisson-binomial
    assert 800 < len(rows) < 1200
    # higher weight -> higher empirical inclusion rate at the extremes
    kept = {r.doc_id for r in rows}
    lo = sum(1 for i in range(4000) if i % 10 == 0 and i in kept)
    hi = sum(1 for i in range(4000) if i % 10 == 9 and i in kept)
    assert hi > lo
    # include_prob matches the formula for a kept row
    r0 = rows[0]
    w0 = 1 + r0.doc_id % 10
    expect = min(1.0, 0.25 * 4000 * w0 / sum(1 + i % 10 for i in range(4000)))
    assert abs(r0.include_prob - expect) < 1e-6


def test_weighted_poisson_deterministic_and_validates(spark):
    from lakehouse_plumber_spark.llm.sampling import weighted_poisson_sample

    df = spark.range(500).selectExpr("id AS doc_id", "CAST(id AS DOUBLE) + 1 AS w")
    a = sorted(r.doc_id for r in weighted_poisson_sample(df, "w", 0.5).collect())
    b = sorted(
        r.doc_id
        for r in weighted_poisson_sample(df.repartition(7), "w", 0.5).collect()
    )
    assert a == b  # partitioning-invariant
    with pytest.raises(ValueError):
        weighted_poisson_sample(df, "w", 0.0)
    with pytest.raises(ValueError):
        weighted_poisson_sample(
            spark.range(3).selectExpr("id AS doc_id", "CAST(id - 1 AS DOUBLE) AS w"),
            "w",
            0.5,
        ).collect()


# --------------------------------------------------------------------------
# rolling features
# --------------------------------------------------------------------------


def test_rolling_features_leakage_free_frames(spark):
    from lakehouse_plumber_spark.functions.features import rolling_features

    rows = [
        (1, 10, "2024-01-01", 100.0),
        (1, 11, "2024-01-04", 200.0),
        (1, 12, "2024-01-10", 300.0),
        (1, 13, "2024-01-11", 400.0),
        (2, 20, "2024-02-01", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "cust long, oid long, d string, amt double"
    ).selectExpr("cust", "oid", "CAST(d AS TIMESTAMP) AS d", "amt")
    out = {
        r.oid: r
        for r in rolling_features(df, "cust", "d", "oid", "amt", window_rows=2).collect()
    }
    assert out[10].prev_amount is None and out[10].rolling_avg is None
    assert out[10].seq_no == 1 and out[10].lifetime_amount == 0.0
    assert out[11].prev_amount == 100.0 and out[11].rolling_avg == 100.0
    assert out[11].days_since_prev == 3
    # rolling-2 at row 4: mean(200, 300), current row excluded
    assert out[13].rolling_avg == 250.0
    assert out[13].lifetime_amount == 600.0 and out[13].seq_no == 4
    assert out[20].seq_no == 1 and out[20].prev_amount is None
    with pytest.raises(ValueError):
        rolling_features(df, "cust", "d", "oid", "amt", window_rows=0)


def test_kmv_merge_disjoint_strata(spark):
    # a stratum present in only one side must survive the full-outer merge
    # (exercises the coalesce(mins, array()) empty-side branch)
    a = spark.range(100).select(F.lit("only_a").alias("g"), F.col("id").alias("v"))
    b = spark.range(50).select(F.lit("only_b").alias("g"), (F.col("id") + 1000).alias("v"))
    m = kmv_merge(kmv_sketch(a, "g", "v", k=8), kmv_sketch(b, "g", "v", k=8), k=8)
    rows = {r.stratum: r.mins for r in m.collect()}
    assert sorted(rows) == ["only_a", "only_b"]
    assert all(len(v) == 8 for v in rows.values())
    one_sided = {r.stratum: r.mins for r in kmv_sketch(a, "g", "v", k=8).collect()}
    assert rows["only_a"] == one_sided["only_a"]


def test_weighted_poisson_rejects_nan_and_inf(spark):
    from lakehouse_plumber_spark.llm.sampling import weighted_poisson_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, float("inf")), (3, float("nan"))], "doc_id long, w double"
    )
    with pytest.raises(ValueError, match="NaN"):
        weighted_poisson_sample(df, "w", 0.5)
    with pytest.raises(ValueError, match="sums to zero"):
        weighted_poisson_sample(
            spark.createDataFrame([(1, 0.0)], "doc_id long, w double"), "w", 0.5
        )
    # empty input -> empty output, no error
    empty = spark.createDataFrame([], "doc_id long, w double")
    assert weighted_poisson_sample(empty, "w", 0.5).count() == 0


def test_bm25_lowercases_query_terms(spark):
    docs = _docs(spark, [(1, "Spark SPARK engine"), (2, "irrelevant")])
    out = bm25_topk(docs, ["Spark"], k=5).collect()
    assert [r.doc_id for r in out] == [1]
    # and the oracle normalizes identically
    from lakehouse_plumber_spark.llm.search import bm25_topk_duck

    assert "'spark'" in bm25_topk_duck("documents", ["Spark"]) 


# --------------------------------------------------------------------------
# bigram LM filter
# --------------------------------------------------------------------------


def test_bigram_logprob_hand_computed(spark):
    import math

    from lakehouse_plumber_spark.llm.text import bigram_logprob

    docs = _docs(spark, [(1, "a b"), (2, "a b a"), (3, "c")])
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    # uni: a=3 b=2 c=1, V=3; cb: 'a b'=2, 'b a'=1
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (2 + 0.5 * 3)
    assert 3 not in out  # single-token doc has no bigrams
    assert out[1].n_bigrams == 1
    assert abs(out[1].mean_logprob - math.log2(p_ab)) < 1e-5
    assert out[2].n_bigrams == 2
    expect2 = (math.log2(p_ab) + math.log2(p_ba)) / 2
    assert abs(out[2].mean_logprob - expect2) < 1e-5


def test_bigram_logprob_flags_gibberish_below_natural(spark):
    from lakehouse_plumber_spark.llm.text import bigram_logprob

    natural = "the cat sat on the mat and the cat ran to the mat"
    docs = _docs(
        spark,
        [(i, natural) for i in range(10)]
        + [(99, "zqx wvu zqx mat cat qqq on wvu the zzz")],
    )
    out = {r.doc_id: r.mean_logprob for r in bigram_logprob(docs).collect()}
    assert out[99] < out[0]  # unseen-bigram doc scores below the natural one


def test_bigram_logprob_empty_corpus_raises(spark):
    from lakehouse_plumber_spark.llm.text import bigram_logprob

    with pytest.raises(ValueError):
        bigram_logprob(_docs(spark, [(1, "   "), (2, None)]))


def test_bm25_dedups_casefolded_terms(spark):
    docs = _docs(spark, [(1, "spark engine"), (2, "spark spark")])
    a = {r.doc_id: r.score for r in bm25_topk(docs, ["Spark", "spark"], k=5).collect()}
    b = {r.doc_id: r.score for r in bm25_topk(docs, ["spark"], k=5).collect()}
    assert a == b


def test_ivfpq_rejects_negative_refine(spark, testdata):
    from lakehouse_plumber_spark.llm import similarity as S

    with pytest.raises(ValueError, match="refine"):
        S.ivfpq_search(spark.table("embeddings"), [0], k=3, refine=-1)


def test_ivfpq_rejects_reserved_marker_id_col(spark, testdata):
    # the r14 single-collect fold marks seed vs query rows with a reserved
    # '__lhp_isq' column; an id column of that name would be silently
    # clobbered by the marker, so it must raise instead
    from lakehouse_plumber_spark.llm import similarity as S

    emb = spark.table("embeddings").withColumnRenamed("vec_id", "__lhp_isq")
    with pytest.raises(ValueError, match="__lhp_isq"):
        S.ivfpq_search(emb, [0], k=3, id_col="__lhp_isq")


# --------------------------------------------------------------------------
# table stats
# --------------------------------------------------------------------------


def test_table_stats_exact_fields_and_ndv_accuracy(spark):
    from lakehouse_plumber_spark.stats import table_stats

    df = spark.range(1000).selectExpr(
        "id",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 37 END AS grp",
        "concat('s', id % 5) AS tag",
    )
    out = {r.col_name: r for r in table_stats(df, ["id", "grp", "tag"], k=64).collect()}
    assert out["id"].n_rows == 1000 and out["id"].n_nulls == 0
    assert out["id"].min_num == 0.0 and out["id"].max_num == 999.0
    # 1000 distinct with k=64: estimate within 4-sigma (~50%)
    assert 500 < out["id"].ndv_est < 2000
    assert out["grp"].n_nulls == 100
    assert out["grp"].ndv_est == 37  # below k -> exact
    assert out["tag"].ndv_est == 5 and out["tag"].min_num is None
    with pytest.raises(ValueError):
        table_stats(df, [])


def test_bm25_postings_plan_equals_unrolled(spark):
    """The postings plan is a pure PLAN change: exact-decimal per-term parts
    make its sum order-independent, so rows, ranks, hits, and scores must be
    identical to bm25_topk at every query width."""
    from lakehouse_plumber_spark.llm.search import bm25_topk, bm25_topk_postings

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(words[j % len(words)] for j in range(i, i + 5 + i % 7)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for q in (["alpha"], words[:4], words):
        a = [tuple(r) for r in bm25_topk(docs, q, k=15).collect()]
        p = [tuple(r) for r in bm25_topk_postings(docs, q, k=15).collect()]
        assert a == p, f"plans diverge at |Q|={len(q)}"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        bm25_topk_postings(docs, [])


def test_bm25_unrolled_width_guard(spark):
    """The unrolled plan refuses post-dedup query widths past the measured
    Catalyst-analysis cliff, pointing at the postings plan."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.search import bm25_topk

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    wide = [f"t{i}" for i in range(13)]
    with _pytest.raises(ValueError, match="postings"):
        bm25_topk(docs, wide)
    # dedup happens before the width check; an override lifts the cap
    assert bm25_topk(docs, ["a"] * 20, k=1).count() == 1
    assert bm25_topk(docs, wide, k=1, max_unrolled_terms=13).count() == 0


def test_cms_overestimates_and_merges(spark):
    """CMS invariants: estimate >= exact count for every value (no false
    negatives in heavy-hitter candidates), and sketch(A) + sketch(B) ==
    sketch(A union-all B) counter-for-counter."""
    from lakehouse_plumber_spark.llm.sketches import (
        cms_heavy_hitters,
        cms_merge,
        cms_sketch,
    )

    rows = [(f"u{i % 7}",) for i in range(200)] + [("hot",)] * 50
    df = spark.createDataFrame(rows, "user string")
    exact = {r.user: r.n for r in df.groupBy("user").count().withColumnRenamed("count", "n").collect()}
    est = {r.v: r.est_count for r in cms_heavy_hitters(df, "user", 1).collect()}
    assert set(est) == set(exact)
    assert all(est[v] >= exact[v] for v in exact)
    # the hot key clears a threshold the others don't
    hh = {r.v for r in cms_heavy_hitters(df, "user", 40).collect()}
    assert "hot" in hh

    # multiset split (subtract() is SET-difference and would drop dup copies)
    idx = spark.createDataFrame(
        [(i, v[0]) for i, v in enumerate(rows)], "i long, user string"
    )
    a, b = idx.where("i % 2 = 0"), idx.where("i % 2 = 1")
    merged = {(r.r, r.c): r.cnt for r in cms_merge(cms_sketch(a, "user"), cms_sketch(b, "user")).collect()}
    whole = {(r.r, r.c): r.cnt for r in cms_sketch(df, "user").collect()}
    assert merged == whole

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cms_sketch"):
        cms_sketch(df, "user", d=0)


# --------------------------------------------------------------------------
# KMV quantile sketch (bottom-k uniform row sample)
# --------------------------------------------------------------------------


def test_kmv_quantiles_exact_below_k(spark):
    """With fewer rows than k the sample IS the group, so nearest-rank
    quantiles are exact: q50 of 1..9 is 5, q25 is 3 (ceil(.25*9)=3)."""
    from lakehouse_plumber_spark.llm.sketches import kmv_quantiles

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 10)], "g string, rid long, v double"
    )
    row = kmv_quantiles(df, "g", "v", ["rid"], k=64).collect()[0]
    assert row.n_sample == 9
    assert (row.q_25, row.q_50, row.q_75, row.q_95) == (3.0, 5.0, 7.0, 9.0)


def test_kmv_quantiles_row_sample_sees_duplicates(spark):
    """Row-key hashing samples the DISTRIBUTION: a value occurring 90% of
    the time must dominate the sample — a distinct-value sample would keep
    it once and report the wrong median."""
    from lakehouse_plumber_spark.llm.sketches import kmv_quantiles

    rows = [("a", i, 100.0 if i % 10 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, rid long, v double")
    row = kmv_quantiles(df, "g", "v", ["rid"], k=128).collect()[0]
    assert row.q_50 == 100.0


def test_kmv_quantile_merge_equals_one_shot(spark):
    """Disjoint-batch merge == one-shot sketch, struct-for-struct — the
    property that makes incremental maintenance sound."""
    from lakehouse_plumber_spark.llm.sketches import (
        kmv_quantile_merge,
        kmv_quantile_sketch,
    )

    df = spark.range(3000).selectExpr(
        "cast(id % 3 as string) as g", "id as rid", "cast(id % 97 as double) as v"
    )
    a, b = df.where("rid % 2 = 0"), df.where("rid % 2 = 1")
    merged = kmv_quantile_merge(
        kmv_quantile_sketch(a, "g", "v", ["rid"], k=32),
        kmv_quantile_sketch(b, "g", "v", ["rid"], k=32),
        k=32,
    )
    direct = kmv_quantile_sketch(df, "g", "v", ["rid"], k=32)
    lhs = {r.stratum: [tuple(x) for x in r.sample] for r in merged.collect()}
    rhs = {r.stratum: [tuple(x) for x in r.sample] for r in direct.collect()}
    assert lhs == rhs


def test_kmv_quantiles_accuracy_and_validation(spark):
    """k=256 over uniform 0..9999: every estimated quantile within a few
    percent of truth; nulls ignored; bad args loud."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.sketches import kmv_quantile_sketch, kmv_quantiles

    df = spark.range(10_000).selectExpr(
        "'a' as g", "id as rid", "cast(id as double) as v"
    )
    row = kmv_quantiles(df, "g", "v", ["rid"], k=256).collect()[0]
    for q, got in ((0.25, row.q_25), (0.5, row.q_50), (0.75, row.q_75), (0.95, row.q_95)):
        assert abs(got - q * 10_000) / 10_000 < 0.08, (q, got)

    withnull = df.withColumn("v", F.expr("CASE WHEN rid < 5000 THEN v END"))
    assert kmv_quantiles(withnull, "g", "v", ["rid"], k=64).collect()[0].n_sample == 64

    with _pytest.raises(ValueError, match="k >= 2"):
        kmv_quantile_sketch(df, "g", "v", ["rid"], k=1)
    with _pytest.raises(ValueError, match="row-key"):
        kmv_quantile_sketch(df, "g", "v", [], k=8)


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def test_hll_merge_equals_sketch_of_union(spark):
    from lakehouse_plumber_spark.llm.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    df = spark.range(8_000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    # OVERLAPPING halves: register max is idempotent, so unlike counter
    # sketches the merge must still equal the one-shot sketch exactly
    a = df.where("v < 5000")
    b = df.where("v >= 3000")
    merged = hll_merge(hll_sketch(a, "g", "v"), hll_sketch(b, "g", "v"))
    direct = hll_sketch(df, "g", "v")
    lhs = {(r.stratum, r.idx): r.rho_max for r in merged.collect()}
    rhs = {(r.stratum, r.idx): r.rho_max for r in direct.collect()}
    assert lhs == rhs
    est_m = {r.stratum: r.est_distinct for r in hll_estimate(merged).collect()}
    est_d = {r.stratum: r.est_distinct for r in hll_estimate(direct).collect()}
    assert est_m == est_d


def test_hll_linear_counting_branch_small_n(spark):
    from lakehouse_plumber_spark.llm.sketches import hll_distinct

    # 80 distinct values << 2.5m (2560): must take the linear-counting
    # branch and land within a tight band of the truth
    df = spark.range(240).select(
        F.lit("g").alias("g"), (F.col("id") % 80).alias("v")
    )
    row = hll_distinct(df, "g", "v").collect()[0]
    assert row.method == "linear"
    assert abs(row.est_distinct - 80) / 80 < 0.10


def test_hll_raw_branch_large_n(spark):
    from lakehouse_plumber_spark.llm.sketches import hll_distinct

    # 50k distinct values >> 2.5m: raw estimator branch; m=1024 gives
    # ~3.25% standard error, assert a 4-sigma band
    df = spark.range(50_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    row = hll_distinct(df, "g", "v").collect()[0]
    assert row.method == "raw"
    assert abs(row.est_distinct - 50_000) / 50_000 < 0.13


def test_hll_matches_duckdb_oracle_on_both_branches(spark, tmp_path):
    import duckdb

    from lakehouse_plumber_spark.llm.sketches import hll_distinct, hll_distinct_duck

    # one group in each regime: 'small' stays linear, 'big' goes raw
    df = spark.range(20_000).select(
        F.when(F.col("id") < 400, F.lit("small")).otherwise(F.lit("big")).alias("g"),
        F.col("id").alias("v"),
    )
    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    spark_rows = {
        r.stratum: (r.n_registers, r.zeros, r.s_total, r.est_distinct, r.method)
        for r in hll_distinct(df, "g", "v").collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    duck_rows = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(hll_distinct_duck("t", "g", "v")).fetchall()
    }
    assert set(spark_rows) == {"small", "big"}
    assert spark_rows["small"][4] == "linear" and spark_rows["big"][4] == "raw"
    assert spark_rows == duck_rows


def test_hll_ignores_nulls(spark):
    from lakehouse_plumber_spark.llm.sketches import hll_distinct

    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2), ("g", 1)], "g string, v int"
    )
    row = hll_distinct(df, "g", "v").collect()[0]
    assert row.method == "linear"
    assert row.est_distinct == 2


# --------------------------------------------------------------------------
# quantile column naming + duplicate-key dedup (ADVICE r8)
# --------------------------------------------------------------------------


def test_quantile_col_names_clean_and_validated():
    from lakehouse_plumber_spark.llm.sketches import _quantile_col_names

    assert _quantile_col_names((0.25, 0.5, 0.75, 0.95)) == [
        "q_25", "q_50", "q_75", "q_95",
    ]
    assert _quantile_col_names((0.05, 0.99)) == ["q_05", "q_99"]
    with pytest.raises(ValueError):
        _quantile_col_names((1.0,))
    with pytest.raises(ValueError):
        _quantile_col_names((0.0,))
    with pytest.raises(ValueError):
        _quantile_col_names((0.124, 0.125))  # collide after rounding


def test_kmv_quantiles_duplicate_keys_agree_with_oracle(spark, tmp_path):
    import duckdb

    from lakehouse_plumber_spark.llm.sketches import kmv_quantiles, kmv_quantiles_duck

    # rid deliberately NON-unique (rid = id % 40, each key 5x): sketch and
    # oracle must still agree because both dedup identical (h, v) pairs
    df = spark.range(200).select(
        F.lit("g").alias("g"),
        (F.col("id") % 40).alias("rid"),
        (F.col("id") % 40).cast("double").alias("v"),
    )
    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    srow = kmv_quantiles(df, "g", "v", ["rid"], k=16).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    drow = con.execute(kmv_quantiles_duck("t", "g", "v", ["rid"], k=16)).fetchone()
    assert (srow.stratum, srow.n_sample, srow.q_25, srow.q_50, srow.q_75, srow.q_95) == drow


# --------------------------------------------------------------------------
# KMV set operations (overlap / Jaccard)
# --------------------------------------------------------------------------


def test_kmv_overlap_exact_below_k(spark):
    from lakehouse_plumber_spark.llm.sketches import kmv_overlap, kmv_sketch

    # |A|=30, |B|=30, |A∩B|=10 (values 20..29 shared), all below k=64:
    # every estimate is exact, so the inclusion-exclusion is too
    a = spark.range(30).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(20, 50).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    row = kmv_overlap(kmv_sketch(a, "g", "v"), kmv_sketch(b, "g", "v")).collect()[0]
    assert (row.est_a, row.est_b, row.est_union, row.est_intersection) == (30, 30, 50, 10)
    assert (row.est_only_a, row.est_only_b) == (20, 20)
    assert row.jaccard == 0.2


def test_kmv_overlap_disjoint_and_identical(spark):
    from lakehouse_plumber_spark.llm.sketches import kmv_overlap, kmv_sketch

    a = spark.range(40).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(100, 140).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    disjoint = kmv_overlap(kmv_sketch(a, "g", "v"), kmv_sketch(b, "g", "v")).collect()[0]
    assert disjoint.est_intersection == 0 and disjoint.jaccard == 0.0
    same = kmv_overlap(kmv_sketch(a, "g", "v"), kmv_sketch(a, "g", "v")).collect()[0]
    assert same.est_intersection == 40 and same.jaccard == 1.0


def test_kmv_overlap_one_sided_stratum(spark):
    from lakehouse_plumber_spark.llm.sketches import kmv_overlap, kmv_sketch

    # stratum 'only_a' exists on one side: est_b coalesces to 0, the
    # intersection to 0, and the union drives the output row set
    a = spark.createDataFrame([("only_a", 1), ("both", 1)], "g string, v int")
    b = spark.createDataFrame([("both", 1), ("both", 2)], "g string, v int")
    rows = {
        r.stratum: r
        for r in kmv_overlap(kmv_sketch(a, "g", "v"), kmv_sketch(b, "g", "v")).collect()
    }
    assert rows["only_a"].est_b == 0 and rows["only_a"].est_intersection == 0
    assert rows["both"].est_intersection == 1 and rows["both"].est_union == 2


def test_kmv_overlap_estimate_accuracy_above_k(spark):
    from lakehouse_plumber_spark.llm.sketches import kmv_overlap, kmv_sketch

    # 10k per side, 5k shared; k=256 -> each estimate ~6% rel error, the
    # inclusion-exclusion compounds them: assert a generous band
    a = spark.range(10_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(5_000, 15_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    row = kmv_overlap(
        kmv_sketch(a, "g", "v", k=256), kmv_sketch(b, "g", "v", k=256), k=256
    ).collect()[0]
    assert abs(row.est_union - 15_000) / 15_000 < 0.25
    assert abs(row.est_intersection - 5_000) / 5_000 < 0.6


# --------------------------------------------------------------------------
# sentence-aligned chunking
# --------------------------------------------------------------------------


def test_sentence_chunks_never_split_sentences(spark):
    from lakehouse_plumber_spark.llm.text import chunk_documents_sentences

    text = "Alpha beta gamma. Delta epsilon! Zeta eta theta iota? Kappa."
    df = _docs(spark, [(1, text)])
    out = chunk_documents_sentences(df, chunk_tokens=5).collect()
    out.sort(key=lambda r: r.chunk_idx)
    # every chunk is a concatenation of whole input sentences
    sentences = ["Alpha beta gamma.", "Delta epsilon!",
                 "Zeta eta theta iota?", "Kappa."]
    joined = " ".join(r.chunk_text for r in out)
    assert joined == " ".join(sentences)
    for r in out:
        for s in sentences:
            # no chunk contains a partial sentence
            assert s in joined
    # binning: cum_before 0,3,5,9 at budget 5 -> chunks 0,0,1,1
    assert [r.chunk_idx for r in out] == [0, 1]
    assert [r.n_sentences for r in out] == [2, 2]
    assert [r.n_chunk_tokens for r in out] == [5, 5]


def test_sentence_chunks_long_sentence_own_chunk(spark):
    from lakehouse_plumber_spark.llm.text import chunk_documents_sentences

    long = " ".join(f"w{i}" for i in range(20)) + "."
    df = _docs(spark, [(1, f"Short one. {long} Tail two.")])
    out = {r.chunk_idx: r for r in chunk_documents_sentences(df, chunk_tokens=8).collect()}
    # cum_before: 0, 2, 22 -> chunks 0, 0, 2: the over-budget sentence
    # shares chunk 0 (binned convention) and pushes the tail to chunk 2
    assert sorted(out) == [0, 2]
    assert out[2].chunk_text == "Tail two."


def test_sentence_chunks_empty_and_validation(spark):
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.text import chunk_documents_sentences

    df = _docs(spark, [(1, ""), (2, None), (3, "   "), (4, "One.")])
    out = chunk_documents_sentences(df, chunk_tokens=4).collect()
    assert [r.doc_id for r in out] == [4]
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents_sentences(df, chunk_tokens=0)


def test_sentence_chunks_partitioning_invariant(spark):
    from lakehouse_plumber_spark.llm.text import chunk_documents_sentences

    rows = [(i, "One two. Three four five! Six? " * (1 + i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in chunk_documents_sentences(df, chunk_tokens=6).collect())
    b = sorted(
        tuple(r)
        for r in chunk_documents_sentences(df.repartition(13), chunk_tokens=6).collect()
    )
    assert a == b


# --------------------------------------------------------------------------
# RRF fusion + temperature sampling
# --------------------------------------------------------------------------


def test_rrf_fusion_prefers_docs_in_both_lists(spark):
    from lakehouse_plumber_spark.llm.search import rrf_fuse

    a = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "rank int, doc_id long") \
        .select("doc_id", "rank")
    b = spark.createDataFrame([(1, 20), (2, 40), (3, 50)], "rank int, doc_id long") \
        .select("doc_id", "rank")
    out = rrf_fuse([a, b], k=10).collect()
    out.sort(key=lambda r: r.rank)
    # doc 20 is in both lists (ranks 2 and 1): 1/62+1/61 beats any single
    # list's best 1/61
    assert out[0].doc_id == 20 and out[0].n_lists == 2
    assert abs(out[0].rrf_score - (1 / 62 + 1 / 61)) < 1e-12
    # one-list docs still appear, with n_lists = 1
    assert {r.doc_id for r in out} == {10, 20, 30, 40, 50}
    assert {r.doc_id: r.n_lists for r in out}[10] == 1
    # ranks dense 1..5
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]


def test_rrf_fusion_validation_and_tiebreak(spark):
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.search import rrf_fuse

    a = spark.createDataFrame([(1, 7), (2, 9)], "rank int, doc_id long").select("doc_id", "rank")
    b = spark.createDataFrame([(1, 9), (2, 7)], "rank int, doc_id long").select("doc_id", "rank")
    out = rrf_fuse([a, b], k=10).collect()
    out.sort(key=lambda r: r.rank)
    # symmetric scores: tie broken by doc_id ascending
    assert [r.doc_id for r in out] == [7, 9]
    with _pytest.raises(ValueError, match="rankings"):
        rrf_fuse([a])
    with _pytest.raises(ValueError, match="k"):
        rrf_fuse([a, b], k=0)


def test_temperature_sample_upsamples_rare_strata(spark):
    from lakehouse_plumber_spark.llm.sampling import temperature_sample

    # 1600 'big' vs 100 'small': natural share 94%/6%; at alpha=0.5 shares
    # become sqrt-proportional (40:10 -> 80%/20%)
    df = spark.range(1700).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1600, "big").otherwise("small").alias("src"),
    )
    out = temperature_sample(df, "src").groupBy("src").count().collect()
    got = {r.src: r["count"] for r in out}
    # n_max keeps 'small' whole (rarest stratum saturates at rate 1.0)
    assert got["small"] == 100
    # big is downsampled to ~sqrt ratio: 100 * sqrt(1600)/sqrt(100) = 400
    assert 320 < got["big"] < 480
    # deterministic under re-partitioning
    again = temperature_sample(df.repartition(13), "src")
    assert sorted(r.doc_id for r in temperature_sample(df, "src").collect()) == \
        sorted(r.doc_id for r in again.collect())


def test_temperature_sample_alpha_one_is_natural_and_validation(spark):
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.sampling import temperature_sample

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 < 2, "a").otherwise("b").alias("src"),
    )
    # alpha=1: parts proportional to counts -> every row keeps (thresholds
    # saturate at the natural mixture)
    assert temperature_sample(df, "src", alpha=1.0).count() == 300
    with _pytest.raises(ValueError, match="alpha"):
        temperature_sample(df, "src", alpha=0.0)
    with _pytest.raises(ValueError, match="alpha"):
        temperature_sample(df, "src", alpha=1.5)
    with _pytest.raises(ValueError, match="strata"):
        temperature_sample(df.where("false"), "src")


def test_kmv_overlap_matrix_exact_below_k_and_pairwise_consistent(spark):
    """The matrix op from one sketch pass must (a) be exact below k, (b)
    agree with per-pair kmv_overlap on every shared column, and (c) emit
    exactly one row per unordered stratum pair."""
    from lakehouse_plumber_spark.llm.sketches import (
        kmv_overlap,
        kmv_overlap_matrix,
        kmv_sketch,
    )

    # a: 0..29, b: 20..49 (|a∩b|=10), c: disjoint 100..119
    df = (
        spark.range(30).selectExpr("'a' AS g", "id AS v")
        .unionAll(spark.range(20, 50).selectExpr("'b' AS g", "id AS v"))
        .unionAll(spark.range(100, 120).selectExpr("'c' AS g", "id AS v"))
    )
    rows = {
        (r.stratum_a, r.stratum_b): r
        for r in kmv_overlap_matrix(df, "g", "v").collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = rows[("a", "b")]
    assert (ab.est_a, ab.est_b, ab.est_union, ab.est_intersection) == (30, 30, 50, 10)
    assert ab.jaccard == 0.2
    assert rows[("a", "c")].est_intersection == 0
    assert rows[("b", "c")].jaccard == 0.0

    # pairwise consistency with the 2-set op on the same strata
    sk = lambda g: kmv_sketch(df.where(f"g = '{g}'"), "g", "v")
    two = kmv_overlap(
        sk("a").selectExpr("'x' AS stratum", "mins"),
        sk("b").selectExpr("'x' AS stratum", "mins"),
    ).collect()[0]
    assert (two.est_a, two.est_b, two.est_union, two.est_intersection) == (
        ab.est_a, ab.est_b, ab.est_union, ab.est_intersection
    )


def test_ivf_persisted_index_arrival_invariance_and_exactness(spark, tmp_path):
    """llm/similarity.py ivf_index_build/append/search: (a) probing every
    list equals brute force exactly, (b) build-all-at-once == build-batch0 +
    append the rest (frozen centroids make arrivals order-independent once
    the build set is fixed), (c) appends never touch the centroid table."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_search,
        knn_bruteforce,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = spark.range(90).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(0, 7), j -> cast(sin(id * 0.37 + j) AS double))").alias("embedding"),
    )
    qids = [0, 5, 11]
    brute = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine)
        for r in knn_bruteforce(df, qids, k=3).collect()
    )

    # one-shot build over everything
    s1 = ParquetTableStore(spark, str(tmp_path / "one"))
    ivf_index_build(df, s1, "m.a.ivf", n_centroids=8)
    one = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine)
        for r in ivf_index_search(s1, "m.a.ivf", qids, k=3, n_probe=8).collect()
    )
    assert one == brute

    # incremental: build on batch 0, append batches 1..2
    s2 = ParquetTableStore(spark, str(tmp_path / "incr"))
    cents = ivf_index_build(
        df.where("pmod(vec_id, 3) = 0"), s2, "m.a.ivf", n_centroids=8
    )
    for i in (1, 2):
        ivf_index_append(df.where(f"pmod(vec_id, 3) = {i}"), s2, "m.a.ivf")
    incr = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine)
        for r in ivf_index_search(s2, "m.a.ivf", qids, k=3, n_probe=8).collect()
    )
    assert incr == brute
    # centroids frozen by appends
    stored = sorted(
        (r.cid, list(r.cv)) for r in s2.read("m.a.ivf__centroids").collect()
    )
    assert stored == sorted((c, v) for c, v in cents)
    assert s2.read("m.a.ivf").count() == 90


def test_ivf_index_contracts_fail_loudly(spark, tmp_path):
    """r12 contract hardening (VERDICT r11 #3/#4): an unknown query id
    raises KeyError naming the missing ids (previously it vanished from
    the output while an empty request raised — inconsistent failure
    surface), duplicate query ids deduplicate to one top-k block, and
    building on an EMPTY corpus raises a clear ValueError before the
    Lloyd loop (previously an opaque Catalyst array<string> type error)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import (
        ivf_index_build,
        ivf_index_search,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> cast(sin(id * 0.37 + j) AS double))"
        ).alias("embedding"),
    )
    store = ParquetTableStore(spark, str(tmp_path / "pq"))
    ivf_index_build(df, store, "m.c.ivf", n_centroids=4)

    with _pytest.raises(KeyError, match=r"\[999, 1000\]"):
        ivf_index_search(store, "m.c.ivf", [1, 999, 1000], k=2, n_probe=4)
    with _pytest.raises(ValueError, match="at least one query id"):
        ivf_index_search(store, "m.c.ivf", [], k=2)
    # duplicates in the request: one top-k block per distinct id
    out = ivf_index_search(store, "m.c.ivf", [3, 3, 7], k=2, n_probe=4)
    rows = out.collect()
    assert {r.query_id for r in rows} == {3, 7}
    assert len(rows) == 4  # k=2 per distinct query, no duplicated blocks

    empty = df.where("vec_id < 0")
    with _pytest.raises(ValueError, match="corpus is empty"):
        ivf_index_build(empty, store, "m.c.ivf_empty", n_centroids=4)
    assert not store.exists("m.c.ivf_empty")


def test_ivf_index_append_retry_idempotent_under_midstream_failure(
    spark, tmp_path
):
    """llm/similarity.py:ivf_index_append retry contract (r12, VERDICT r11
    #8): the append is one all-or-nothing write, so a crashed arrival
    batch either committed fully or not at all — and re-running it with
    retry=True must be idempotent at BOTH seams.  Property: an arrival
    stream with a mid-stream crash-and-retry at either seam yields an
    index (and search output) bit-for-bit equal to the clean run, while a
    naive retry=False re-run after a committed attempt demonstrably
    corrupts the index (doubled rows change top-k)."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_search,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = spark.range(90).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> cast(sin(id * 0.37 + j) AS double))"
        ).alias("embedding"),
    )
    build = df.where("pmod(vec_id, 3) = 0")
    b1 = df.where("pmod(vec_id, 3) = 1")
    b2 = df.where("pmod(vec_id, 3) = 2")
    qids = [0, 5, 11]

    def search(store):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.cosine)
            for r in ivf_index_search(
                store, "m.r.ivf", qids, k=3, n_probe=8
            ).collect()
        )

    clean = ParquetTableStore(spark, str(tmp_path / "clean"))
    ivf_index_build(build, clean, "m.r.ivf", n_centroids=8)
    ivf_index_append(b1, clean, "m.r.ivf")
    ivf_index_append(b2, clean, "m.r.ivf")
    want = search(clean)

    # seam A: crash BEFORE b1's append committed -> retry appends it whole
    sa = ParquetTableStore(spark, str(tmp_path / "seam_a"))
    ivf_index_build(build, sa, "m.r.ivf", n_centroids=8)
    ivf_index_append(b1, sa, "m.r.ivf", retry=True)  # nothing committed yet
    ivf_index_append(b2, sa, "m.r.ivf")
    assert search(sa) == want
    assert sa.read("m.r.ivf").count() == 90

    # seam B: crash AFTER b1's append committed (downstream failure) ->
    # retry masks the committed ids and appends nothing
    sb = ParquetTableStore(spark, str(tmp_path / "seam_b"))
    ivf_index_build(build, sb, "m.r.ivf", n_centroids=8)
    ivf_index_append(b1, sb, "m.r.ivf")
    ivf_index_append(b1, sb, "m.r.ivf", retry=True)  # the retried re-run
    ivf_index_append(b2, sb, "m.r.ivf")
    assert search(sb) == want
    assert sb.read("m.r.ivf").count() == 90

    # the hazard retry=True exists to prevent: a plain re-run doubles the
    # batch's rows and the duplicate neighbors occupy extra top-k ranks
    sc = ParquetTableStore(spark, str(tmp_path / "naive"))
    ivf_index_build(build, sc, "m.r.ivf", n_centroids=8)
    ivf_index_append(b1, sc, "m.r.ivf")
    ivf_index_append(b1, sc, "m.r.ivf")  # naive retry, no mask
    ivf_index_append(b2, sc, "m.r.ivf")
    assert sc.read("m.r.ivf").count() == 120
    assert search(sc) != want


def test_with_hyperplane_sig_matches_literal_expr(spark):
    """r13 (VERDICT r12 #5): with_hyperplane_sig — hyperplane weights as a
    broadcast column instead of planes*dim inline literals — must be
    BIT-identical to the literal hyperplane_bucket_expr formulation at
    every packing width; it replaces only the plan shape, not the math."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import (
        hyperplane_bucket_expr,
        with_hyperplane_sig,
    )

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), j -> cast(sin(id * 0.7 + j * 1.3) AS double))"
        ).alias("v"),
    )
    for planes in (1, 8, 56):
        lit = df.select(
            "vec_id", F.expr(hyperplane_bucket_expr("v", planes, 16)).alias("sig")
        )
        bc = with_hyperplane_sig(df, "v", planes, 16, "sig").select("vec_id", "sig")
        assert lit.exceptAll(bc).count() == 0
        assert bc.exceptAll(lit).count() == 0


def test_with_hyperplane_sig_collision_proof_names(spark):
    """r14 (ADVICE r13): the generated SQL's lambda variables are
    `__lhp_`-prefixed, so a vector column named after a former lambda
    variable (`w`, `p`, `x`, ...) binds to the COLUMN, not the lambda —
    the signature must equal the one computed under a neutral name.
    out_col clobbering an existing column and a `__lhp_`-namespace v_col
    both raise instead of silently corrupting."""
    import pytest
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import with_hyperplane_sig

    mk = lambda name: spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> cast(sin(id * 0.7 + j * 1.3) AS double))"
        ).alias(name),
    )
    want = {
        r["vec_id"]: r["sig"]
        for r in with_hyperplane_sig(mk("v"), "v", 8, 8, "sig").collect()
    }
    for name in ("w", "p", "x", "y", "a", "z", "acc", "b"):
        got = {
            r["vec_id"]: r["sig"]
            for r in with_hyperplane_sig(mk(name), name, 8, 8, "sig").collect()
        }
        assert got == want, f"v_col={name!r} shadowed inside the lambdas"
    with pytest.raises(ValueError, match="already exists"):
        with_hyperplane_sig(mk("v"), "v", 8, 8, "vec_id")
    with pytest.raises(ValueError, match="__lhp_"):
        with_hyperplane_sig(mk("__lhp_w"), "__lhp_w", 8, 8, "sig")
