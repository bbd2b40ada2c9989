"""Unit tests for the curation operators added on top of pair generation:
connected-components cluster resolution, deterministic sampling/splits,
repetition metrics, PII redaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_plumber_spark.llm import sampling as SP
from lakehouse_plumber_spark.llm.dedup import dedup_connected_components
from lakehouse_plumber_spark.llm.text import repetition_metrics, with_pii_redaction


def test_connected_components_chain(spark):
    # chain 1-2-3-4-5 plus isolated pair (10, 11): transitive closure must
    # label the whole chain with its min even though (1,5) was never a pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["id_a", "id_b"]
    )
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in dedup_connected_components(pairs).collect()
    }
    assert out == {
        1: (1, 5), 2: (1, 5), 3: (1, 5), 4: (1, 5), 5: (1, 5),
        10: (10, 2), 11: (10, 2),
    }


def test_connected_components_merging_components(spark):
    # two components that merge through a late edge ordering: (1,9),(9,3),(3,2)
    pairs = spark.createDataFrame([(9, 3), (1, 9), (3, 2)], ["id_a", "id_b"])
    out = {r.doc_id: r.cluster_id for r in dedup_connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 9: 1}


def test_connected_components_materialization_count(spark, monkeypatch):
    """Job-count contract (r15, VERDICT r14 item #1): a diameter-2 component
    set must resolve in TWO materializations total — the symmetrized edge
    checkpoint plus ONE 2-hop round (hop 1 converges, hop 2 confirms inside
    the same job via the last-hop Observation).  The r14 shape spent four
    (edges, identity labels, round, confirm round)."""
    # patch the concrete class (Spark 4: pyspark.sql.DataFrame is the
    # abstract facade; instances are classic.dataframe.DataFrame)
    from pyspark.sql.classic.dataframe import DataFrame

    calls = []
    orig = DataFrame.localCheckpoint

    def counting(self, eager=True):
        calls.append(1)
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", counting)
    # star component 1-2, 1-3, 1-4 (diameter 2) + isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (10, 11)], ["id_a", "id_b"]
    )
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in dedup_connected_components(pairs).collect()
    }
    assert out == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4), 10: (10, 2), 11: (10, 2)
    }
    assert len(calls) == 2, f"expected 2 materializations, saw {len(calls)}"


def test_hash_split_stable_under_append(spark):
    base = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    more = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in SP.hash_split(base, w).collect()}
    b = {r.doc_id: r.split for r in SP.hash_split(more, w).collect()}
    # appending new documents never moves existing ones
    assert all(b[k] == v for k, v in a.items())
    counts = {k: sum(1 for v in b.values() if v == k) for k in w}
    assert 0.7 < counts["train"] / 1000 < 0.9
    assert counts["train"] + counts["val"] + counts["test"] == 1000


def test_stratified_sample_rates(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )
    out = SP.stratified_sample(df, "src", {"a": 1.0, "b": 0.0}, id_col="doc_id")
    rows = out.collect()
    assert len(rows) == 1000 and all(r.src == "a" for r in rows)


def _mixture_fixture(spark):
    # skewed strata: a=1200, b=300, c=500 rows
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 20 < 12, "a")
        .when(F.col("id") % 20 < 15, "b")
        .otherwise("c")
        .alias("src"),
    )


def test_mixture_sample_hits_recipe_proportions(spark):
    df = _mixture_fixture(spark)
    # 2:1:1 recipe; n_max limited by b: 300*4//1 = 1200
    out = SP.mixture_weighted_sample(df, "src", {"a": 2, "b": 1, "c": 1}, id_col="doc_id")
    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # thresholds are exact; realized counts are hash-binomial around p*n/W
    assert 0.8 * 600 < counts["a"] < 1.2 * 600
    assert counts["b"] == 300  # rate exactly 1.0 — every b row kept
    assert 0.8 * 300 < counts["c"] < 1.2 * 300
    # stable under re-partitioning (pure per-row function)
    again = SP.mixture_weighted_sample(
        df.repartition(17), "src", {"a": 2, "b": 1, "c": 1}, id_col="doc_id"
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mixture_sample_zero_part_drops_stratum_and_caps_target(spark):
    df = _mixture_fixture(spark)
    out = SP.mixture_weighted_sample(df, "src", {"a": 1, "b": 1, "c": 0}, id_col="doc_id")
    assert out.where(F.col("src") == "c").count() == 0
    # target above n_max without allow_upsample is capped at n_max exactly
    capped = SP.mixture_weighted_sample(
        df, "src", {"a": 1, "b": 1, "c": 0}, target_rows=10**9, id_col="doc_id"
    )
    assert sorted(r.doc_id for r in capped.collect()) == sorted(
        r.doc_id for r in out.collect()
    )


def test_mixture_sample_upsample_copy_counts(spark):
    df = _mixture_fixture(spark)
    # force replication: target twice what b can supply at its share
    out = SP.mixture_weighted_sample(
        df, "src", {"a": 2, "b": 1, "c": 1}, target_rows=2400,
        id_col="doc_id", allow_upsample=True,
    )
    rows = out.collect()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.copy_id)
    # b's threshold is 1*2400*1e6 // (4*300) = exactly 2.0 copies -> every
    # b doc appears exactly twice with dense copy ids
    b_docs = [r.doc_id for r in rows if r.src == "b"]
    assert len(b_docs) == 600
    for d in set(b_docs):
        assert sorted(per_doc[d]) == [0, 1]
    # every doc's copy ids are dense 0..n-1
    for copies in per_doc.values():
        assert sorted(copies) == list(range(len(copies)))


def test_mixture_sample_missing_stratum_raises(spark):
    df = _mixture_fixture(spark)
    with pytest.raises(ValueError, match="absent"):
        SP.mixture_weighted_sample(df, "src", {"a": 1, "nope": 1}, id_col="doc_id")


def test_per_stratum_smallest_hash_is_deterministic(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("grp")
    )
    a = sorted((r.grp, r.doc_id) for r in SP.per_stratum_smallest_hash(df, "grp", 7).collect())
    b = sorted(
        (r.grp, r.doc_id)
        for r in SP.per_stratum_smallest_hash(df.repartition(13), "grp", 7).collect()
    )
    assert a == b and len(a) == 21


def test_repetition_metrics_extremes(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        ["doc_id", "text"],
    )
    m = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert m[1].top2_frac == 1.0 and m[1].dup5_frac > 0.8
    assert m[2].top2_frac < 0.2 and m[2].dup5_frac == 0.0


def test_pii_redaction(spark):
    df = spark.createDataFrame(
        [(1, "reach me at jo.doe+x@mail.example.org or +44 123-4567 thanks")],
        ["doc_id", "text"],
    )
    r = with_pii_redaction(df).collect()[0]
    assert r.n_emails == 1 and r.n_phones == 1
    assert r.redacted == "reach me at [EMAIL] or [PHONE] thanks"


def test_lsh_hot_bucket_cap_bounds_clique_pairs(spark):
    """A boilerplate clique of m docs contributes ~m^2/2 candidate pairs —
    max_bucket_size drops the over-full buckets (their members belong to
    exact/prefix dedup) while genuine small near-dup groups survive."""
    from lakehouse_plumber_spark.llm.dedup import lsh_candidate_pairs, minhash_signatures

    boiler = [(i, "terms of service apply to all users of this site always") for i in range(40)]
    pair = [(100, "a genuinely unique document about owls and rivers flowing"),
            (101, "a genuinely unique document about owls and rivers flowing today")]
    uniq = [(200 + i, f"totally distinct content number {i} with its own words {i * 7}")
            for i in range(5)]
    df = spark.createDataFrame(boiler + pair + uniq, "doc_id long, text string")
    sigs = minhash_signatures(df, "text", "doc_id")

    uncapped = lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=None).count()
    capped_pairs = lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=10)
    capped = capped_pairs.count()
    # clique alone is 40*39/2 = 780 pairs; capped run must drop them all
    assert uncapped >= 780
    assert capped < 50
    # the genuine near-dup pair survives the cap
    assert capped_pairs.where("id_a = 100 AND id_b = 101").count() == 1
    # r11: the cap is ON BY DEFAULT (LSH_MAX_BUCKET) — the 40-doc clique
    # (bucket size 40 > 32) drops whole without any explicit parameter,
    # while the genuine pair still surfaces
    default_pairs = lsh_candidate_pairs(sigs, "doc_id")
    assert default_pairs.count() < 50
    assert default_pairs.where("id_a = 100 AND id_b = 101").count() == 1


class TestIVFProductionPath:
    """The driver row runs IVF with n_probe = n_centroids (exactness oracle);
    these cover the production trade-off n_probe < n_centroids."""

    def _clustered(self, spark, n_clusters=4, per=25, dim=8):
        # well-separated clusters: one axis-aligned center per cluster with
        # small deterministic jitter, so true neighbors share a cluster
        rows = []
        for c in range(n_clusters):
            for i in range(per):
                v = [0.0] * dim
                v[c] = 10.0
                v[(c + 1) % dim] = ((i * 37) % 13) / 13.0  # jitter
                rows.append((c * per + i, v))
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_nprobe_one_stays_in_cluster_and_matches_bruteforce(self, spark):
        from lakehouse_plumber_spark.llm import similarity as S

        df = self._clustered(spark)
        qids = [0, 25, 50, 75]  # one query per cluster
        exact = S.knn_bruteforce(df, qids, k=3)
        approx = S.ivf_build_and_search(df, qids, k=3, n_centroids=4, n_probe=1)
        ex = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
        ap = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}
        # separated clusters: probing only the nearest list loses nothing
        assert ap == ex
        # and every neighbor is from the query's own cluster
        for (q, _), n in ap.items():
            assert n // 25 == q // 25

    def test_nprobe_full_equals_bruteforce_on_any_data(self, spark):
        from lakehouse_plumber_spark.llm import similarity as S

        # adversarial: random-ish vectors, no cluster structure
        df = spark.range(0, 60).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 8), i -> sin(cast((id + 1) * i as double))) AS embedding",
        )
        qids = [0, 1, 2]
        exact = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
                 for r in S.knn_bruteforce(df, qids, k=3).collect()}
        approx = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
                  for r in S.ivf_build_and_search(
                      df, qids, k=3, n_centroids=8, n_probe=8).collect()}
        assert approx == exact


class TestTokenPacking:
    def test_bins_fill_to_budget_with_one_doc_overshoot(self, spark):
        from lakehouse_plumber_spark.llm.sampling import pack_token_shards

        docs = spark.range(0, 400).selectExpr(
            "id AS doc_id", "CAST(50 + id % 300 AS INT) AS n_tokens")
        out = pack_token_shards(docs, budget=1000, shards=4).collect()
        # every doc assigned exactly once
        assert len(out) == 400
        by_bin: dict = {}
        for r in out:
            by_bin.setdefault((r.shard, r.bin), []).append(r.n_tokens)
        max_doc = 349
        for (shard, b), toks in by_bin.items():
            # contiguous fill: a bin never exceeds budget + one document
            assert sum(toks) <= 1000 + max_doc
        # non-final bins are full up to the previous bin's overshoot carry:
        # the exclusive-prefix rule bounds each side by one document
        max_bin = {}
        for (shard, b) in by_bin:
            max_bin[shard] = max(max_bin.get(shard, -1), b)
        for (shard, b), toks in by_bin.items():
            if b < max_bin[shard]:
                assert sum(toks) >= 1000 - max_doc

    def test_deterministic_across_partitionings(self, spark):
        from lakehouse_plumber_spark.llm.sampling import pack_token_shards

        docs = spark.range(0, 300).selectExpr(
            "id AS doc_id", "CAST(10 + id % 90 AS INT) AS n_tokens")
        a = sorted(map(tuple, pack_token_shards(docs, 500, shards=4).collect()))
        b = sorted(map(tuple, pack_token_shards(
            docs.repartition(13), 500, shards=4).collect()))
        assert a == b


class TestMultiProbeLSH:
    def test_multi_probe_recall_dominates_single_bucket(self, spark, testdata):
        """Probing Hamming-1 neighbor buckets can only ADD candidates, so
        every single-bucket hit survives and recall vs brute force is
        monotone in the probe radius; full radius = exact."""
        from lakehouse_plumber_spark.llm import similarity as S

        df = spark.table("embeddings")
        qids = [0, 1, 2, 3, 4]
        exact = {(r.query_id, r.neighbor_id)
                 for r in S.knn_bruteforce(df, qids, k=3).collect()}

        def hits(mp):
            got = {(r.query_id, r.neighbor_id)
                   for r in S.knn_lsh(df, qids, k=3, multi_probe=mp).collect()}
            return len(got & exact)

        h0, h1 = hits(0), hits(1)
        assert h1 >= h0
        # all 8 planes probed = every bucket = exact search
        assert hits(S.NUM_HYPERPLANES) == len(exact)


class TestSpanRemoval:
    def test_shared_run_removed_unique_text_kept(self, spark):
        from lakehouse_plumber_spark.llm.dedup import remove_duplicated_spans

        shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
        df = spark.createDataFrame(
            [
                (1, f"alpha beta {shared} gamma delta"),
                (2, f"one two three {shared} four"),
                (3, "completely unrelated text with none of those runs here"),
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in
               remove_duplicated_spans(df, k=10).collect()}
        # both docs lose exactly the 10-token shared run
        assert out[1].n_removed == 10 and out[2].n_removed == 10
        assert out[1].cleaned_text == "alpha beta gamma delta"
        assert out[2].cleaned_text == "one two three four"
        # the unrelated doc is untouched
        assert out[3].n_removed == 0
        assert out[3].cleaned_text.startswith("completely unrelated")

    def test_short_docs_and_overlapping_windows(self, spark):
        from lakehouse_plumber_spark.llm.dedup import remove_duplicated_spans

        # 9-token duplicated run with k=4: every window inside the run
        # duplicates, so the whole run goes; docs shorter than k are untouched
        run = "a b c d e f g h i"
        df = spark.createDataFrame(
            [(1, f"x {run} y"), (2, f"z {run} w"), (3, "tiny doc")],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in remove_duplicated_spans(df, k=4).collect()}
        assert out[1].cleaned_text == "x y" and out[1].n_removed == 9
        assert out[2].cleaned_text == "z w"
        assert out[3].n_removed == 0 and out[3].cleaned_text == "tiny doc"


def test_semantic_dedup_retires_within_cluster_near_dups(spark):
    """Near-identical vectors land in the same cluster and the higher id is
    retired; distinct vectors survive."""
    from lakehouse_plumber_spark.llm import similarity as S

    rows = []
    for c in range(4):
        v = [0.0] * 8
        v[c] = 1.0
        rows.append((c, v))                        # centroid-ish seed vectors
        near = list(v)
        near[(c + 4) % 8] = 0.001                  # ~same direction
        rows.append((100 + c, near))               # near-dup of vector c
    out = {r.vec_id: r for r in
           S.semantic_dedup(spark.createDataFrame(rows, ["vec_id", "embedding"]),
                            threshold=0.99, n_centroids=4).collect()}
    for c in range(4):
        assert out[c].retired is False             # lowest id survives
        assert out[100 + c].retired is True        # its near-dup is retired
        assert out[100 + c].list_id == out[c].list_id


def test_decontaminate_flags_benchmark_overlap(spark):
    from lakehouse_plumber_spark.llm.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "what is the capital of france and why does it matter")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "quiz answer: the capital of france and its history"),  # leaks 3-grams
            (2, "completely unrelated training document about cooking pasta"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in decontaminate(docs, bench, min_shared=1).collect()}
    assert out[1].contaminated is True and out[1].n_shared >= 1
    assert out[2].contaminated is False and out[2].n_shared == 0


def test_mean_token_frequency_ranks_gibberish_low(spark):
    from lakehouse_plumber_spark.llm.text import mean_token_frequency

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat too"),
            (2, "the dog ran to the cat on the mat again"),
            (3, "xqzt vvwq plrk jjkm zzyx qwpv mnbx"),   # gibberish: unique tokens
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in mean_token_frequency(df).collect()}
    assert out[3].mean_freq == 1.0                     # every token unique
    assert out[1].mean_freq > 2.0 and out[2].mean_freq > 2.0
    # exact integer invariants
    for r in out.values():
        assert r.sum_freq >= r.n_tokens


def test_edit_distance_dedup_finds_small_edits_only(spark):
    from lakehouse_plumber_spark.llm.dedup import edit_distance_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (1, base),
        (2, base.replace("delta", "delia", 1)),     # 2-char edit, near-dup
        (3, base),                                   # exact dup of 1
        (4, "totally different text with none of those words at all " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.distance for r in edit_distance_dedup(df, max_distance=10).collect()}
    assert out[(1, 3)] == 0
    assert 0 < out[(1, 2)] <= 4 and out[(2, 3)] == out[(1, 2)]
    assert all(4 not in pair for pair in out)


def test_ivfpq_exact_on_separable_clusters(spark):
    """With well-separated clusters and probes covering them, IVF-PQ's
    quantized ranking must agree with exact nearest neighbors: the query's
    true cluster-mates rank first."""
    from lakehouse_plumber_spark.llm.similarity import ivfpq_search

    rows = []
    # two tight clusters far apart in an 8-dim space; ids INTERLEAVED so the
    # lowest-id codebook seeds cover both clusters (even = A, odd = B)
    for i in range(8):
        rows.append((2 * i, [10.0 + 0.01 * i] * 8))       # cluster A: even ids
        rows.append((2 * i + 1, [-10.0 - 0.01 * i] * 8))  # cluster B: odd ids
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivfpq_search(
        df, [0, 1], k=3, n_centroids=4, n_probe=4, m_subvectors=4, n_codes=4
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    # every returned neighbor is from the query's own cluster
    assert all(n % 2 == 0 for n in by_q[0]) and len(by_q[0]) == 3
    assert all(n % 2 == 1 for n in by_q[1]) and len(by_q[1]) == 3


def test_gopher_rules_boundaries(spark):
    """Each rule flips the keep verdict independently."""
    from lakehouse_plumber_spark.llm.text import gopher_rules

    good = " ".join(["the", "of", "and", "word"] * 15)        # 60 words, stopwords, alpha
    too_short = "the of and word"                              # < min_words
    symbols = " ".join(["the", "of"] + ["###"] * 58)           # symbol ratio high
    no_stop = " ".join(["zzz", "qqq"] * 30)                    # no stopwords
    df = spark.createDataFrame(
        [(1, good), (2, too_short), (3, symbols), (4, no_stop)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].n_words == 4
    assert not out[3].keep and out[3].symbol_word_ratio > 0.1
    assert not out[4].keep and out[4].n_stopwords == 0


def test_c4_rules_line_and_doc_verdicts(spark):
    """Each C4 rule fires independently on real multi-line input."""
    from lakehouse_plumber_spark.llm.text import c4_rules

    sent = "this is a fine sentence with plenty of words."
    good = "\n".join([sent] * 4)
    few_lines = "\n".join([sent] * 2)                     # < min_kept_lines
    no_punct = "\n".join([sent[:-1]] * 4)                 # no terminal punct
    short_lines = "\n".join(["too short."] * 5)           # < min words/line
    js = "\n".join([sent] * 3 + ["enable JavaScript to view this page."])
    lorem = good + "\nLorem Ipsum dolor sit amet filler."
    brace = good + "\nfunction f() { return 1; }"
    df = spark.createDataFrame(
        [(1, good), (2, few_lines), (3, no_punct), (4, short_lines),
         (5, js), (6, lorem), (7, brace)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_rules(df).collect()}
    assert out[1].keep and out[1].n_kept_lines == 4
    assert not out[2].keep and out[2].n_kept_lines == 2
    assert not out[3].keep and out[3].n_kept_lines == 0
    assert not out[4].keep and out[4].n_kept_lines == 0
    # the javascript LINE is dropped but the doc survives on the other three
    assert out[5].keep and out[5].n_kept_lines == 3
    assert not out[6].keep and out[6].has_lorem
    assert not out[7].keep and out[7].has_brace
    # single narrow scan: no exchange in the plan
    plan = c4_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_line_dedup_strips_boilerplate_everywhere(spark):
    """A line repeated across documents is removed from EVERY document
    (normalization folds case/whitespace); unique lines survive in order,
    and a fully-boilerplate document still yields a row."""
    from lakehouse_plumber_spark.llm.dedup import line_dedup

    footer = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [
            (1, f"alpha unique one\n{footer}\nbeta unique two"),
            (2, f"gamma unique three\n  SUBSCRIBE   to our Newsletter "),
            (3, footer),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(df).collect()}
    assert len(out) == 3
    assert out[1].n_lines == 3 and out[1].n_removed == 1
    # NULL text must still yield its row (review finding: posexplode over
    # split(NULL) would silently drop the document without the coalesce)
    nd = spark.createDataFrame([(9, None)], "doc_id long, text string")
    nrow = line_dedup(nd).collect()
    assert len(nrow) == 1 and nrow[0].n_lines == 1
    assert out[1].cleaned_text == "alpha unique one\nbeta unique two"
    assert out[2].n_removed == 1
    assert out[2].cleaned_text == "gamma unique three"
    assert out[3].n_lines == 1 and out[3].n_removed == 1
    assert out[3].cleaned_text == ""


def test_ngram_doc_topk_counts_and_scalable_topk(spark):
    """Doc-frequency counting (distinct per doc), deterministic tie-break,
    and a TakeOrderedAndProject top-k (never a global sort)."""
    from lakehouse_plumber_spark.llm.text import ngram_doc_topk

    df = spark.createDataFrame(
        [
            (1, "a b c a b c"),     # "a b c" twice in ONE doc -> counts once
            (2, "a b c x y z"),
            (3, "x y z p q r"),
        ],
        "doc_id long, text string",
    )
    out = ngram_doc_topk(df, n=3, k=3)
    rows = out.collect()
    by_gram = {r.ngram: r for r in rows}
    assert by_gram["a b c"].n_docs == 2 and by_gram["x y z"].n_docs == 2
    # ties: "a b c" < "x y z" lexically -> ranks 1, 2
    assert by_gram["a b c"].rank == 1 and by_gram["x y z"].rank == 2
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_url_filter_blocklist_terms_and_dedup(spark):
    """Domain blocklist, URL-term block, and one-survivor-per-normalized-URL
    dedup each fire independently; normalization folds case, fragments, and
    trailing slashes."""
    from lakehouse_plumber_spark.llm.text import url_filter

    df = spark.createDataFrame(
        [
            (1, "https://good.example.com/a"),
            (2, "https://GOOD.example.com/a/"),        # same URL after norm
            (3, "https://good.example.com/a#frag"),    # same URL after norm
            (4, "https://www.bad.example.com/x"),      # blocked domain (www-stripped)
            (5, "https://good.example.com/casino-night"),  # blocked term
            (6, "https://other.example.com/b"),
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in url_filter(
        df,
        blocked_domains=("bad.example.com",),
        blocked_url_terms=("casino",),
    ).collect()}
    assert out[1].keep and out[1].is_canonical
    assert not out[2].keep and not out[2].is_canonical  # dup of 1
    assert not out[3].keep and not out[3].is_canonical  # dup of 1
    assert not out[4].keep and out[4].domain_blocked
    assert out[4].domain == "bad.example.com"
    assert not out[5].keep and out[5].term_blocked
    assert out[6].keep
    # exactly ONE exchange: the hash shuffle on the normalized URL
    plan = url_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_pack_sequences_tiles_exactly(spark):
    """Fragments reconstruct every document's token count, never overlap,
    and fill each non-final sequence of a shard completely."""
    from lakehouse_plumber_spark.llm.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, 1 + (i * 37) % 97) for i in range(200)], "doc_id long, n_tokens int"
    )
    L = 64
    out = pack_sequences(docs, seq_len=L, shards=4)
    rows = out.collect()
    # per-doc: fragments sum to n_tokens
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.frag_len
    truth = {r.doc_id: r.n_tokens for r in docs.collect()}
    assert per_doc == truth
    # per-sequence: fragments tile [0, L) contiguously; only each shard's
    # LAST sequence may be partially filled
    seqs = {}
    for r in rows:
        seqs.setdefault((r.shard, r.seq), []).append((r.frag_start, r.frag_len))
    last = {}
    for (sh, sq) in seqs:
        last[sh] = max(last.get(sh, -1), sq)
    for (sh, sq), frags in seqs.items():
        frags.sort()
        pos = 0
        for start, ln in frags:
            assert start == pos and ln > 0
            pos += ln
        assert pos <= L
        if sq != last[sh]:
            assert pos == L, f"non-final sequence ({sh},{sq}) not full: {pos}"


def test_ivfpq_refuses_undersized_collection(spark):
    from lakehouse_plumber_spark.llm.similarity import ivfpq_search

    df = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="at least"):
        ivfpq_search(df, [0], n_centroids=16, n_codes=16)


class TestANNRecallLadder:
    def test_ivf_and_ivfpq_recall_floors_vs_bruteforce(self, spark, testdata):
        """Recall@3 of each ANN rung against exact search on the shared
        fixture: IVF probing all lists is exact by construction; realistic
        probe counts must clear documented floors (IVF >= 0.8, IVF-PQ >= 0.5
        — PQ trades recall for 64x memory; its candidate set is re-ranked by
        ADC, not true distance).  Numbers are deterministic (k-means init and
        hashing are content-derived), so these are exact regression pins, not
        flaky statistical bounds."""
        from lakehouse_plumber_spark.llm import similarity as S

        df = spark.table("embeddings")
        qids = list(range(10))
        exact = {(r.query_id, r.neighbor_id)
                 for r in S.knn_bruteforce(df, qids, k=3).collect()}

        def recall(got_df):
            got = {(r.query_id, r.neighbor_id) for r in got_df.collect()}
            return len(got & exact) / len(exact)

        r_ivf = recall(S.ivf_build_and_search(df, qids, k=3, n_probe=4))
        r_all = recall(
            S.ivf_build_and_search(df, qids, k=3, n_centroids=8, n_probe=8)
        )
        r_pq = recall(S.ivfpq_search(df, qids, k=3, n_probe=4))
        r_pqr = recall(S.ivfpq_search(df, qids, k=3, n_probe=4, refine=4))
        assert r_all == 1.0  # probing every list = exact
        assert r_ivf >= 0.8
        # raw ADC ranking is crude on this tiny fixture (codebooks from 16
        # seeds) — the exact-refine stage (IVFADC+R) is what must recover it
        assert r_pqr >= max(r_pq, 0.5)


def test_embedding_near_dup_size_guard(spark):
    """The brute-force O(n^2) baseline refuses inputs above max_rows with a
    message pointing at the LSH path (VERDICT r7 item #4 / r6 task 6)."""
    import pytest

    from lakehouse_plumber_spark.llm.dedup import embedding_near_dup_pairs

    df = spark.range(10).selectExpr(
        "id AS vec_id", "array(cast(id AS float), 1.0F) AS embedding"
    )
    with pytest.raises(ValueError, match=r"O\(n\^2\)"):
        embedding_near_dup_pairs(df, max_rows=5)
    # under the cap (or with the cap raised) it still computes
    assert embedding_near_dup_pairs(df, threshold=-1.0).count() == 45


def test_image_decoder_seam_without_pillow(spark):
    """On a Pillow-free container (this one): 'auto' resolves to the
    deterministic stub, 'pil' raises an actionable ImportError, and the
    default extract_features output is unchanged by the seam (oracle
    stability). The real-decoder half lives in tests/test_multimodal_pil.py,
    gated like test_delta_store.py."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.multimodal import (
        ASSET_SCHEMA,
        _load_pil,
        extract_features,
        image_decoder,
    )

    if _load_pil() is not None:
        _pytest.skip("Pillow present; the gated module covers the real path")
    assert image_decoder("auto")[0] == "stub"
    with _pytest.raises(ImportError, match="Pillow"):
        image_decoder("pil")
    with _pytest.raises(ValueError, match="stub|pil|auto"):
        image_decoder("torch")

    assets = spark.createDataFrame(
        [(1, "image", b"payload", "image/png", 4, 4, None)], ASSET_SCHEMA
    )
    default = extract_features(assets).collect()[0]
    auto = extract_features(assets, decoder="auto").collect()[0]
    assert default.feature == auto.feature and len(default.feature) == 8


def test_perplexity_buckets_order_and_fractions(spark):
    """CCNet bucketing: labels partition the corpus, bucket order follows
    score order (head >= middle >= tail), realized fractions track the
    requested ones on a tie-free corpus, and bad fractions are rejected."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.text import perplexity_buckets

    # 30 docs over a shared vocabulary: doc i repeats a common phrase i times
    # and appends one rare token, so LM scores are graded and tie-free
    rows = [
        (i, ("the cat sat " * (1 + i % 10)) + f"tok{i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs, head=0.3, middle=0.3)
    got = {r.doc_id: (r.bucket, r.mean_logprob) for r in out.collect()}
    assert len(got) == 30
    by_bucket = {}
    for b, s in got.values():
        by_bucket.setdefault(b, []).append(s)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    # value-threshold semantics: fractions within one tie-group of target
    assert 6 <= len(by_bucket["head"]) <= 12
    with _pytest.raises(ValueError, match="head"):
        perplexity_buckets(docs, head=0.7, middle=0.4)
    with _pytest.raises(ValueError, match="cutoffs"):
        perplexity_buckets(docs, cutoffs="median")


def test_perplexity_buckets_sketch_cutoffs_track_exact(spark):
    """cutoffs='sketch' (bounded-state KMV quantile thresholds, the 10^9-doc
    path): same schema, same ordering invariant, and realized bucket
    fractions within O(1/sqrt(k)) of the targets.  With sketch_k >= corpus
    size the sample is the whole corpus, so nearest-rank cutoffs put bucket
    sizes within one rank of the exact-interpolated ones."""
    from lakehouse_plumber_spark.llm.text import perplexity_buckets

    rows = [
        (i, ("the cat sat " * (1 + i % 10)) + f"tok{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs, head=0.3, middle=0.3, cutoffs="sketch",
                             sketch_k=4096)
    assert out.columns == ["doc_id", "mean_logprob", "bucket"]
    got = {r.doc_id: (r.bucket, r.mean_logprob) for r in out.collect()}
    assert len(got) == 40
    by_bucket = {}
    for b, s in got.values():
        by_bucket.setdefault(b, []).append(s)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    # saturated sample == exact nearest-rank: fractions within a tie-group
    assert 8 <= len(by_bucket["head"]) <= 16
    # undersized sketch still partitions the corpus sanely (sampled cutoffs)
    small = perplexity_buckets(docs, head=0.3, middle=0.3, cutoffs="sketch",
                               sketch_k=16)
    frac_head = sum(r.bucket == "head" for r in small.collect()) / 40
    assert 0.05 < frac_head < 0.65


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    """A term unique to one doc must outrank corpus-universal fillers; ranks
    are 1..k per doc; short tokens are dropped; k validated."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.text import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common words appear everywhere but zebra zebra lives here"),
            (2, "common words appear everywhere and nothing else special"),
            (3, "common words appear everywhere plus quasar quasar quasar"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=2)
    got = {(r.doc_id, r.rank): r.term for r in out.collect()}
    assert got[(1, 1)] == "zebra"
    assert got[(3, 1)] == "quasar"
    assert all(rank in (1, 2) for _, rank in got)
    assert not any(len(t) < 3 for t in got.values())
    with _pytest.raises(ValueError, match="k"):
        tfidf_keywords(docs, k=0)


def test_dedup_survivors_keeps_best_quality_member(spark):
    """Within a duplicate cluster the highest-quality (longest) member is
    kept (ties -> lowest id); singletons always survive."""
    from lakehouse_plumber_spark.llm.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 7)], "doc_id long, quality long"
    )
    # {1,2,3} one transitive cluster (1-2, 2-3); 4 untouched
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.doc_id: (r.kept, r.cluster_size) for r in
           dedup_survivors(docs, pairs, "quality").collect()}
    assert out[2] == (True, 3)   # quality 9, lower id than 3
    assert out[3] == (False, 3)
    assert out[1] == (False, 3)
    assert out[4] == (True, 1)   # singleton passes through


def test_bloom_decontaminate_one_sided_error(spark):
    """Every truly-shared shingle is ALWAYS flagged (Bloom filters have no
    false negatives); a disjoint doc is clean at this bitmap size; m_bits
    validated."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.dedup import bloom_decontaminate, decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different content with no overlap at all whatsoever"),
            (3, "the quick brown fox appears here too with more text"),
        ],
        "doc_id long, text string",
    )
    bench = docs.where("doc_id = 1")
    bl = {r.doc_id: r.contaminated for r in bloom_decontaminate(docs, bench).collect()}
    ex = {r.doc_id: r.contaminated for r in decontaminate(docs, bench).collect()}
    # no false negatives: everything the exact path flags, bloom flags
    assert all(bl[d] for d, c in ex.items() if c)
    assert bl[1] and bl[3]
    assert not bl[2]  # 2^20 bits vs ~20 shingles: FP probability ~0
    with _pytest.raises(ValueError, match="power of two"):
        bloom_decontaminate(docs, bench, m_bits=100)


def test_embedding_lsh_pairs_subset_of_bruteforce_with_high_recall(spark):
    """LSH pairs are verified by the SAME exact cosine as the brute-force
    baseline, so they must be a subset of its output; at a high threshold
    the banded-signature recall should be near-total on clustered data."""
    import random

    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.dedup import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    rng = random.Random(7)
    rows = []
    vid = 0
    # 30 clusters of 3 near-identical vectors + 60 loners
    for c in range(30):
        center = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(3):
            rows.append((vid, [x + rng.gauss(0, 0.01) for x in center]))
            vid += 1
    for _ in range(60):
        rows.append((vid, [rng.gauss(0, 1) for _ in range(64)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(df, threshold=0.99).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(df, threshold=0.99).collect()
    }
    assert lsh <= brute  # exact verify -> no false positives vs baseline
    assert len(brute) >= 30  # the planted clusters are found by brute force
    assert len(lsh) / len(brute) >= 0.9  # banded recall at cosine >= 0.99


def test_embedding_lsh_hot_bucket_cap_and_validation(spark):
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.dedup import embedding_near_dup_lsh

    # 12 identical vectors: one bucket per band; cap at 4 drops them whole
    df = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(12)], "vec_id long, embedding array<double>"
    )
    assert embedding_near_dup_lsh(df, threshold=0.5).count() == 66  # 12C2
    assert embedding_near_dup_lsh(df, threshold=0.5, max_bucket_size=4).count() == 0
    with _pytest.raises(ValueError, match="bands"):
        embedding_near_dup_lsh(df, bands=0)
    with _pytest.raises(ValueError, match="bands"):
        embedding_near_dup_lsh(df, bands=8, rows_per_band=8)


def test_emb_lsh_auto_rows_bounds_candidates_linearly():
    """The r10 melt (VERDICT item #3): a STATIC geometry lets spurious
    candidates grow ~n^2; the auto rule must hold them <= 32n at every
    corpus size, reproduce the hand-measured 4x14 at 2e5, and never grow
    superlinearly across a 10x corpus step."""
    from lakehouse_plumber_spark.llm.dedup import (
        EMB_LSH_ROWS,
        emb_lsh_auto_rows,
    )

    # anchors: small corpora keep the recall-sweet floor; the r10
    # hand-tuned 2e5 point derives exactly 14
    assert emb_lsh_auto_rows(2_000) == EMB_LSH_ROWS
    assert emb_lsh_auto_rows(200_000) == 14
    # monotone in n, capped at the 62-bit signature budget
    prev = 0
    for n in (10**3, 10**4, 10**5, 10**6, 10**7):
        r = emb_lsh_auto_rows(n)
        assert r >= prev
        prev = r
        assert 4 * r <= 62
    # the linear bound: expected spurious candidates n^2/2 * bands * 2^-rows
    # <= 32n wherever the cap doesn't bind (past it, add bands)
    for n in (10**3, 10**4, 10**5, 4 * 10**5):
        rows = emb_lsh_auto_rows(n, bands=4)
        if rows < 62 // 4:
            assert n * n / 2 * 4 / 2**rows <= 32 * n
    # no superlinear step while the signature budget holds: the bound at
    # 10n is <= ~20x the bound at n (10x data, ceil slack <= 2x); past the
    # 62-bit cap the documented move is MORE BANDS — with 2 bands the rule
    # stays linear through 1e8 vectors
    for n, bands in ((10**4, 4), (10**5, 2), (10**6, 2), (10**7, 2)):
        b_n = n * n / 2 * bands / 2 ** emb_lsh_auto_rows(n, bands=bands)
        b_10 = (
            (10 * n) ** 2 / 2 * bands
            / 2 ** emb_lsh_auto_rows(10 * n, bands=bands)
        )
        assert b_10 <= 20 * b_n
        assert emb_lsh_auto_rows(10 * n, bands=bands) < 62 // bands  # cap free
    import pytest as _pytest

    with _pytest.raises(ValueError, match="corpus"):
        emb_lsh_auto_rows(0)


def test_embedding_lsh_auto_matches_pinned_geometry(spark):
    """Auto-derived geometry at small n lands on the pinned floor, so the
    auto path must be pair-for-pair identical to the explicit call (the
    cross-engine oracle pins the same floor)."""
    import random

    from lakehouse_plumber_spark.llm.dedup import (
        EMB_LSH_ROWS,
        embedding_near_dup_lsh,
    )

    rng = random.Random(11)
    rows = []
    for c in range(20):
        center = [rng.gauss(0, 1) for _ in range(32)]
        rows.append((2 * c, center))
        rows.append((2 * c + 1, [x + rng.gauss(0, 0.005) for x in center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    auto = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(df, threshold=0.99).collect()
    }
    pinned = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(
            df, threshold=0.99, rows_per_band=EMB_LSH_ROWS
        ).collect()
    }
    assert auto == pinned and len(auto) >= 18


def test_incremental_lsh_pairs_equal_one_shot(spark):
    """Arrival-order incremental dedup (bands appended per batch, probe side
    = new batch only) must accumulate EXACTLY the one-shot candidate set,
    each pair found once.  Runs with the clique cap DISABLED: this corpus
    deliberately packs >LSH_MAX_BUCKET docs into one bucket, and a bucket
    that crosses the cap mid-stream is the documented divergence between
    incremental and one-shot (the capped twin below pins cap behavior)."""
    from lakehouse_plumber_spark.llm.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        lsh_candidate_pairs_incremental,
        minhash_signatures,
    )

    rows = []
    for i in range(30):
        base = f"document number {i} with some shared words in the middle"
        rows.append((i, base))
        if i % 5 == 0:  # plant near-dups across batch boundaries
            rows.append((100 + i, base + " tail"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df)
    one_shot = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=None).collect()
    }
    acc: set = set()
    index = None
    for b in range(3):
        batch = df.where(f"pmod(doc_id, 3) = {b}")
        nb = lsh_bands(minhash_signatures(batch))
        got = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs_incremental(
                nb, index, max_bucket_size=None
            ).collect()
        }
        assert not (got & acc), "a pair must be found exactly once"
        acc |= got
        index = nb if index is None else index.unionByName(nb)
    assert acc == one_shot


def test_incremental_lsh_bucket_cap_applies_to_combined_bucket(spark):
    from lakehouse_plumber_spark.llm.dedup import (
        lsh_bands,
        lsh_candidate_pairs_incremental,
        minhash_signatures,
    )

    # 12 identical docs split across index (8) and batch (4): combined
    # bucket size 12 > cap 10 -> dropped whole; without a cap all pairs
    df = spark.createDataFrame(
        [(i, "exactly the same boilerplate text body for everyone") for i in range(12)],
        "doc_id long, text string",
    )
    index = lsh_bands(minhash_signatures(df.where("doc_id < 8")))
    nb = lsh_bands(minhash_signatures(df.where("doc_id >= 8")))
    uncapped = lsh_candidate_pairs_incremental(nb, index).count()
    assert uncapped == 8 * 4 + 6  # cross pairs + within-batch pairs
    capped = lsh_candidate_pairs_incremental(nb, index, max_bucket_size=10).count()
    assert capped == 0


def test_linear_quality_filter_model_swap_and_determinism(spark):
    """The stub model is swappable: hand-crafted weights must steer the
    verdict (a model that loves 'good' tokens keeps good docs); output is
    partitioning-invariant; dim/weights validated."""
    import hashlib

    import pytest as _pytest

    from lakehouse_plumber_spark.llm.text import linear_quality_filter

    dim = 8
    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim

    weights = [0] * dim
    weights[bucket("good")] = 500_000     # +0.5 per occurrence
    weights[bucket("bad")] = -1_000_000   # -1.0 per occurrence
    df = spark.createDataFrame(
        [(1, "good good content"), (2, "bad bad content"), (3, "neutral words only")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           linear_quality_filter(df, dim=dim, weights=weights).collect()}
    assert out[1].keep and out[1].score_sum > 0
    assert not out[2].keep and out[2].score_sum < 0
    # neutral doc: dot may be 0 or whatever 'content'/'neutral' hash to —
    # but with these buckets zeroed it is exactly 0 unless a collision
    again = {r.doc_id: r.score_sum for r in
             linear_quality_filter(df.repartition(7), dim=dim, weights=weights).collect()}
    assert again == {k: v.score_sum for k, v in out.items()}
    with _pytest.raises(ValueError, match="dim"):
        linear_quality_filter(df, dim=0)
    with _pytest.raises(ValueError, match="weights"):
        linear_quality_filter(df, dim=8, weights=[1, 2])


def test_containment_catches_excerpt_jaccard_misses(spark):
    """An excerpt quoted inside a much longer document: containment ~1,
    Jaccard small — the pair must surface at containment >= 0.8 even
    though minhash_lsh_dedup's Jaccard >= 0.5 gate would drop it."""
    from lakehouse_plumber_spark.llm.dedup import containment_dedup, minhash_lsh_dedup

    excerpt = "the quick brown fox jumps over the lazy dog near the river bank"
    long_doc = ("intro words setting the scene before quoting " + excerpt +
                " and then a very long discussion follows " +
                " ".join(f"filler{i}" for i in range(60)))
    df = spark.createDataFrame(
        [(1, excerpt), (2, long_doc), (3, "completely unrelated content here entirely")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r for r in containment_dedup(df).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.containment >= 0.9
    assert r.jaccard < 0.5  # Jaccard verify would have dropped it
    jac = {(r.id_a, r.id_b) for r in minhash_lsh_dedup(df).collect()}
    assert (1, 2) not in jac
    assert not any(3 in p for p in got)


def test_incremental_dedup_batch_is_batching_invariant(spark, tmp_path):
    """llm/dedup.py:incremental_dedup_batch — the shared helper behind the
    registry row, the YAML `dedup: incremental` action, and the streaming
    foreachBatch row: accumulated pairs must equal the one-shot minhash
    output REGARDLESS of how the corpus is cut into batches (the
    arrival-order contract), and each batch's bands/grams must land in the
    named index tables."""
    from lakehouse_plumber_spark.llm.dedup import (
        incremental_dedup_batch,
        minhash_lsh_dedup,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog number zero")
         for i in range(4)]
        + [(i, f"unique document {i} with entirely distinct words here {i * 13}")
           for i in range(4, 12)],
        "doc_id long, text string",
    )
    one_shot = sorted(
        (r.id_a, r.id_b, r.jaccard) for r in minhash_lsh_dedup(df).collect()
    )
    assert one_shot  # the planted clique must produce pairs

    for n_batches in (2, 3):
        store = ParquetTableStore(spark, str(tmp_path / f"store_{n_batches}"))
        got = []
        for i in range(n_batches):
            batch = df.where(f"pmod(doc_id, {n_batches}) = {i}")
            pairs = incremental_dedup_batch(
                batch, store, "m.d.bands", "m.d.grams"
            )
            got.extend((r.id_a, r.id_b, r.jaccard) for r in pairs.collect())
        assert sorted(got) == one_shot, f"batching {n_batches} diverged"
        assert store.read("m.d.bands").count() > 0
        assert store.read("m.d.grams").count() == 12


def test_containment_hot_gram_cap_bounds_boilerplate_pairs(spark):
    """Mirror of the minhash clique-cap test for the inverted-index join
    (VERDICT r9 item #2): a boilerplate sentence shared by m docs makes each
    of its shingles contribute ~m^2/2 join rows — `max_doc_freq` drops the
    hot grams, killing the boilerplate-only pairs, while a genuine excerpt
    pair still surfaces through its rarer shingles (the documented recall
    argument: excerpt relations always have low-df shingles too)."""
    from lakehouse_plumber_spark.llm.dedup import containment_dedup

    boiler_sent = "terms of service apply to every user of this web site always"
    boiler = [(i, boiler_sent + f" extra{i} tail{i}") for i in range(30)]
    excerpt = "the quick brown fox jumps over the lazy dog near the river bank"
    planted = [
        (100, excerpt),
        (101, "intro words before quoting " + excerpt + " and then "
              + " ".join(f"filler{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(boiler + planted, "doc_id long, text string")

    uncapped = containment_dedup(df)
    capped = containment_dedup(df, max_doc_freq=5)
    # boilerplate clique alone is 30*29/2 = 435 pairs above the threshold
    assert uncapped.where("id_a < 100 AND id_b < 100").count() >= 435
    assert capped.where("id_a < 100 AND id_b < 100").count() == 0
    # the genuine excerpt pair survives the cap with high containment
    r = capped.where("id_a = 100 AND id_b = 101").collect()
    assert len(r) == 1 and r[0].containment >= 0.9


def test_knn_filtered_respects_predicate_and_recall(spark):
    """Pre-filtered search: every neighbor satisfies the predicate, the
    result equals brute-force-over-the-filtered-subset (exact recall), and
    queries need not satisfy their own predicate."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import knn_bruteforce, knn_filtered

    df = spark.range(60).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 2).cast("int").alias("label"),
        F.expr("transform(sequence(0, 7), j -> cast(sin(id * 0.7 + j) AS double))").alias("embedding"),
    )
    out = knn_filtered(df, [0, 1], "label = 1", k=3)
    rows = out.collect()
    labels = {r.vec_id: r.label for r in df.select("vec_id", "label").collect()}
    assert rows and all(labels[r.neighbor_id] == 1 for r in rows)
    # query 0 has label 0: still answered (queries come from the full table)
    assert {r.query_id for r in rows} == {0, 1}
    # exact recall: equals brute force over the filtered subset (query 1
    # is in the subset, so compare its ranking directly)
    subset = df.where("label = 1")
    brute = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in knn_bruteforce(subset, [1], k=3).collect()
    }
    got1 = {(r.query_id, r.neighbor_id, r.rank) for r in rows if r.query_id == 1}
    assert got1 == brute
    with _pytest.raises(ValueError, match="query id"):
        knn_filtered(df, [], "label = 1")


def _clique_corpus(spark, n_dup=4, n_uniq=8):
    return spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog number zero")
         for i in range(n_dup)]
        + [(i, f"unique document {i} with entirely distinct words here {i * 13}")
           for i in range(n_dup, n_dup + n_uniq)],
        "doc_id long, text string",
    )


def test_incremental_dedup_index_tables_are_hash_partitioned(spark, tmp_path):
    """r12 (VERDICT r11 #1): the persisted index tables are written
    hash-partitioned — bands on pmod(xxhash64(band, h), B), grams on
    pmod(xxhash64(id), B) — so per-batch reads prune to the partitions the
    batch's own keys fall into instead of scanning full history.  Checks:
    hive partition dirs exist on disk, the bucket count is persisted in
    the table meta, the pruned read plan carries a PartitionFilters
    predicate, and pruning loses no rows vs the full read."""
    import os as _os

    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.dedup import (
        INDEX_BUCKETS,
        _pruned_index_read,
        incremental_dedup_batch,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = _clique_corpus(spark)
    store = ParquetTableStore(spark, str(tmp_path / "s"))
    for i in range(2):
        incremental_dedup_batch(
            df.where(f"pmod(doc_id, 2) = {i}"), store, "m.d.bands", "m.d.grams"
        )
    for t in ("m.d.bands", "m.d.grams"):
        dirs = [d for d in _os.listdir(store.path(t)) if d.startswith("__b=")]
        assert dirs, f"{t} is not hive-partitioned on __b"
        # bucket count sized adaptively from the first batch (tiny corpus
        # -> the 8-bucket floor, not a 64-way shatter) and persisted
        assert store.get_meta(t, "index_buckets") == 8
        # file hygiene: clustering on __b before the partitioned write
        # means each append adds at most one file per bucket dir
        import glob as _glob
        per_dir = max(
            len(_glob.glob(_os.path.join(store.path(t), d, "*.parquet")))
            for d in dirs
        )
        assert per_dir <= 2, f"{t}: {per_dir} files in one bucket dir after 2 appends"
    # pruned read: partition filter in the plan, no rows lost for its keys
    cand = df.select("doc_id").where("doc_id < 4")
    pruned = _pruned_index_read(store, "m.d.grams", cand, ["doc_id"], INDEX_BUCKETS)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "__b" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    full = store.read("m.d.grams").drop("__b")
    got = {r.doc_id for r in pruned.collect() if r.doc_id < 4}
    want = {r.doc_id for r in full.collect() if r.doc_id < 4}
    assert got == want and want  # every key's row survives pruning


def test_incremental_dedup_retry_recovers_partial_failure(spark, tmp_path):
    """r12 (VERDICT r11 #2): appends are ordered bands -> grams -> pairs
    (index first, pairs LAST), and a crash between any two appends is
    recovered by re-running the batch with retry=True — the accumulated
    pairs still equal the one-shot output and no index table holds
    duplicate rows.  Simulates the crash at each seam with a store wrapper
    that raises on the chosen append target."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.dedup import (
        incremental_dedup_batch,
        minhash_lsh_dedup,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = _clique_corpus(spark)
    one_shot = sorted(
        (r.id_a, r.id_b, r.jaccard) for r in minhash_lsh_dedup(df).collect()
    )
    assert one_shot

    class _CrashOnAppend:
        def __init__(self, inner, target):
            self._inner, self._target = inner, target

        def append(self, name, df, **kw):
            if name == self._target:
                raise RuntimeError(f"simulated crash appending {name}")
            return self._inner.append(name, df, **kw)

        def __getattr__(self, n):
            return getattr(self._inner, n)

    # crash AFTER bands committed (grams append raises), and AFTER
    # bands+grams committed (pairs append raises) — the two seams the
    # bands -> grams -> pairs ordering creates
    for crash_target in ("m.d.grams", "m.d.pairs"):
        store = ParquetTableStore(
            spark, str(tmp_path / f"s_{crash_target.split('.')[-1]}")
        )
        b0 = df.where("pmod(doc_id, 2) = 0")
        b1 = df.where("pmod(doc_id, 2) = 1")
        got = [
            (r.id_a, r.id_b, r.jaccard)
            for r in incremental_dedup_batch(
                b0, store, "m.d.bands", "m.d.grams", pairs_table="m.d.pairs"
            ).collect()
        ]
        with _pytest.raises(RuntimeError, match="simulated crash"):
            incremental_dedup_batch(
                b1, _CrashOnAppend(store, crash_target),
                "m.d.bands", "m.d.grams", pairs_table="m.d.pairs",
            )
        # recovery: re-run the SAME batch with retry=True on the real store
        got += [
            (r.id_a, r.id_b, r.jaccard)
            for r in incremental_dedup_batch(
                b1, store, "m.d.bands", "m.d.grams",
                pairs_table="m.d.pairs", retry=True,
            ).collect()
        ]
        assert sorted(got) == one_shot, f"crash at {crash_target} diverged"
        accumulated = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in store.read("m.d.pairs").collect()
        )
        assert accumulated == one_shot
        # no duplicate index rows from the crashed attempt + retry
        assert store.read("m.d.grams").count() == 12
        bands = store.read("m.d.bands")
        assert bands.count() == bands.dropDuplicates(["doc_id", "band"]).count()


def test_incremental_dedup_retry_completes_partially_committed_append(spark, tmp_path):
    """ADVICE r12: a crash inside job commit can leave a PARTIAL subset of
    an append's files (the default file committer is not atomic across a
    job's files).  The r12 whole-batch boolean skip treated such an append
    as fully committed and left index rows permanently missing; retry
    masking is per-row as of r13, so the retry appends exactly the missing
    rows and the accumulated state still equals the one-shot output."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.dedup import (
        incremental_dedup_batch,
        minhash_lsh_dedup,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = _clique_corpus(spark)
    one_shot = sorted(
        (r.id_a, r.id_b, r.jaccard) for r in minhash_lsh_dedup(df).collect()
    )
    assert one_shot

    class _PartialCommitThenCrash:
        """Appends only part of the target table's rows, then raises — the
        mid-job-commit crash shape (a subset of the write's files landed)."""

        def __init__(self, inner, target):
            self._inner, self._target = inner, target

        def append(self, name, df, **kw):
            if name == self._target:
                self._inner.append(name, df.where("pmod(doc_id, 4) = 1"), **kw)
                raise RuntimeError(f"simulated partial commit of {name}")
            return self._inner.append(name, df, **kw)

        def __getattr__(self, n):
            return getattr(self._inner, n)

    for crash_target in ("m.d.bands", "m.d.grams"):
        store = ParquetTableStore(
            spark, str(tmp_path / f"s_{crash_target.split('.')[-1]}")
        )
        b0 = df.where("pmod(doc_id, 2) = 0")
        b1 = df.where("pmod(doc_id, 2) = 1")  # odd ids: pmod4 in {1, 3}
        got = [
            (r.id_a, r.id_b, r.jaccard)
            for r in incremental_dedup_batch(
                b0, store, "m.d.bands", "m.d.grams", pairs_table="m.d.pairs"
            ).collect()
        ]
        with _pytest.raises(RuntimeError, match="partial commit"):
            incremental_dedup_batch(
                b1, _PartialCommitThenCrash(store, crash_target),
                "m.d.bands", "m.d.grams", pairs_table="m.d.pairs",
            )
        got += [
            (r.id_a, r.id_b, r.jaccard)
            for r in incremental_dedup_batch(
                b1, store, "m.d.bands", "m.d.grams",
                pairs_table="m.d.pairs", retry=True,
            ).collect()
        ]
        assert sorted(got) == one_shot, f"partial commit at {crash_target} diverged"
        accumulated = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in store.read("m.d.pairs").collect()
        )
        assert accumulated == one_shot
        # converged: every doc indexed exactly once — nothing missing
        # (the r12 skip bug) and nothing doubled (the naive-rerun bug)
        grams = store.read("m.d.grams")
        assert grams.count() == 12
        assert grams.select("doc_id").distinct().count() == 12
        bands = store.read("m.d.bands")
        assert bands.count() == bands.dropDuplicates(["doc_id", "band"]).count()
        assert bands.select("doc_id").distinct().count() == 12


def test_incremental_dedup_cap_crossing_raises_engine_and_yaml(spark, tmp_path):
    """r13 (VERDICT r12 #2): a band bucket crossing `max_bucket_size`
    MID-STREAM silently desynchronizes the accumulated incremental pairs
    from the one-shot result (earlier batches emitted pairs inside a
    bucket the one-shot run drops whole).  The engine helper now detects
    the crossing and raises loudly, so the declarative
    `dedup: {method: incremental}` surface and foreachBatch twins inherit
    the protection.  Consistent cases stay silent: a bucket already over
    the cap at its FIRST appearance (every run drops it whole), and the
    documented `cap_check=False` opt-out."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.dedup import incremental_dedup_batch
    from lakehouse_plumber_spark.parsers import load_flowgroup
    from lakehouse_plumber_spark.runner import PipelineRunner
    from lakehouse_plumber_spark.tables import ParquetTableStore

    def dup_docs(lo, hi):
        return spark.createDataFrame(
            [(i, "same boilerplate text repeated across every document here")
             for i in range(lo, hi)],
            "doc_id long, text string",
        )

    # engine surface: batch 0 fills the bucket to 3 (<= cap 4, pairs
    # emitted); batch 1 pushes it to 6 (> cap) -> loud failure
    store = ParquetTableStore(spark, str(tmp_path / "s1"))
    incremental_dedup_batch(
        dup_docs(0, 3), store, "m.d.bands", "m.d.grams", max_bucket_size=4
    )
    with _pytest.raises(ValueError, match="crossing"):
        incremental_dedup_batch(
            dup_docs(3, 6), store, "m.d.bands", "m.d.grams", max_bucket_size=4
        )
    # documented opt-out accepts incremental semantics on the same state
    incremental_dedup_batch(
        dup_docs(3, 6), store, "m.d.bands", "m.d.grams",
        max_bucket_size=4, cap_check=False,
    )

    # consistent case: bucket exceeded the cap within its FIRST batch —
    # one-shot and every incremental batch drop it whole, so no raise
    store2 = ParquetTableStore(spark, str(tmp_path / "s2"))
    incremental_dedup_batch(
        dup_docs(0, 6), store2, "m.d.bands", "m.d.grams", max_bucket_size=4
    )
    incremental_dedup_batch(
        dup_docs(6, 8), store2, "m.d.bands", "m.d.grams", max_bucket_size=4
    )

    # declarative surface inherits the guard (VERDICT r12 done-criterion)
    store3 = ParquetTableStore(spark, str(tmp_path / "s3"))
    runner = PipelineRunner(spark, store=store3)
    dup_docs(0, 3).createOrReplaceTempView("cap_batch_0")
    dup_docs(3, 6).createOrReplaceTempView("cap_batch_1")

    def fg(i):
        return load_flowgroup({
            "pipeline": "p", "flowgroup": f"incr_{i}",
            "actions": [
                {"name": "ld", "type": "load",
                 "source": {"type": "sql",
                            "sql": f"SELECT * FROM cap_batch_{i}"},
                 "target": "v_b"},
                {"name": "dd", "type": "transform", "transform_type": "dedup",
                 "source": "v_b", "target": "v_pairs",
                 "dedup": {"method": "incremental",
                           "index_table": "m.d.bands",
                           "grams_table": "m.d.grams",
                           "max_bucket_size": 4}},
                {"name": "mv", "type": "write", "source": "v_pairs",
                 "write_target": {"type": "materialized_view", "catalog": "m",
                                  "schema": "d", "table": f"pairs_{i}"}},
            ],
        })

    runner.run(fg(0))
    with _pytest.raises(ValueError, match="crossing"):
        runner.run(fg(1))


def test_incremental_dedup_metaless_store_stays_layout_consistent(spark, tmp_path):
    """ADVICE r12 (medium): adaptive creation-time bucket sizing is only
    sound when the store persists the chosen count — a meta-less store
    would hash files with the adaptive n while later reads fall back to
    INDEX_BUCKETS, so pruned reads would filter with the wrong modulus and
    silently drop matching history.  A store without set_meta/get_meta
    must therefore create with INDEX_BUCKETS (creation and read fallback
    agree) — pruning then loses no rows."""
    from lakehouse_plumber_spark.llm.dedup import (
        INDEX_BUCKETS,
        _pruned_index_read,
        incremental_dedup_batch,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    class _MetaLess:
        _HIDDEN = ("set_meta", "get_meta")

        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, n):
            if n in self._HIDDEN:
                raise AttributeError(n)
            return getattr(self._inner, n)

    inner = ParquetTableStore(spark, str(tmp_path / "s"))
    store = _MetaLess(inner)
    df = _clique_corpus(spark)
    for i in range(2):
        incremental_dedup_batch(
            df.where(f"pmod(doc_id, 2) = {i}"), store, "m.d.bands", "m.d.grams"
        )
    # the real sidecar kept no bucket meta...
    assert inner.get_meta("m.d.bands", "index_buckets") is None
    # ...so reads fall back to INDEX_BUCKETS, which must be the modulus the
    # files were hashed with: a pruned read over every id must see every row
    # (with an adaptive-creation mismatch most rows silently vanish here)
    pruned = _pruned_index_read(
        store, "m.d.grams", df.select("doc_id"), ["doc_id"], INDEX_BUCKETS
    )
    assert pruned.count() == df.count()


def test_incremental_dedup_rejects_nonpositive_index_buckets(spark, tmp_path):
    """ADVICE r12 (low): an explicit index_buckets=0 used to be silently
    coerced to the 64 default by `or` (and would yield null buckets in
    pmod at creation); it must fail loudly instead."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.dedup import incremental_dedup_batch
    from lakehouse_plumber_spark.tables import ParquetTableStore

    store = ParquetTableStore(spark, str(tmp_path / "s"))
    with _pytest.raises(ValueError, match="index_buckets"):
        incremental_dedup_batch(
            _clique_corpus(spark), store, "m.d.bands", "m.d.grams",
            index_buckets=0,
        )


def test_stream_incremental_dedup_restart_after_midbatch_crash(spark, tmp_path):
    """r13 (VERDICT r12 item #6): the r12 retry property tests injected
    crashes at the HELPER level; this drives the same contract through a
    real Structured Streaming restart.  A foreachBatch micro-batch crashes
    between appends (bands committed, grams not); the stream dies; a
    restart from the same checkpoint replays the uncommitted micro-batch
    with retry=True, whose per-row masking absorbs the partial state — the
    accumulated pairs still equal the one-shot oracle."""
    import pytest as _pytest

    from lakehouse_plumber_spark.llm.dedup import (
        incremental_dedup_batch,
        minhash_lsh_dedup,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    df = _clique_corpus(spark)
    one_shot = sorted(
        (r.id_a, r.id_b, r.jaccard) for r in minhash_lsh_dedup(df).collect()
    )
    assert one_shot
    land = str(tmp_path / "land")
    df.repartition(3).write.mode("overwrite").json(land)
    store = ParquetTableStore(spark, str(tmp_path / "wh"))

    class _CrashFirstGramsAppend:
        """Raises on the FIRST grams append — i.e. the first micro-batch
        that reaches an existing grams table dies after its bands append
        committed but before grams/pairs (the mid-batch seam)."""

        def __init__(self, inner):
            self._inner, self.crashes = inner, 0

        def append(self, name, df, **kw):
            if name.endswith("grams") and self.crashes == 0:
                self.crashes += 1
                raise RuntimeError("injected mid-batch crash before grams append")
            return self._inner.append(name, df, **kw)

        def __getattr__(self, n):
            return getattr(self._inner, n)

    ckpt = str(tmp_path / "ckpt")

    def run_stream(handler):
        return (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", "1").json(land)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(handler).trigger(availableNow=True).start()
        )

    crashing = _CrashFirstGramsAppend(store)
    q1 = run_stream(
        lambda bdf, _e: incremental_dedup_batch(
            bdf, crashing, "m.d.bands", "m.d.grams", pairs_table="m.d.pairs"
        )
    )
    with _pytest.raises(Exception):
        q1.awaitTermination()
    assert crashing.crashes == 1
    # restart from the same checkpoint: the failed micro-batch replays
    # first; retry=True is idempotent for it AND a no-op mask for the
    # clean batches after it
    q2 = run_stream(
        lambda bdf, _e: incremental_dedup_batch(
            bdf, store, "m.d.bands", "m.d.grams", pairs_table="m.d.pairs",
            retry=True,
        )
    )
    q2.awaitTermination()
    accumulated = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in store.read("m.d.pairs").collect()
    )
    assert accumulated == one_shot
    grams = store.read("m.d.grams")
    assert grams.count() == 12
    assert grams.select("doc_id").distinct().count() == 12


def test_stream_ann_restart_after_midbatch_crash(spark, tmp_path):
    """r13 (VERDICT r12 item #6), the ANN twin: an IVF arrival stream's
    micro-batch PARTIALLY commits its append (half the rows' files land)
    then crashes; the stream restarts from its checkpoint with retry=True,
    whose per-id anti-join appends exactly the missing rows — probing all
    lists afterwards still equals brute force over the full corpus."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_search,
        knn_bruteforce,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    vecs = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> cast(sin(id * 0.31 + j) AS double))"
        ).alias("embedding"),
    )
    base = vecs.where("vec_id < 20")
    arrivals = vecs.where("vec_id >= 20")
    land = str(tmp_path / "land")
    arrivals.repartition(2).write.mode("overwrite").parquet(land)
    store = ParquetTableStore(spark, str(tmp_path / "wh"))
    ivf_index_build(base, store, "m.a.ivf", n_centroids=4)

    class _PartialCommitFirstAppend:
        def __init__(self, inner):
            self._inner, self.crashes = inner, 0

        def append(self, name, df, **kw):
            if name == "m.a.ivf" and self.crashes == 0:
                self.crashes += 1
                self._inner.append(name, df.where("pmod(id, 2) = 0"), **kw)
                raise RuntimeError("injected partial-commit crash")
            return self._inner.append(name, df, **kw)

        def __getattr__(self, n):
            return getattr(self._inner, n)

    ckpt = str(tmp_path / "ckpt")

    def run_stream(st, retry):
        return (
            spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>")
            .option("maxFilesPerTrigger", "1").parquet(land)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda bdf, _e: ivf_index_append(bdf, st, "m.a.ivf", retry=retry)
            )
            .trigger(availableNow=True).start()
        )

    crashing = _PartialCommitFirstAppend(store)
    q1 = run_stream(crashing, retry=False)
    with _pytest.raises(Exception):
        q1.awaitTermination()
    assert crashing.crashes == 1
    q2 = run_stream(store, retry=True)
    q2.awaitTermination()
    index = store.read("m.a.ivf")
    assert index.count() == 60
    assert index.select("id").distinct().count() == 60
    qids = [1, 25, 55]
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_index_search(store, "m.a.ivf", qids, k=3, n_probe=4).collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in knn_bruteforce(vecs, qids, k=3).collect()
    )
    assert got == want


def test_emb_lsh_input_single_evaluation_paths_agree(spark):
    """r14 (VERDICT r13 item #2): a bare storage scan keeps the cheap
    metadata-count + limit-1 probe shape, while a transformed input is
    materialized once and probed from the checkpoint — the two paths must
    emit identical pairs, and the plan classifier must separate them."""
    from lakehouse_plumber_spark.llm.dedup import (
        _plan_is_bare_scan,
        embedding_near_dup_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert _plan_is_bare_scan(emb)
    assert _plan_is_bare_scan(
        emb.select("vec_id", "embedding").where("vec_id >= 0")
    )
    # an already-materialized input re-reads from the block manager — as
    # cheap as a scan, so no second materialization
    assert _plan_is_bare_scan(emb.localCheckpoint(eager=True))
    # a CACHED input counts too: InMemoryRelation's tree string embeds the
    # cached physical plan as child lines, which must not trip the
    # allowlist (they describe what is already materialized)
    cached = emb.select("vec_id", "embedding").cache()
    try:
        assert _plan_is_bare_scan(cached)
    finally:
        cached.unpersist()
    # a union is not a bare scan (re-executing it repeats real work), nor
    # is anything with an aggregate/join upstream
    transformed = emb.unionByName(emb.where("vec_id < 0"))
    assert not _plan_is_bare_scan(transformed)
    assert not _plan_is_bare_scan(emb.groupBy("vec_id").agg(F.first("embedding")))
    bare = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(emb, threshold=0.3).collect()
    }
    ckpt = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(transformed, threshold=0.3).collect()
    }
    assert bare == ckpt and len(bare) > 0


def test_emb_lsh_probe_guards(spark):
    """Input-probe edge cases on both evaluation paths: an id_col that
    collides with an internal column refuses up front (it would key the
    band join on garbage), and a corpus with no non-null vectors raises
    the same clean ValueError on the bare-scan and the transformed path —
    including under ANSI-off sessions, where size(NULL) is -1 rather than
    NULL and a naive first(size(v), ignorenulls) would report dim=-1 and
    collapse every signature into one bucket."""
    import pytest

    from lakehouse_plumber_spark.llm.dedup import embedding_near_dup_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="internal column"):
        embedding_near_dup_lsh(
            emb.withColumnRenamed("vec_id", "nrm"), id_col="nrm"
        )

    allnull = emb.select(
        "vec_id", F.lit(None).cast("array<double>").alias("embedding")
    )
    with pytest.raises(ValueError, match="no non-null vectors"):
        embedding_near_dup_lsh(allnull)  # bare-scan path
    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        assert spark.sql(
            "SELECT size(CAST(NULL AS array<double>))"
        ).first()[0] == -1  # the hazard this test pins against
        with pytest.raises(ValueError, match="no non-null vectors"):
            # union defeats the bare-scan classifier -> checkpoint path
            embedding_near_dup_lsh(allnull.unionByName(allnull.limit(0)))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)


def test_concurrent_writer_refusal_on_persisted_indexes(spark, tmp_path):
    """r14 (VERDICT r13 item #4): both persisted-index append surfaces run
    under the store writer lock — a second pipeline holding the lock makes
    the call REFUSE with ConcurrentWriterError (it would otherwise probe
    the index before the holder's append landed and silently miss
    cross-batch pairs); once released, the same call proceeds and the
    refused attempt has left no partial state behind."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.dedup import incremental_dedup_batch
    from lakehouse_plumber_spark.llm.similarity import (
        ivf_index_append,
        ivf_index_build,
    )
    from lakehouse_plumber_spark.tables import (
        ConcurrentWriterError,
        ParquetTableStore,
    )

    store = ParquetTableStore(spark, str(tmp_path / "cw"))
    docs = _clique_corpus(spark)
    b0, b1 = docs.where("pmod(doc_id, 2) = 0"), docs.where("pmod(doc_id, 2) = 1")
    incremental_dedup_batch(b0, store, "c.w.bands", "c.w.grams", "c.w.pairs")
    grams_before = store.read("c.w.grams").count()
    with store.writer_lock("c.w.bands", owner="other-pipeline"):
        with pytest.raises(ConcurrentWriterError, match="other-pipeline"):
            incremental_dedup_batch(b1, store, "c.w.bands", "c.w.grams", "c.w.pairs")
    # the refused attempt appended nothing and did not break the lock
    assert store.read("c.w.grams").count() == grams_before
    # released -> proceeds, and the full pair set still accumulates
    incremental_dedup_batch(b1, store, "c.w.bands", "c.w.grams", "c.w.pairs")
    assert store.read("c.w.pairs").count() > 0

    vecs = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> cast(sin(id * 0.37 + j) AS double))"
        ).alias("embedding"),
    )
    ivf_index_build(vecs.where("vec_id < 30"), store, "c.w.ivf", n_centroids=4)
    arriving = vecs.where("vec_id >= 30")
    with store.writer_lock("c.w.ivf", owner="other-pipeline"):
        with pytest.raises(ConcurrentWriterError, match="other-pipeline"):
            ivf_index_append(arriving, store, "c.w.ivf")
        # a REBUILD racing an appender is the same silent-drop hazard
        # (build's overwrite would discard a concurrently appended batch),
        # so ivf_index_build shares the appender's lock
        with pytest.raises(ConcurrentWriterError, match="other-pipeline"):
            ivf_index_build(vecs, store, "c.w.ivf", n_centroids=4)
    ivf_index_append(arriving, store, "c.w.ivf")
    assert store.read("c.w.ivf").count() == 40


def test_ivf_torn_rebuild_detected(spark, tmp_path):
    """ivf_index_build writes assignments and centroids as two overwrites;
    a crash in between leaves rows partitioned by new centroids while
    __centroids holds the old set — search would probe the wrong lists
    silently.  The build brackets the writes with a `rebuilding` meta
    flag: a torn index refuses search AND append with an actionable
    error, and re-running the build clears it."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_search,
    )
    from lakehouse_plumber_spark.tables import ParquetTableStore

    store = ParquetTableStore(spark, str(tmp_path / "torn"))
    vecs = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> cast(sin(id * 0.37 + j) AS double))"
        ).alias("embedding"),
    )
    ivf_index_build(vecs, store, "t.r.ivf", n_centroids=4)
    # simulate the crash window: flag set, process died before clearing
    store.set_meta("t.r.ivf", "rebuilding", True)
    with pytest.raises(RuntimeError, match="rebuild crashed"):
        ivf_index_search(store, "t.r.ivf", [0], k=2)
    with pytest.raises(RuntimeError, match="rebuild crashed"):
        ivf_index_append(vecs.limit(1), store, "t.r.ivf")
    # recovery = re-run the build; both surfaces work again
    ivf_index_build(vecs, store, "t.r.ivf", n_centroids=4)
    assert ivf_index_search(store, "t.r.ivf", [0], k=2).count() > 0
    ivf_index_append(
        vecs.select(F.col("vec_id") + 100, "embedding").toDF("vec_id", "embedding"),
        store, "t.r.ivf",
    )
    assert store.read("t.r.ivf").count() == 60


def test_ivfpq_search_unknown_query_id_raises(spark):
    """Same query-id contract as ivf_index_search: an id absent from the
    collection raises KeyError instead of silently vanishing from the
    output (indistinguishable from 'no neighbors found')."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.similarity import ivfpq_search

    vecs = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), j -> cast(sin(id * 0.37 + j) AS double))"
        ).alias("embedding"),
    )
    with pytest.raises(KeyError, match="999"):
        ivfpq_search(vecs, [5, 999], k=3)


def test_simhash_max_hamming_validated(spark):
    """max_hamming beyond the fingerprint width would give every segment
    zero bits — all rows collide in every segment bucket and the banded
    equi-join silently degenerates to O(n^2).  Refused loudly."""
    from lakehouse_plumber_spark.llm.dedup import (
        SIMHASH_BITS,
        simhash_near_dup_pairs,
    )

    df = _clique_corpus(spark)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(df, max_hamming=SIMHASH_BITS)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(df, max_hamming=-1)
    # boundary: widest legal setting still runs (1 bit per segment)
    simhash_near_dup_pairs(df, max_hamming=SIMHASH_BITS - 1).count()


def test_ngram_jaccard_doc_freq_cap(spark):
    """max_doc_freq drops ubiquitous shingles from the candidate join only:
    denominators keep full shingle-set sizes, so the capped run's pairs are
    a subset of the uncapped run's (Jaccard only ever under-estimated) and
    pairs NOT held together by the hot shingles are unaffected."""
    from lakehouse_plumber_spark.llm.dedup import ngram_jaccard_pairs

    df = _clique_corpus(spark)
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.5, max_doc_freq=3).collect()
    }
    assert set(capped) <= set(uncapped)
    for k, j in capped.items():
        assert j <= uncapped[k] + 1e-9


def test_emb_lsh_null_vectors_excluded(spark):
    """NULL embeddings must not enter candidate generation: every null
    vector hashes to signature 0, so m null rows would band-collide into
    O(m^2) candidate pairs that die only after the shuffle.  Pairs over a
    corpus with nulls must equal the pairs over the same corpus with the
    null rows removed — on both evaluation paths."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.dedup import embedding_near_dup_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    nulls = spark.range(10_000, 10_050).select(
        F.col("id").alias("vec_id"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit("x").alias("label"),
    )
    with_nulls = emb.unionByName(nulls)
    clean = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(emb, threshold=0.3).collect()
    }
    dirty = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_lsh(with_nulls, threshold=0.3).collect()
    }
    assert clean == dirty and len(clean) > 0


def test_minhash_signatures_from_hashes_bit_identical(spark, testdata):
    """incremental_dedup_batch derives signatures AND gram index rows from
    ONE checkpointed tokenize+md5 pass; the from-hashes signature fold must
    be bit-identical to the from-text one (same md5 array, same mix
    coefficients, same array_min fold) or the incremental index silently
    diverges from the one-shot oracle."""
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark.llm.dedup import (
        SHINGLE_N,
        minhash_signatures,
        minhash_signatures_from_hashes,
        word_ngrams_spark,
    )
    from lakehouse_plumber_spark.llm.hashing import md5int_spark

    docs = spark.table("documents").select("doc_id", "text")
    from_text = minhash_signatures(docs).orderBy("doc_id").collect()
    hashed = docs.select(
        F.col("doc_id"),
        F.expr(
            f"transform({word_ngrams_spark('text', SHINGLE_N)}, "
            f"g -> {md5int_spark('g')})"
        ).alias("grams"),
    )
    from_hashes = minhash_signatures_from_hashes(hashed).orderBy("doc_id").collect()
    assert from_text == from_hashes and len(from_text) > 0
