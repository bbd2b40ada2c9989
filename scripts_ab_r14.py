"""Round-14 A/B: old (pre-6a3dff9) vs new operator implementations, timed
INTERLEAVED in one session so the box's contention waves divide out of the
ratio (the BASELINE.md round-13/14 bench-noise protocol).

The "old" variants are verbatim re-implementations of the pre-commit code
(explode-aggregate top2, un-checkpointed band/fp/gram fan-outs, groupBy+join
cluster sizes, double-tokenizing BM25/bigram).  Each pair runs
LHP_AB_RUNS (default 3) alternating old/new timed executions after one
untimed warm each; the minimum of each side is reported with the ratio.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts_ab_r14.py [pair ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def old_top_ngram_fraction(df, text_col="text", id_col="doc_id", n=2, out="top2_frac"):
    from lakehouse_plumber_spark.llm.dedup import spread_for_compute
    from lakehouse_plumber_spark.llm.hashing import word_ngrams_all_spark

    g = word_ngrams_all_spark(text_col, n)
    return (
        spread_for_compute(df, [id_col, text_col])
        .select(F.col(id_col), F.explode(F.expr(g)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.round(F.max("c") / F.sum("c").cast("double"), 6).alias(out))
    )


def old_repetition_metrics(df, text_col="text", id_col="doc_id"):
    from lakehouse_plumber_spark.llm.dedup import spread_for_compute
    from lakehouse_plumber_spark.llm.text import dup_ngram_fraction_expr

    base = spread_for_compute(df, [id_col, text_col])
    dup5 = base.select(
        F.col(id_col), F.expr(dup_ngram_fraction_expr(text_col)).alias("dup5_frac")
    )
    return old_top_ngram_fraction(base, text_col, id_col).join(dup5, id_col)


def old_lsh_candidate_pairs(sigs, id_col="doc_id", max_bucket_size=32):
    from lakehouse_plumber_spark.llm.dedup import LSH_BANDS, LSH_ROWS, lsh_bands

    banded = lsh_bands(sigs, id_col, LSH_BANDS, LSH_ROWS)  # no checkpoint
    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "h").agg(F.count(F.lit(1)).alias("__bn"))
        banded = banded.join(
            sizes.where(F.col("__bn") <= max_bucket_size), on=["band", "h"]
        ).drop("__bn")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "h"], how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def old_minhash_lsh_dedup(df, text_col="text", id_col="doc_id", jaccard_threshold=0.5):
    from lakehouse_plumber_spark.llm.dedup import (
        MINHASH_K, SHINGLE_N, spread_for_compute,
    )
    from lakehouse_plumber_spark.llm.hashing import (
        md5int_spark, minhash_coeffs, minhash_mix, word_ngrams_spark,
    )

    grams = (
        spread_for_compute(df, [id_col, text_col])
        .select(
            F.col(id_col),
            F.expr(
                f"transform({word_ngrams_spark(text_col, SHINGLE_N)}, g -> {md5int_spark('g')})"
            ).alias("grams"),
        )
        .localCheckpoint(eager=True)
    )
    sig_entries = ", ".join(
        f"array_min(transform(grams, h -> {minhash_mix(a, b, c, 'h', 'spark')}))"
        for a, b, c in minhash_coeffs(MINHASH_K)
    )
    sigs = grams.select(F.col(id_col), F.expr(f"array({sig_entries})").alias("sig"))
    cands = old_lsh_candidate_pairs(sigs, id_col)
    return (
        cands.join(grams.withColumnRenamed(id_col, "id_a").withColumnRenamed("grams", "ga"), "id_a")
        .join(grams.withColumnRenamed(id_col, "id_b").withColumnRenamed("grams", "gb"), "id_b")
        .withColumn("inter", F.expr("size(array_intersect(ga, gb))"))
        .withColumn("uni", F.expr("size(ga) + size(gb) - size(array_intersect(ga, gb))"))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def old_edit_distance_dedup(df, text_col="text", id_col="doc_id", max_distance=24):
    from lakehouse_plumber_spark.llm.dedup import minhash_signatures, spread_for_compute

    base = spread_for_compute(df, [id_col, text_col]).select(
        F.col(id_col), F.col(text_col).alias("__t")
    )
    sigs = minhash_signatures(df, text_col, id_col)
    cands = old_lsh_candidate_pairs(sigs, id_col)
    return (
        cands.join(base.select(F.col(id_col).alias("id_a"), F.col("__t").alias("ta")), "id_a")
        .join(base.select(F.col(id_col).alias("id_b"), F.col("__t").alias("tb")), "id_b")
        .where(F.abs(F.length("ta") - F.length("tb")) <= max_distance)
        .withColumn("distance", F.levenshtein("ta", "tb", max_distance))
        .where(F.col("distance") >= 0)
        .select("id_a", "id_b", F.col("distance").cast("long").alias("distance"))
    )


def old_ngram_jaccard_pairs(df, text_col="text", id_col="doc_id", n=3, threshold=0.5):
    from lakehouse_plumber_spark.llm.dedup import spread_for_compute
    from lakehouse_plumber_spark.llm.hashing import word_ngrams_spark

    grams = spread_for_compute(df, [id_col, text_col]).select(
        F.col(id_col), F.explode(F.expr(word_ngrams_spark(text_col, n))).alias("g")
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, on="g")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        shared.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sza"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "szb"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def old_containment_dedup(df, text_col="text", id_col="doc_id", containment_threshold=0.8):
    from lakehouse_plumber_spark.llm.dedup import SHINGLE_N, spread_for_compute
    from lakehouse_plumber_spark.llm.hashing import word_ngrams_spark

    grams = spread_for_compute(df, [id_col, text_col]).select(
        F.col(id_col),
        F.explode(F.expr(word_ngrams_spark(text_col, SHINGLE_N))).alias("g"),
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, on="g")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        shared.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sza"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "szb"), "id_b")
        .withColumn("containment", F.round(F.col("inter") / F.expr("least(sza, szb)"), 6))
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6))
        .where(F.col("containment") >= containment_threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def old_crossdoc(df, text_col="text", id_col="doc_id", n=3, min_docs=2):
    from lakehouse_plumber_spark.llm.dedup import spread_for_compute
    from lakehouse_plumber_spark.llm.hashing import word_ngrams_spark

    grams = spread_for_compute(df, [id_col, text_col]).select(
        F.col(id_col), F.explode(F.expr(word_ngrams_spark(text_col, n))).alias("g")
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    flagged = grams.join(freq, on="g").withColumn(
        "__dup", (F.col("__df") >= F.lit(min_docs)).cast("int")
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("__dup").cast("long").alias("dup_grams"),
        )
        .withColumn("dup_frac", F.round(F.col("dup_grams") / F.col("n_grams"), 6))
    )


def old_simhash_pairs(df, text_col="text", id_col="doc_id", max_hamming=3):
    from lakehouse_plumber_spark.llm.dedup import SIMHASH_BITS, simhash_fingerprints

    nseg = max_hamming + 1
    seg_bits = SIMHASH_BITS // nseg
    fp = simhash_fingerprints(df, text_col, id_col)  # no checkpoint
    segs = ", ".join(
        f"named_struct('seg', {s}, 'v', shiftright(fp, {s * seg_bits}) % {1 << seg_bits})"
        for s in range(nseg)
    )
    banded = fp.select(
        id_col, "fp", F.explode(F.expr(f"array({segs})")).alias("sg")
    ).select(id_col, "fp", F.col("sg.seg").alias("seg"), F.col("sg.v").alias("v"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["seg", "v"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def old_clusters(pairs):
    """Pre-r14 final step: groupBy sizes + join (propagation itself shared)."""
    from lakehouse_plumber_spark.llm import dedup as D

    cc = D.dedup_connected_components(pairs)
    # reconstitute the old two-exchange shape on top of the same labels:
    lab = cc.select(F.col("doc_id").alias("id"), F.col("cluster_id").alias("lbl"))
    sizes = lab.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(sizes, "lbl").select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def old_bm25(df, terms, k=20, k1=1.2, b=0.75):
    from lakehouse_plumber_spark.llm.search import _norm_terms, _score_exprs, _tf_expr
    from lakehouse_plumber_spark.llm.hashing import let_spark, tokens_spark

    terms = _norm_terms(terms)
    nq = len(terms)
    fields = ", ".join(
        ["'dl', cast(size(toks) AS bigint)"]
        + [_tf_expr(t, i, "spark") for i, t in enumerate(terms)]
    )
    s_expr = let_spark(tokens_spark("lower(coalesce(text, ''))"), "toks", f"named_struct({fields})")
    base = df.selectExpr("doc_id AS doc_id", f"{s_expr} AS s").select("doc_id", "s.*")
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("double").alias("total_dl"),
        *[
            F.expr(f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)").cast("long").alias(f"df_{i}")
            for i in range(nq)
        ],
    )
    hits, score = _score_exprs(nq, k1, b, "spark")
    scored = (
        base.crossJoin(F.broadcast(stats))
        .selectExpr("doc_id", f"{hits} AS n_terms_hit", f"{score} AS score")
        .where("n_terms_hit > 0")
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "doc_id", "n_terms_hit", "score"
    )


def old_bm25_postings(docs, query_terms, k=20, k1=1.2, b=0.75):
    from lakehouse_plumber_spark.llm.search import _norm_terms
    from lakehouse_plumber_spark.llm.hashing import tokens_spark

    query_terms = _norm_terms(query_terms)
    dec = "decimal(18,6)"
    toks_expr = tokens_spark("lower(coalesce(text, ''))")
    base = docs.selectExpr("doc_id AS doc_id", f"{toks_expr} AS toks").select(
        "doc_id", F.col("toks"), F.expr("cast(size(toks) AS bigint)").alias("dl")
    )
    corpus = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("double").alias("total_dl"),
    )
    posts = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(query_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfs = posts.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    part = (
        "ln((cast(n_docs AS double) - df + 0.5) / (df + 0.5) + 1.0)"
        f" * (tf * (1.0 + {k1})) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl * cast(n_docs AS double) / total_dl))"
    )
    scored = (
        posts.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.expr(f"cast(sum(CAST({part} AS {dec})) AS double)").alias("score"),
        )
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "doc_id", "n_terms_hit", "score"
    )


def old_bigram_logprob(df, text_col="text", id_col="doc_id", k_smooth=0.5):
    from lakehouse_plumber_spark.llm.hashing import tokens_spark, word_ngrams_all_spark

    toks = tokens_spark(f"lower({text_col})")
    uni = (
        df.select(F.explode(F.expr(toks)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    vocab = uni.count()
    big = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(word_ngrams_all_spark(f"lower({text_col})", 2))).alias("g"),
    ).where("g LIKE '% %'")
    model = (
        big.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
        .withColumn("w1", F.expr("substring_index(g, ' ', 1)"))
        .join(uni, F.col("w1") == F.col("w"))
        .selectExpr(
            "g",
            f"CAST(log2((CAST(cb AS DOUBLE) + {k_smooth}) / "
            f"(CAST(cu AS DOUBLE) + {k_smooth} * {vocab})) AS DECIMAL(18,6)) AS logp",
        )
    )
    return (
        big.join(model, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("CAST(SUM(logp) AS DOUBLE) / COUNT(*)").alias("mean_logprob"),
        )
    )


def old_spans(df, text_col="text", id_col="doc_id", k=8, min_docs=2):
    from lakehouse_plumber_spark.llm.dedup import spread_for_compute
    from lakehouse_plumber_spark.llm.hashing import md5int_spark, tokens_spark

    base = spread_for_compute(df, [id_col, text_col]).select(
        F.col(id_col), F.expr(tokens_spark(text_col)).alias("t")
    )
    gram_h = md5int_spark(f"array_join(slice(t, i, {k}), ' ')")
    win_expr = (
        f"CASE WHEN size(t) >= {k} THEN "
        f"transform(sequence(1, size(t) - {k - 1}), i -> named_struct('pos', i, 'h', {gram_h})) "
        f"ELSE array() END"
    )
    grams = (
        base.select(F.col(id_col), F.explode(F.expr(win_expr)).alias("w"))
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )
    dup_h = (
        grams.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") >= min_docs)
        .select("h")
    )
    covered = grams.join(dup_h, "h").groupBy(id_col).agg(
        F.sort_array(F.collect_set("pos")).alias("starts")
    )
    kept = (
        f"filter(transform(t, (tok, i0) -> "
        f"CASE WHEN exists(starts, s -> s <= i0 + 1 AND i0 + 1 < s + {k}) THEN NULL ELSE tok END), "
        f"x -> x IS NOT NULL)"
    )
    return (
        base.join(covered, id_col, "left")
        .withColumn("starts", F.coalesce("starts", F.expr("array()")))
        .select(
            F.col(id_col),
            F.expr("size(t)").cast("int").alias("n_tokens"),
            F.expr(f"size(t) - size({kept})").cast("int").alias("n_removed"),
            F.expr(f"array_join({kept}, ' ')").alias("cleaned_text"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("LHP_AB_RUNS", "3"))

    from lakehouse_plumber_spark import get_spark, register_testdata
    from lakehouse_plumber_spark.llm import dedup as D, search as SRCH, text as TX

    spark = get_spark("ab_r14")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf_dir)
    docs = spark.table("documents")
    spark.range(1).count()

    terms = ["the", "of", "report", "quarterly"]
    wide = ["the", "of", "report", "quarterly", "data", "market", "first",
            "second", "growth", "analysis", "summary", "review", "annual",
            "results", "performance", "update"]

    def pairs_src():
        return D.minhash_lsh_dedup(docs)

    PAIRS = {
        "repetition": (lambda: old_repetition_metrics(docs), lambda: TX.repetition_metrics(docs)),
        "minhash": (lambda: old_minhash_lsh_dedup(docs), lambda: D.minhash_lsh_dedup(docs)),
        "editdist": (lambda: old_edit_distance_dedup(docs), lambda: D.edit_distance_dedup(docs)),
        "jaccard": (lambda: old_ngram_jaccard_pairs(docs), lambda: D.ngram_jaccard_pairs(docs)),
        "containment": (lambda: old_containment_dedup(docs), lambda: D.containment_dedup(docs)),
        "crossdoc": (lambda: old_crossdoc(docs), lambda: D.crossdoc_dup_ngram_fraction(docs)),
        "simhash": (lambda: old_simhash_pairs(docs), lambda: D.simhash_near_dup_pairs(docs)),
        "clusters": (lambda: old_clusters(pairs_src()), lambda: D.dedup_connected_components(pairs_src())),
        "bm25": (lambda: old_bm25(docs, terms), lambda: SRCH.bm25_topk(docs, terms)),
        "bm25_postings": (
            lambda: old_bm25_postings(docs, wide, k=20),
            lambda: SRCH.bm25_topk_postings(docs, wide, k=20),
        ),
        "bigram": (lambda: old_bigram_logprob(docs), lambda: TX.bigram_logprob(docs)),
        "spans": (lambda: old_spans(docs), lambda: D.remove_duplicated_spans(docs)),
    }
    names = sys.argv[1:] or list(PAIRS)
    out = {}
    for name in names:
        oldf, newf = PAIRS[name]
        # one untimed warm each (shape compilation)
        spark.sparkContext.setJobDescription(f"ab:{name}:warm")
        oldf().write.format("noop").mode("overwrite").save()
        newf().write.format("noop").mode("overwrite").save()
        olds, news = [], []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"ab:{name}:old:{i}")
            t0 = time.time(); oldf().write.format("noop").mode("overwrite").save()
            olds.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"ab:{name}:new:{i}")
            t0 = time.time(); newf().write.format("noop").mode("overwrite").save()
            news.append(time.time() - t0)
        o, nsec = min(olds), min(news)
        out[name] = {
            "old_sec": round(o, 3), "new_sec": round(nsec, 3),
            "ratio_new_over_old": round(nsec / o, 3) if o else None,
            "runs": runs,
        }
        print(f"# {name}: old={o:.3f}s new={nsec:.3f}s ratio={nsec/o:.3f}", file=sys.stderr)
    print(json.dumps({"metric": "ab_r14", "sf_dir": sf_dir, "pairs": out}))


if __name__ == "__main__":
    main()
