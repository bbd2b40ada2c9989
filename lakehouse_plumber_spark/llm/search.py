"""Keyword retrieval over a document corpus: BM25 scoring + top-k ranking.

Okapi BM25 (Robertson & Zaragoza 2009): for a query term set Q and document
d, score(d) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)),
with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1).  This is the lexical
half of every retrieval pipeline (and the hard-negative miner for embedding
training); the engine's ANN family (`llm/similarity.py`) is the dense half.

Scale design (100 TB corpus, keyword-sized query): per-term frequencies are
UNROLLED as |Q| narrow `size(filter(tokens, ...))` expressions — no explode,
no per-(doc,term) rows, no join.  Pass 1 materializes the narrow per-doc
term-frequency base ONCE, with the corpus stats (N, Σdl, df per term)
riding that job as an `Observation` (r15 — previously a separate 1-row
aggregate + broadcast); pass 2 re-enters the stats as exact integer
literals and scores each document in a single codegen'd projection,
finishing with a distributed `TakeOrderedAndProject` top-k.  One
column-pruned scan total — the BM25 floor (corpus statistics must be
complete before any document can be scored) without re-tokenizing the
corpus.  For wider query sets the classic explode →
prune-at-Generate → broadcast-stats postings plan (`bm25_topk_postings`) is
the right shape: the r8 width study (docs/operators.md "BM25 query width")
measured the crossover at ≈8 terms on sf0.1, with the unrolled plan hitting
a Catalyst expression-size cliff at 16 (6x) and unusable analysis times by
24 — unrolling targets the interactive keyword/hard-negative case only.

Cross-engine determinism: per-term score parts are double expressions
written identically in the DuckDB oracle, each cast to DECIMAL(18,6) and
added in fixed term order (exact decimal sum), ranked by the resulting
score with doc_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from lakehouse_plumber_spark.materialize import materialize_once

from .hashing import tokens_duck, tokens_spark

_DEC = "DECIMAL(18,6)"


def _norm_terms(query_terms: list[str]) -> list[str]:
    """Document text is matched lowercased, so terms must be too — a
    mixed-case query term would otherwise silently match nothing.  Dedup
    after casefolding (order-preserving): BM25 scores a term SET, and a
    colliding duplicate would double that term's contribution."""
    out: list[str] = []
    for t in query_terms:
        low = t.lower()
        if low not in out:
            out.append(low)
    return out


def _spark_str_lit(term: str) -> str:
    """`term` as a quoted Spark-SQL string literal.  Spark string literals
    treat backslash as an escape (DuckDB does not), so BOTH backslash and
    quote must be doubled — the one-site-per-plan copies of this rule are
    what let the r14 postings pre-filter ship with the backslash half
    missing (a term like 'a\\b' silently failed to match; a trailing
    backslash raised ParseException)."""
    return "'" + term.replace("\\", "\\\\").replace("'", "''") + "'"


def _tf_expr(term: str, i: int, dialect: str) -> str:
    """Occurrences of `term` in the let-bound token array — narrow, no explode."""
    if dialect == "spark":
        return f"'tf_{i}', cast(size(filter(toks, x -> x = {_spark_str_lit(term)})) AS bigint)"
    lit = term.replace("'", "''")
    return f"CAST(len(list_filter(toks, x -> x = '{lit}')) AS BIGINT) AS tf_{i}"


def _part_expr(i: int, k1: float, b: float) -> str:
    """The term-i BM25 contribution — IDENTICAL text in both engines (all
    inputs are exact integers; one double expression tree; tf=0 → exactly
    0.0, so non-matching terms add exact-decimal zeros)."""
    return (
        f"ln((cast(n_docs AS double) - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * (1.0 + {k1})) / "
        f"(tf_{i} + {k1} * (1.0 - {b} + {b} * dl * cast(n_docs AS double) / total_dl))"
    )


def _score_exprs(nq: int, k1: float, b: float, dialect: str) -> tuple[str, str]:
    """(n_terms_hit, score) expression pair from tf_i/df_i/dl/n_docs/total_dl."""
    hits = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(nq)
    )
    dec = _DEC if dialect == "duck" else "decimal(18,6)"
    parts = " + ".join(f"CAST({_part_expr(i, k1, b)} AS {dec})" for i in range(nq))
    return f"CAST({hits} AS INT)", f"CAST({parts} AS DOUBLE)"


def _require_batch(docs: DataFrame, op: str) -> None:
    """The checkpointing BM25 operators run an EAGER materialization job at
    DataFrame-construction time, which a streaming input cannot do — refuse
    with a named error instead of localCheckpoint's opaque
    AnalysisException (ADVICE r14)."""
    if docs.isStreaming:
        raise ValueError(
            f"{op} materializes its tokenized base eagerly and cannot run "
            "on a streaming DataFrame — collect the stream into a batch "
            "(foreachBatch) first"
        )


def bm25_base_projection(
    docs: DataFrame, query_terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """The narrow pre-checkpoint projection of the unrolled plan:
    (doc_id, dl, tf_0..tf_n) — dl + all per-term tfs inside ONE let-bound
    lambda, so tokenization runs once per row no matter how many terms
    reference the token array and projection collapse cannot duplicate it
    (hashing.let_spark).  `query_terms` must already be `_norm_terms`-ed.

    Shared by `bm25_topk` and the column-pruning plan pin in
    test_plan_quality (ADVICE r14: the test previously hand-rebuilt this
    projection and would have asserted against a stale shape if the
    operator's internals moved)."""
    from .hashing import let_spark

    fields = ", ".join(
        ["'dl', cast(size(toks) AS bigint)"]
        + [_tf_expr(t, i, "spark") for i, t in enumerate(query_terms)]
    )
    s_expr = let_spark(
        tokens_spark(f"lower(coalesce({text_col}, ''))"),
        "toks",
        f"named_struct({fields})",
    )
    return docs.selectExpr(f"{id_col} AS doc_id", f"{s_expr} AS s").select(
        "doc_id", "s.*"
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_unrolled_terms: int = 12,
) -> DataFrame:
    """Top-k documents for `query_terms` by BM25: (rank, doc_id, n_terms_hit,
    score).  Ties rank by doc_id; only documents hitting ≥1 query term are
    candidates.

    NOTE: calling this function EXECUTES the corpus tokenization pass
    immediately (the narrow term-frequency base is materialized eagerly and
    shared by the stats and scoring passes); streaming inputs are refused.

    Queries wider than `max_unrolled_terms` (post-dedup) are refused loudly:
    the unrolled plan's Catalyst analysis cost cliffs past ~12 terms (6x at
    16, minutes at 24 — measured, docs/operators.md "BM25 query width");
    `bm25_topk_postings` returns identical results |Q|-flat.  Raise the cap
    explicitly only if you've measured your width on your Spark version."""
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    _require_batch(docs, "bm25_topk")
    if len(_norm_terms(query_terms)) > max_unrolled_terms:
        raise ValueError(
            f"bm25_topk got {len(_norm_terms(query_terms))} terms (cap "
            f"{max_unrolled_terms}): the unrolled plan's analysis cost cliffs "
            "past ~12 terms — use bm25_topk_postings (identical results, "
            "|Q|-flat) or pass max_unrolled_terms= explicitly"
        )
    query_terms = _norm_terms(query_terms)
    nq = len(query_terms)
    # materialize the narrow per-doc term-frequency table ONCE (r14): the
    # corpus stats and the scoring pass both consume `base`, and without
    # this each ran tokenization + per-term tf over the full text twice.
    # (doc_id, dl, tf_0..tf_n) is (nq+2) longs per doc — the lightweight
    # proxy the two passes should share; the text is read once.
    #
    # The corpus stats RIDE the materialization as an Observation (r15,
    # VERDICT r14 item #7): previously they were a separate 1-row aggregate
    # materialized as a broadcast-exchange job at action time; now the
    # checkpoint job computes them for free and they re-enter the scoring
    # expression as exact integer literals (df/n_docs are longs, total_dl
    # is CAST(<exact long sum> AS double) — bit-identical to the old
    # runtime cast).
    from pyspark.sql import Observation

    obs = Observation()
    base = (
        bm25_base_projection(docs, query_terms, text_col, id_col)
        .observe(
            obs,
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").alias("total_dl_sum"),
            *[
                F.expr(f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)")
                .cast("long")
                .alias(f"df_{i}")
                for i in range(nq)
            ],
        )
        .transform(materialize_once)
    )
    m = obs.get
    stats_sel = [
        f"CAST({int(m['n_docs'] or 0)} AS bigint) AS n_docs",
        f"CAST({int(m['total_dl_sum'] or 0)} AS double) AS total_dl",
    ] + [
        f"CAST({int(m[f'df_{i}'] or 0)} AS bigint) AS df_{i}" for i in range(nq)
    ]
    hits, score = _score_exprs(nq, k1, b, "spark")
    scored = (
        base.selectExpr("*", *stats_sel)
        .selectExpr("doc_id", f"{hits} AS n_terms_hit", f"{score} AS score")
        .where("n_terms_hit > 0")
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "doc_id", "n_terms_hit", "score"
    )


def bm25_topk_duck(
    table: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for `bm25_topk` — same unrolled expressions, same
    fixed-order exact-decimal sum, same (score desc, doc_id) rank order."""
    query_terms = _norm_terms(query_terms)
    nq = len(query_terms)
    toks = tokens_duck(f"lower(coalesce({text_col}, ''))")
    tfs = ",\n             ".join(_tf_expr(t, i, "duck") for i, t in enumerate(query_terms))
    dfs = ",\n             ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(nq)
    )
    hits, score = _score_exprs(nq, k1, b, "duck")
    return f"""
    WITH t AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}),
    d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
             {tfs}
          FROM t),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS DOUBLE) AS total_dl,
             {dfs}
          FROM d),
    scored AS (
      SELECT doc_id, {hits} AS n_terms_hit, {score} AS score
      FROM d CROSS JOIN stats),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM scored WHERE n_terms_hit > 0)
    SELECT CAST(rn AS INT) AS rank, doc_id, n_terms_hit, score
    FROM ranked WHERE rn <= {k}
    """


def bm25_topk_postings(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """`bm25_topk` via the classic postings plan — the WIDE-query shape the
    module docstring names: explode the token array, prune to query terms
    immediately after the Generate (surviving rows ∝ term matches, not corpus
    tokens), per-(doc, term) tf in one map-side-combined aggregate, term df
    and the 1-row corpus stats broadcast onto it, one final shuffle on doc_id.

    Work is |Q|-independent outside the pruning predicate, where the unrolled
    plan (`bm25_topk`) evaluates |Q| filter() passes per row — the measured
    crossover on sf0.1 documents is recorded in docs/operators.md; below it
    (interactive keyword queries) prefer `bm25_topk`, above it this plan.

    Output is IDENTICAL to `bm25_topk` (same rows, same scores): per-term
    score parts are cast to DECIMAL(18,6) BEFORE summation here exactly as
    they are in the unrolled fixed-order sum, and exact decimal addition is
    order-independent, so the two plans cannot diverge on ties. Shares
    `bm25_topk_duck` as its oracle for the same reason.
    """
    if not query_terms:
        raise ValueError("bm25_topk_postings needs at least one query term")
    _require_batch(docs, "bm25_topk_postings")
    query_terms = _norm_terms(query_terms)
    dec = "decimal(18,6)"

    toks_expr = tokens_spark(f"lower(coalesce({text_col}, ''))")
    # materialize a narrow per-doc projection ONCE (r14): dl plus the token
    # list PRE-FILTERED to query terms (identical to the explode-then-where
    # below — filter-then-explode emits the same multiset).  The corpus
    # aggregate and the postings explode both consume it, so the text is
    # tokenized once, and the checkpoint holds a few matching tokens per
    # doc instead of the full token array.
    #
    # Corpus stats AND per-term dfs ride the materialization as an
    # Observation (r15, VERDICT r14 item #7): df_t = docs with tf_t > 0 =
    # docs whose filtered token list contains t, so the separate
    # dfs-aggregate + broadcast join and the 1-row corpus broadcast are
    # replaced by exact integer literals (a literal term->df map for the
    # postings rows); values are bit-identical.
    terms_lit = ", ".join(_spark_str_lit(t) for t in query_terms)
    from pyspark.sql import Observation

    obs = Observation()
    base = (
        docs.selectExpr(f"{id_col} AS doc_id", f"{toks_expr} AS toks")
        .select(
            "doc_id",
            F.expr("cast(size(toks) AS bigint)").alias("dl"),
            F.expr(f"filter(toks, t -> t IN ({terms_lit}))").alias("toks"),
        )
        .observe(
            obs,
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").alias("total_dl_sum"),
            *[
                F.expr(
                    f"sum(CASE WHEN array_contains(toks, {_spark_str_lit(t)}) "
                    "THEN 1 ELSE 0 END)"
                )
                .cast("long")
                .alias(f"df_{i}")
                for i, t in enumerate(query_terms)
            ],
        )
        .transform(materialize_once)
    )
    m = obs.get
    n_docs = int(m["n_docs"] or 0)
    total_dl = int(m["total_dl_sum"] or 0)
    df_map = "map(" + ", ".join(
        f"{_spark_str_lit(t)}, CAST({int(m[f'df_{i}'] or 0)} AS bigint)"
        for i, t in enumerate(query_terms)
    ) + ")"
    posts = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    part = (
        f"ln((cast({n_docs} AS double) - df + 0.5) / (df + 0.5) + 1.0)"
        f" * (tf * (1.0 + {k1})) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl * cast({n_docs} AS double) / "
        f"CAST({total_dl} AS double)))"
    )
    scored = (
        posts.selectExpr("*", f"element_at({df_map}, term) AS df")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.expr(f"cast(sum(CAST({part} AS {dec})) AS double)").alias("score"),
        )
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "doc_id", "n_terms_hit", "score"
    )


# Measured unrolled->postings crossover on sf0.1 documents (r8 width study,
# docs/operators.md "BM25 query width"); re-measure if the corpus' token
# length distribution changes materially.
BM25_CROSSOVER_TERMS = 8


def bm25_choose_plan(query_terms: list[str], plan: str = "auto") -> str:
    """Resolve a requested plan ("auto"|"unrolled"|"postings") to a concrete
    one, using the measured term-count crossover for "auto".  Term count is
    taken post-casefold-dedup — the count the plans actually execute."""
    if plan not in ("auto", "unrolled", "postings"):
        raise ValueError(f"plan must be auto|unrolled|postings, got {plan!r}")
    if plan != "auto":
        return plan
    return (
        "unrolled"
        if len(_norm_terms(query_terms)) <= BM25_CROSSOVER_TERMS
        else "postings"
    )


def bm25_scored_sql(
    view: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    plan: str = "auto",
) -> str:
    """Spark-SQL text for the SCORED stage (doc_id, n_terms_hit, score) of
    BM25 over `view` — the compile-time seam `codegen.py` uses so a
    generated pipeline runs retrieval with no engine import.  Emits the
    resolved plan's shape: unrolled (CTE per stage, |Q| filter()
    expressions, broadcast-hinted 1-row stats) or postings (LATERAL VIEW
    explode pruned by the term list, broadcast-hinted df/corpus joins).
    Top-k ranking is left to the caller (orderBy().limit() compiles to a
    distributed TakeOrderedAndProject; a SQL row_number() here would be a
    single-partition window over every candidate).  Score expressions are
    byte-identical to the DataFrame plans', so generated output matches
    the engine's bit-for-bit."""
    terms = _norm_terms(query_terms)
    plan = bm25_choose_plan(terms, plan)
    nq = len(terms)
    toks = tokens_spark(f"lower(coalesce({text_col}, ''))")
    if plan == "unrolled":
        tfs = ",\n         ".join(
            f"cast(size(filter(toks, x -> x = '{t.replace(chr(92), chr(92)*2).replace(chr(39), chr(39)*2)}')) AS bigint) AS tf_{i}"
            for i, t in enumerate(terms)
        )
        dfs = ",\n         ".join(
            f"cast(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS bigint) AS df_{i}"
            for i in range(nq)
        )
        hits, score = _score_exprs(nq, k1, b, "spark")
        return f"""
    WITH t AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {view}),
    d AS (SELECT doc_id, cast(size(toks) AS bigint) AS dl,
         {tfs}
       FROM t),
    stats AS (SELECT cast(count(*) AS bigint) AS n_docs,
         cast(sum(dl) AS double) AS total_dl,
         {dfs}
       FROM d)
    SELECT /*+ BROADCAST(stats) */ doc_id,
           {hits} AS n_terms_hit, {score} AS score
    FROM d CROSS JOIN stats
    WHERE {hits} > 0
    """
    term_list = ", ".join(
        "'" + t.replace("\\", "\\\\").replace("'", "''") + "'" for t in terms
    )
    part = (
        "ln((cast(n_docs AS double) - df + 0.5) / (df + 0.5) + 1.0)"
        f" * (tf * (1.0 + {k1})) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl * cast(n_docs AS double) / total_dl))"
    )
    return f"""
    WITH t AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {view}),
    base AS (SELECT doc_id, cast(size(toks) AS bigint) AS dl, toks FROM t),
    corpus AS (SELECT cast(count(*) AS bigint) AS n_docs,
                      cast(sum(dl) AS double) AS total_dl FROM base),
    posts AS (SELECT doc_id, dl, term, cast(count(*) AS bigint) AS tf
              FROM base LATERAL VIEW explode(toks) x AS term
              WHERE term IN ({term_list})
              GROUP BY doc_id, dl, term),
    dfs AS (SELECT term, cast(count(*) AS bigint) AS df FROM posts GROUP BY term)
    SELECT /*+ BROADCAST(dfs), BROADCAST(corpus) */ doc_id,
           cast(count(*) AS int) AS n_terms_hit,
           cast(sum(CAST({part} AS decimal(18,6))) AS double) AS score
    FROM posts JOIN dfs USING (term) CROSS JOIN corpus
    GROUP BY doc_id
    """


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 20,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009): combine any
    number of top-k rankings — lexical BM25, dense ANN, recency, … — into
    one list by score(d) = Σ_lists 1/(k_rrf + rank_list(d)), the standard
    hybrid-retrieval merge that needs no score calibration between lists.
    Input DataFrames need (id_col, rank); output: (rank, id_col, n_lists,
    rrf_score) for the fused top-`k`, ties broken by id.

    Determinism: ranks are integers, each term 1/(60+rank) is one IEEE
    division, and the terms are added in FIXED list order (an expression,
    not an aggregate), so the DuckDB oracle reproduces scores bit-for-bit.

    Scale: inputs are already k-bounded (a handful of rows each), so the
    full-outer id joins and the final rank window cost nothing regardless
    of corpus size — all the heavy lifting happened inside the input
    retrievers.
    """
    if len(rankings) < 2:
        raise ValueError(f"rrf_fuse needs >= 2 rankings, got {len(rankings)}")
    if k_rrf < 1 or k < 1:
        raise ValueError(f"k and k_rrf must be >= 1, got k={k} k_rrf={k_rrf}")
    out = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(id_col), F.col("rank").alias(f"__r{i}"))
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    n = len(rankings)
    hits = " + ".join(f"(CASE WHEN __r{i} IS NOT NULL THEN 1 ELSE 0 END)" for i in range(n))
    # 1.0 would parse as DECIMAL in Spark SQL (truncated division); force
    # an IEEE double division on both engines
    score = " + ".join(
        f"coalesce(CAST(1 AS DOUBLE) / ({k_rrf} + __r{i}), CAST(0 AS DOUBLE))"
        for i in range(n)
    )
    scored = out.selectExpr(
        id_col,
        f"CAST({hits} AS INT) AS n_lists",
        f"CAST({score} AS DOUBLE) AS rrf_score",
    )
    from pyspark.sql import Window

    topk = scored.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", id_col, "n_lists", "rrf_score"
    )


def rrf_fuse_duck(
    ranking_sqls: list[str],
    k: int = 20,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for `rrf_fuse` over ranking subqueries (each a full
    SELECT, e.g. `bm25_topk_duck(...)` — DuckDB accepts nested WITH inside
    a parenthesized subquery): same fixed-order score expression, same
    (score desc, id) final ranking."""
    n = len(ranking_sqls)
    froms = f"({ranking_sqls[0]}) l0"
    for i in range(1, n):
        froms += (
            f" FULL JOIN ({ranking_sqls[i]}) l{i} "
            + "ON "
            + " AND ".join(
                # join each later list to the coalesced id of earlier ones
                [f"l{i}.{id_col} = coalesce(" + ", ".join(f"l{j}.{id_col}" for j in range(i)) + ")"]
            )
        )
    coal_id = "coalesce(" + ", ".join(f"l{i}.{id_col}" for i in range(n)) + ")"
    hits = " + ".join(f"(CASE WHEN l{i}.rank IS NOT NULL THEN 1 ELSE 0 END)" for i in range(n))
    score = " + ".join(
        f"coalesce(CAST(1 AS DOUBLE) / ({k_rrf} + l{i}.rank), CAST(0 AS DOUBLE))"
        for i in range(n)
    )
    return f"""
    WITH fused AS (
      SELECT {coal_id} AS {id_col},
             CAST({hits} AS INT) AS n_lists,
             CAST({score} AS DOUBLE) AS rrf_score
      FROM {froms}
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY rrf_score DESC, {id_col}) AS rn
      FROM fused
    )
    SELECT CAST(rn AS INT) AS rank, {id_col}, n_lists, rrf_score
    FROM ranked WHERE rn <= {k}
    """
