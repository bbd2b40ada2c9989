"""Keyword retrieval over a document corpus: BM25 scoring + top-k ranking.

Okapi BM25 (Robertson & Zaragoza 2009): for a query term set Q and document
d, score(d) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)),
with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1).  This is the lexical
half of every retrieval pipeline (and the hard-negative miner for embedding
training); the engine's ANN family (`llm/similarity.py`) is the dense half.

Scale design (100 TB corpus, small query): only postings for the |Q| query
terms ever leave the scan — explode → `isin(Q)` prunes at the source, so
the shuffled volume is O(matching doc-term pairs), not the corpus.  Both
corpus statistics (N, total token count) and per-term document frequencies
are metadata-sized and BROADCAST to the scorer; the final top-k is a
distributed `TakeOrderedAndProject` (orderBy+limit), never a global sort.

Cross-engine determinism: per-(doc,term) score parts are double expressions
written identically in the DuckDB oracle, each cast to DECIMAL(18,6) before
summing (order-independent exact sum per the repo-wide recipe), ranked by
the rounded score with doc_id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import tokens_duck, tokens_spark


def _part_expr(k1: float, b: float) -> str:
    """The per-(doc,term) BM25 contribution — IDENTICAL text in both engines
    (all inputs are exact integers; one double expression tree).  avgdl is
    folded in as dl·N/total_dl so the only division points are explicit."""
    return (
        f"ln((cast(n_docs AS double) - dfreq + 0.5) / (dfreq + 0.5) + 1.0)"
        f" * (tf * (1.0 + {k1})) / "
        f"(tf + {k1} * (1.0 - {b} + {b} * dl * cast(n_docs AS double) / total_dl))"
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for `query_terms` by BM25: (rank, doc_id, n_terms_hit,
    score).  Ties rank by doc_id; only documents hitting ≥1 query term are
    candidates."""
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(tokens_spark(f"lower(coalesce({text_col}, ''))")).alias("__toks"),
    ).withColumn("dl", F.expr("cast(size(__toks) AS bigint)"))
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("double").alias("total_dl"),
    )
    postings = base.select(
        "doc_id", "dl", F.explode("__toks").alias("term")
    ).where(F.col("term").isin(query_terms))
    tf = postings.groupBy("doc_id", "term", "dl").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("dfreq"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .selectExpr(
            "doc_id",
            f"cast({_part_expr(k1, b)} AS decimal(18,6)) AS part",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.expr("cast(sum(part) AS double)").alias("score"),
        )
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
    """DuckDB oracle for `bm25_topk` — same expressions, same decimal-sum
    determinism recipe, same (score desc, doc_id) rank order."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    toks = tokens_duck(f"lower(coalesce({text_col}, ''))")
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}),
    d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) AS total_dl FROM d),
    p AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
    tf AS (SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
           FROM p WHERE term IN ({terms}) GROUP BY doc_id, term, dl),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq
              FROM tf GROUP BY term),
    parts AS (
      SELECT doc_id,
             CAST({_part_expr(k1, b)} AS DECIMAL(18,6)) AS part
      FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
    scored AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_terms_hit,
             CAST(sum(part) AS DOUBLE) AS score
      FROM parts GROUP BY doc_id),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    SELECT CAST(rn AS INT) AS rank, doc_id, n_terms_hit, score
    FROM ranked WHERE rn <= {k}
    """
