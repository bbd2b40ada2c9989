"""Round-14 A/B: ivfpq_search seed/query driver collects — two jobs (old)
vs one folded union job (new).  Same interleaved old/new protocol as
scripts_ab_r14.py (alternating timed runs after one untimed warm each, min
per side) so the box's contention waves divide out of the ratio.

`old_ivfpq_search` is the verbatim pre-change implementation (two separate
.collect() jobs for the seed rows and the query rows); "new" is the live
`llm.similarity.ivfpq_search` after the fold.  Invocation mirrors the
`knn_ivfpq` bench entry (m=8, k'=16, probe=4, ids 0..4), plus a refine=4
variant to cover the re-ranking path.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts_ab_r14_ivfpq.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def old_ivfpq_search(
    df: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_subvectors: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine: int = 0,
) -> DataFrame:
    """Verbatim pre-fold ivfpq_search: seeds and query vectors collected in
    TWO separate driver jobs (each a scan of the collection)."""
    from lakehouse_plumber_spark.llm.similarity import (
        centroid_argmin_expr, centroid_distances_expr,
    )

    if refine < 0:
        raise ValueError(f"refine must be >= 0, got {refine}")
    base = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    n_seeds = max(n_centroids, n_codes)
    seeds = [
        (r[0], list(r[1]))
        for r in base.orderBy(id_col).limit(n_seeds).select(id_col, "v").collect()
    ]
    seeds.sort()
    if len(seeds) < n_seeds:
        raise ValueError("too few vectors")
    dim = len(seeds[0][1])
    if dim % m_subvectors:
        raise ValueError(f"dim {dim} not divisible by m_subvectors {m_subvectors}")
    d = dim // m_subvectors
    cents = seeds[:n_centroids]

    books = [
        [(j, seeds[j][1][m * d:(m + 1) * d]) for j in range(n_codes)]
        for m in range(m_subvectors)
    ]
    code_exprs = [
        "array_min(" + centroid_distances_expr(books[m], f"slice(v, {m * d + 1}, {d})") + ").cid"
        for m in range(m_subvectors)
    ]
    encoded = base.select(
        id_col,
        F.expr(centroid_argmin_expr(cents)).alias("list_id"),
        F.expr("array(" + ", ".join(code_exprs) + ")").alias("codes"),
    )

    def _sqdist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    q_rows = {r[0]: list(r[1]) for r in base.where(F.col(id_col).isin(query_ids)).collect()}
    missing = sorted(set(query_ids) - set(q_rows))
    if missing:
        raise KeyError(f"query ids not in collection: {missing}")
    probe_rows = []
    for qid in sorted(q_rows):
        qv = q_rows[qid]
        nearest = sorted((_sqdist(qv, cv), cid) for cid, cv in cents)[:n_probe]
        tables = [
            [_sqdist(qv[m * d:(m + 1) * d], bv) for _, bv in books[m]]
            for m in range(m_subvectors)
        ]
        for _, cid in nearest:
            probe_rows.append((qid, cid, tables))
    probes = df.sparkSession.createDataFrame(
        probe_rows, "query_id long, list_id long, tabs array<array<double>>"
    )
    adc = (
        "aggregate(zip_with(codes, tabs, (c, t) -> element_at(t, cast(c + 1 as int))), "
        "0D, (acc, x) -> acc + x)"
    )
    scored = (
        encoded.join(F.broadcast(probes), on="list_id")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("adc", F.expr(adc))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc"), F.col(id_col))
    if not refine:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id",
                F.col(id_col).alias("neighbor_id"),
                "rank",
                F.round("adc", 6).alias("adc_dist"),
            )
        )
    shortlist = (
        scored.withColumn("__r0", F.row_number().over(w))
        .where(F.col("__r0") <= refine * k)
        .select("query_id", id_col)
    )
    qv_df = df.sparkSession.createDataFrame(
        [(qid, q_rows[qid]) for qid in sorted(q_rows)],
        "query_id long, qv array<double>",
    )
    exact_d = (
        "aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)), "
        "0D, (acc, x) -> acc + x)"
    )
    refined = (
        base.join(F.broadcast(shortlist), on=id_col)
        .join(F.broadcast(qv_df), on="query_id")
        .withColumn("dist", F.expr(exact_d))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col(id_col))
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "rank",
            F.round("dist", 6).alias("adc_dist"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("LHP_AB_RUNS", "4"))

    from lakehouse_plumber_spark import get_spark, register_testdata
    from lakehouse_plumber_spark.llm import similarity as S

    spark = get_spark("ab_r14_ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf_dir)
    emb = spark.table("embeddings")
    spark.range(1).count()

    ids = [0, 1, 2, 3, 4]
    kw = dict(k=3, n_centroids=16, n_probe=4, m_subvectors=8, n_codes=16)

    PAIRS = {
        "ivfpq": (
            lambda: old_ivfpq_search(emb, ids, **kw),
            lambda: S.ivfpq_search(emb, ids, **kw),
        ),
        "ivfpq_refine": (
            lambda: old_ivfpq_search(emb, ids, refine=4, **kw),
            lambda: S.ivfpq_search(emb, ids, refine=4, **kw),
        ),
    }
    out = {}
    for name, (oldf, newf) in PAIRS.items():
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
    print(json.dumps({"metric": "ab_r14_ivfpq", "sf_dir": sf_dir, "pairs": out}))


if __name__ == "__main__":
    main()
