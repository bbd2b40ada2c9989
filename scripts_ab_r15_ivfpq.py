"""A/B prototype (r15): ivfpq_search's literal-codebook encode vs a 1-row
broadcast codebook relation (the with_hyperplane_sig pattern).

Measures construction time and action time (noop sink), interleaved, and
checks exact output parity.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_variant(df, query_ids, k=3, n_centroids=16, n_probe=4,
                  m_subvectors=8, n_codes=16, vec_col="embedding",
                  id_col="vec_id"):
    """Broadcast-relation variant of the refine=0 path, arithmetic-identical."""
    base = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    n_seeds = max(n_centroids, n_codes)
    marked = (
        base.orderBy(id_col).limit(n_seeds)
        .withColumn("__lhp_isq", F.lit(False))
        .unionByName(
            base.where(F.col(id_col).isin(query_ids))
            .withColumn("__lhp_isq", F.lit(True))
        )
    )
    seeds, q_rows = [], {}
    for r in marked.collect():
        if r[2]:
            q_rows[r[0]] = list(r[1])
        else:
            seeds.append((r[0], list(r[1])))
    seeds.sort()
    dim = len(seeds[0][1])
    d = dim // m_subvectors
    cents = seeds[:n_centroids]
    books = [
        [(j, seeds[j][1][m * d:(m + 1) * d]) for j in range(n_codes)]
        for m in range(m_subvectors)
    ]
    spark = df.sparkSession
    aux = spark.createDataFrame(
        [(cents, [bk for bk in books])],
        "__lhp_cents array<struct<cid:bigint,cv:array<double>>>, "
        "__lhp_books array<array<struct<cid:bigint,cv:array<double>>>>",
    )
    sq = (
        "aggregate(zip_with({a}, {b}, (__lhp_x, __lhp_y) -> "
        "(__lhp_x - __lhp_y) * (__lhp_x - __lhp_y)), 0D, "
        "(__lhp_acc, __lhp_z) -> __lhp_acc + __lhp_z)"
    )
    list_expr = (
        "array_min(transform(__lhp_cents, __lhp_c -> named_struct("
        f"'d', {sq.format(a='v', b='__lhp_c.cv')}, 'cid', __lhp_c.cid))).cid"
    )
    codes_expr = (
        "transform(__lhp_books, (__lhp_bk, __lhp_m) -> "
        "array_min(transform(__lhp_bk, __lhp_c -> named_struct("
        + "'d', "
        + sq.format(a=f"slice(v, __lhp_m * {d} + 1, {d})", b="__lhp_c.cv")
        + ", 'cid', __lhp_c.cid))).cid)"
    )
    encoded = base.crossJoin(F.broadcast(aux)).select(
        id_col,
        F.expr(list_expr).alias("list_id"),
        F.expr(codes_expr).alias("codes"),
    )

    def _sqdist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

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
    probes = spark.createDataFrame(
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_plumber_spark import get_spark, register_testdata
    from lakehouse_plumber_spark.llm.similarity import ivfpq_search

    spark = get_spark("ab_ivfpq_r15")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf_dir)
    emb = spark.table("embeddings")
    qids = [0, 1, 2, 3, 4]

    def noop(dfx):
        dfx.write.format("noop").mode("overwrite").save()

    # parity first
    old = ivfpq_search(emb, qids)
    new = build_variant(emb, qids)
    ro = [tuple(r) for r in old.collect()]
    rn = [tuple(r) for r in new.collect()]
    assert ro == rn, f"PARITY MISMATCH\nold={ro[:5]}\nnew={rn[:5]}"
    print("parity OK:", len(ro), "rows")

    # warm both shapes
    noop(ivfpq_search(emb, qids))
    noop(build_variant(emb, qids))

    results = {"old_c": [], "old_a": [], "new_c": [], "new_a": []}
    for _ in range(4):
        t0 = time.time(); df = ivfpq_search(emb, qids); t1 = time.time()
        noop(df); t2 = time.time()
        results["old_c"].append(t1 - t0); results["old_a"].append(t2 - t1)
        t0 = time.time(); df = build_variant(emb, qids); t1 = time.time()
        noop(df); t2 = time.time()
        results["new_c"].append(t1 - t0); results["new_a"].append(t2 - t1)
    for kk, v in results.items():
        print(f"{kk}: min={min(v):.3f} all={[round(x,3) for x in v]}")
    old_tot = min(results["old_c"]) + min(results["old_a"])
    new_tot = min(results["new_c"]) + min(results["new_a"])
    print(f"total old={old_tot:.3f} new={new_tot:.3f} ratio={new_tot/old_tot:.3f}")


if __name__ == "__main__":
    main()
