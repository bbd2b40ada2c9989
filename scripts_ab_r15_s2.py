"""Interleaved A/B harness (r15 session 2): old-vs-new variants of changed
operators, alternated in one session (A B A B ...), min-of-N reported, with
exact output parity (sorted collected rows).

Usage: python scripts_ab_r15_s2.py <case> [<case> ...]
Cases: stateful, mv, minhash
Env: SPARK_GRAFT_SF_DIR (default sf0.1), AB_RUNS (default 3).
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "3"))


@contextmanager
def _old_state_parallelism():
    """Patch the r14 behavior back in: floor stays at lo=8 regardless of
    the session's core count."""
    import lakehouse_plumber_spark.streaming as st
    import lakehouse_plumber_spark.streaming.stateful as stm

    new = st.state_parallelism

    @contextmanager
    def old(spark, n_rows, rows_per_partition=2_000_000, lo=8):
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        need = max(1, (n_rows + rows_per_partition - 1) // rows_per_partition)
        target = lo
        while target < need:
            target <<= 1
        target = min(max(target, lo), cur)
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
        try:
            yield target
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(cur))

    st.state_parallelism = old
    stm.state_parallelism = old
    try:
        yield
    finally:
        st.state_parallelism = new
        stm.state_parallelism = new


@contextmanager
def _old_lsh_candidate_pairs():
    """Patch the r14 shape back in: banded rows localCheckpointed, bucket cap
    via sizes agg + join, pairs via equi-self-join."""
    import lakehouse_plumber_spark.llm.dedup as D
    from pyspark.sql import functions as F

    new = D.lsh_candidate_pairs

    def old(sigs, id_col="doc_id", bands=D.LSH_BANDS, rows=D.LSH_ROWS,
            max_bucket_size=D.LSH_MAX_BUCKET):
        banded = D.lsh_bands(sigs, id_col, bands, rows).localCheckpoint(eager=True)
        if max_bucket_size is not None:
            sizes = banded.groupBy("band", "h").agg(F.count(F.lit(1)).alias("__bn"))
            banded = (
                banded.join(sizes.where(F.col("__bn") <= max_bucket_size), on=["band", "h"])
                .drop("__bn")
            )
        a = banded.alias("a")
        b = banded.alias("b")
        return (
            a.join(b, on=["band", "h"], how="inner")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .distinct()
        )

    D.lsh_candidate_pairs = old
    try:
        yield
    finally:
        D.lsh_candidate_pairs = new


@contextmanager
def _old_mv_sql():
    import __spark_entry__ as entry

    new = entry._REV_BY_REGION_SQL_SPARK
    entry._REV_BY_REGION_SQL_SPARK = entry._REV_BY_REGION_SQL
    try:
        yield
    finally:
        entry._REV_BY_REGION_SQL_SPARK = new


def ab(spark, name, old_ctx, runs=RUNS):
    import __spark_entry__ as entry

    fn = entry.queries()[name]

    def run_old():
        with old_ctx():
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.count()
            return time.time() - t0, df

    def run_new():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.count()
        return time.time() - t0, df

    # warm both shapes
    _, df_o = run_old()
    _, df_n = run_new()
    rows_o = sorted(map(tuple, df_o.collect()))
    rows_n = sorted(map(tuple, df_n.collect()))
    parity = rows_o == rows_n
    olds, news = [], []
    for _ in range(runs):
        t, _ = run_old()
        olds.append(t)
        t, _ = run_new()
        news.append(t)
    o, nw = min(olds), min(news)
    print(
        f"{name}: old={o:.3f}s new={nw:.3f}s ratio={nw/o:.3f} "
        f"parity={'OK' if parity else 'MISMATCH ' + str(len(rows_o)) + ' vs ' + str(len(rows_n))} "
        f"olds={[round(x,3) for x in olds]} news={[round(x,3) for x in news]}"
    )
    return parity


def main():
    from lakehouse_plumber_spark import get_spark, register_testdata
    import __spark_entry__ as entry

    spark = get_spark("ab_r15_s2")
    spark.sparkContext.setLogLevel("ERROR")
    for df in register_testdata(spark, SF_DIR).values():
        df.limit(1).count()
    entry.warm(spark, SF_DIR)

    cases = sys.argv[1:] or ["stateful", "mv"]
    ok = True
    for c in cases:
        if c == "stateful":
            ok &= ab(spark, "pipe_stateful_sessionize", _old_state_parallelism)
        elif c == "mv":
            ok &= ab(spark, "pipe_mv_revenue_by_region", _old_mv_sql)
        elif c == "minhash":
            ok &= ab(spark, "dedup_minhash_lsh", _old_lsh_candidate_pairs)
        elif c == "clusters":
            ok &= ab(spark, "dedup_clusters", _old_lsh_candidate_pairs)
        elif c == "editdist":
            ok &= ab(spark, "dedup_edit_distance", _old_lsh_candidate_pairs)
        else:
            raise SystemExit(f"unknown case {c}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
