"""One-off 10x scale spot-check for embedding_near_dup_lsh (r9).

The shared bench_scale harness grows embeddings as IDENTICAL copies (the
shape knn candidate scans need), which would turn every vector into a
10-way duplicate clique — quadratic candidate growth by construction, the
exact case the operator's max_bucket_size documents.  Here each copy is
ROLLED by its copy index instead (cosine between rolls of a random vector
~ 0), so the 10x corpus has the natural no-near-dup structure and the
measurement isolates the signature + bucket-join + verify pipeline.

Usage: python scripts_scale_emb_lsh.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FACTOR = int(os.environ.get("LHP_SCALE_FACTOR", "10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# LSH geometry. Random (cosine ~0) pairs band-collide at p = bands * 2^-rows,
# so SPURIOUS candidates grow ~ n^2 * bands * 2^-rows: at a fixed geometry the
# candidate set is quadratic in corpus size and rows_per_band must grow with
# log2(n) to keep it linear (the standard LSH scaling rule).  The operator
# default (4x8, tuned for recall ~0.99 at cosine 0.99) is right at 10x
# (~3e6 random candidates over 20k vectors) and wrong at 100x (~3e8 over
# 200k -- measured: the verify join spilled out of disk).  Use
# LHP_EMB_ROWS=14 (4x14 = 56 bits <= 62) at factor 100.
BANDS = int(os.environ.get("LHP_EMB_BANDS", "4"))
# LHP_EMB_ROWS=auto exercises the r11 default (rows_per_band=None ->
# geometry derived from the corpus count via emb_lsh_auto_rows — the
# scale-safe path; at 2e5 vectors the rule derives the same 14 the 100x
# point was hand-tuned to in r10)
_rows_env = os.environ.get("LHP_EMB_ROWS", "8")
ROWS = None if _rows_env == "auto" else int(_rows_env)


def main() -> None:
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark import get_spark
    from lakehouse_plumber_spark.llm.dedup import embedding_near_dup_lsh

    spark = get_spark("scale_emb_lsh")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])

    def rolled(i: int):
        if i == 0:
            return emb
        # factor can exceed dim: roll by i % dim and NEGATE on odd laps —
        # 2*dim distinct transforms (supports factor <= 2*dim), each with
        # cosine ~ 0 to every other (random iid coords), so the scaled
        # corpus keeps the natural no-near-dup structure
        r = i % dim
        if r == 0:
            rolled_expr = "embedding"
        else:
            rolled_expr = (
                f"concat(slice(embedding, {r + 1}, {dim - r}), "
                f"slice(embedding, 1, {r}))"
            )
        if (i // dim) % 2 == 1:
            rolled_expr = f"transform({rolled_expr}, x -> -x)"
        if i >= 2 * dim:
            raise SystemExit(f"factor {FACTOR} > 2*dim={2 * dim} transforms")
        return emb.select(
            (F.col("vec_id") + i * span).alias("vec_id"),
            F.expr(rolled_expr).alias("embedding"),
        )

    big = rolled(0)
    for i in range(1, FACTOR):
        big = big.unionByName(rolled(i))
    # materialize BOTH corpora once before timing (default): production
    # reads the corpus from storage, which the checkpoint simulates.
    # LHP_EMB_CHECKPOINT=0 keeps the raw FACTOR-way union plan (a roll
    # transform per branch) as the operator input — the plan-analysis
    # stress case: under the r12 operator, whose hyperplane weights were
    # 3.5k inline literals, re-analyzing that plan cost driver-side
    # MINUTES per call (measured r12: 171s/call at factor 100 vs ~15s on a
    # materialized corpus).  r13 moved the weights into one broadcast
    # column (llm/similarity.py:with_hyperplane_sig), so this path is now
    # a first-class measurement knob rather than a known trap; before/after
    # numbers in BASELINE.md r13.
    if os.environ.get("LHP_EMB_CHECKPOINT", "1") != "0":
        emb = emb.localCheckpoint(eager=True)
        big = big.localCheckpoint(eager=True)

    def time_one(df) -> tuple[float, int]:
        # ROWS=None -> the operator derives rows from this corpus's count
        kw = dict(threshold=0.99, bands=BANDS, rows_per_band=ROWS)
        embedding_near_dup_lsh(df, **kw).count()  # warm
        best, n = None, 0
        for _ in range(3):
            t0 = time.time()
            n = embedding_near_dup_lsh(df, **kw).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), n

    t1, n1 = time_one(emb)
    t10, n10 = time_one(big)
    print(
        json.dumps(
            {
                "metric": "emb_lsh_scaleup_ratio",
                "factor": FACTOR,
                "bands": BANDS,
                "rows_per_band": ROWS if ROWS is not None else "auto",
                "t1": t1,
                "t10": t10,
                "ratio": round(t10 / t1, 2) if t1 else None,
                "pairs_1x": n1,
                "pairs_10x": n10,
            }
        )
    )


if __name__ == "__main__":
    main()
