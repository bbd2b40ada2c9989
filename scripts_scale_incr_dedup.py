"""Flat-wall measurement for incremental_dedup_batch (r12, VERDICT r11 #1).

The r11 verdict's one weak component was the incremental-dedup verify
stage rescanning the FULL hashed-grams history on every arriving batch —
per-batch cost grew linearly with corpus history.  r12 hash-partitions
both index tables and prunes every per-batch read to the batch's own
keys, then semi-joins to candidate ids before the wide gram arrays
materialize.  This script is the evidence the fix works: it times the
SAME probe batch against a 1x history and a 10x history (fixed batch
size, identical probe text) and reports the ratio — flat (~1x) means
per-batch work scales with the batch, not with history.

Protocol (documents table, sf0.1 = 5000 docs):
  - history copy i = all docs with every word suffixed by i (distinct
    shingles per copy -> no cross-copy near-dups, band buckets stay flat)
  - seed each history through incremental_dedup_batch itself, so the
    index has exactly the production layout (bucketed bands + grams)
  - probe batches (3 reps, median): 500 NEW ids whose text is copy 1's
    text plus one appended token -> high-Jaccard candidates against
    history, so the verify stage genuinely reads grams history (pruned)

Usage: python scripts_scale_incr_dedup.py   (prints one JSON line)
Env: LHP_INCR_FACTOR (default 10), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FACTOR = int(os.environ.get("LHP_INCR_FACTOR", "10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH = 500
REPS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from lakehouse_plumber_spark import get_spark
    from lakehouse_plumber_spark.llm.dedup import incremental_dedup_batch
    from lakehouse_plumber_spark.tables import ParquetTableStore

    spark = get_spark("scale_incr_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_docs = docs.count()  # actual corpus size (span is only the id spread)

    def variant(i: int):
        """Copy i: ids shifted by i*span, every word suffixed by i so the
        copies share no shingles (no cross-copy cliques)."""
        return docs.select(
            (F.col("doc_id") + F.lit(i * span)).alias("doc_id"),
            F.expr(
                f"concat_ws(' ', transform(split(text, ' '), "
                f"w -> concat(w, '{i}')))"
            ).alias("text"),
        )

    # probe reps: NEW ids, copy-1 text + one appended token -> each probe
    # doc is a verified near-dup of its copy-1 twin already in history
    def probe(rep: int):
        return (
            variant(1)
            .where(F.col("doc_id") < (1 * span) + BATCH)
            .select(
                (F.col("doc_id") + F.lit((100 + rep) * span)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" xq")).alias("text"),
            )
        )

    def run(copies: int) -> tuple[float, int]:
        root = tempfile.mkdtemp(prefix=f"incr_dedup_{copies}x_")
        store = ParquetTableStore(spark, root)
        try:
            for i in range(1, copies + 1):
                t0 = time.time()
                incremental_dedup_batch(
                    variant(i), store, "bands", "grams", "pairs"
                )
                print(f"# seed {i}/{copies}: {time.time() - t0:.1f}s",
                      file=sys.stderr, flush=True)
            walls, pairs = [], 0
            for rep in range(REPS):
                t0 = time.time()
                out = incremental_dedup_batch(
                    probe(rep), store, "bands", "grams", "pairs"
                )
                pairs = out.count()
                walls.append(time.time() - t0)
                print(f"# probe {rep} at {copies}x: {walls[-1]:.1f}s "
                      f"({pairs} pairs)", file=sys.stderr, flush=True)
            return statistics.median(walls), pairs
        finally:
            shutil.rmtree(root, ignore_errors=True)

    w1, p1 = run(1)
    w10, p10 = run(FACTOR)
    print(json.dumps({
        "metric": "incr_dedup_batch_wall_ratio",
        "value": round(w10 / w1, 3),
        "unit": "x",
        "wall_1x": round(w1, 3),
        f"wall_{FACTOR}x": round(w10, 3),
        "batch_docs": BATCH,
        # actual document counts (ADVICE r12: span = max(doc_id)+1 is an id
        # SPREAD, not a count — misleading when ids are sparse)
        "history_docs_1x": n_docs,
        f"history_docs_{FACTOR}x": n_docs * FACTOR,
        "pairs_per_probe_1x": p1,
        f"pairs_per_probe_{FACTOR}x": p10,
        "reps": REPS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
