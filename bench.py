"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.
Each query is forced with a count() (results are small aggregates; no
driver-side data pull beyond that).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customer",
    "pipe_mv_revenue_by_region",
    "events_sessionize",
    "events_hourly_rollup",
    "pipe_cdc_scd2",
    "pipe_streaming_fanin",
    "pipe_stateful_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "knn_bruteforce",
    "text_quality_score",
    "text_repetition",
    "pii_redact",
    "sample_hash_split",
]

# Round-5/6 operators benched as a SEPARATE subtotal so the 20-query
# headline series stays comparable across rounds (BASELINE.md tracks it
# since r1). Timed with the same min-of-N protocol; reported under
# "extended" / "extended_sec" in the JSON line.
EXTENDED = [
    "knn_ivfpq",
    "text_gopher_rules",
    "sample_sequence_pack",
    "dedup_span_removal",
    "dedup_edit_distance",
    "sample_quality_stratified",
    # r6-continuation additions (extended_sec grew here — compare per-query,
    # or the first six as the pre-continuation subtotal)
    "sketch_kmv_distinct",
    "doc_chunk_fixed",
    "search_bm25",
    "sample_weighted_poisson",
    "features_rolling_spend",
    "events_peak_concurrency",
    "events_hourly_anomaly",
    "text_bigram_logprob",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry
    from lakehouse_plumber_spark import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # warm the JVM, the catalog registration, and the page cache with one
    # tiny action per table — setup cost, not query cost
    spark.range(1).count()
    from lakehouse_plumber_spark import register_testdata

    for df in register_testdata(spark, sf_dir).values():
        df.limit(1).count()
    entry.warm(spark, sf_dir)

    # Each query shape is executed once untimed (Janino codegen + JVM JIT of
    # the generated classes is per-shape setup cost, not throughput), then
    # timed LHP_BENCH_RUNS times (default 3) with the min reported — r2
    # showed min-of-2 under-samples on this box (q3 wobbled ±24% with
    # untouched code), min-of-3 makes round-over-round deltas attributable.
    # Spread across the timed runs is reported per query on stderr.
    runs = int(os.environ.get("LHP_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    # streaming-machinery queries (checkpointed availableNow runs, state
    # store, foreachBatch merges) JIT a much larger code surface than the
    # batch shapes — one warm run still leaves Janino/JVM compilation inside
    # the first timed runs (measured: cdc_scd2 settles over ~4 iterations on
    # a fresh JVM). Give those shapes one extra untimed warm; this is
    # per-shape setup cost, not throughput, same rationale as the single warm.
    STREAMING_WARM_TWICE = {
        "pipe_cdc_scd2", "pipe_streaming_fanin", "pipe_stateful_sessionize",
    }
    def time_one(name: str) -> float:
        fn = qs[name]
        fn(spark, sf_dir).count()
        if name in STREAMING_WARM_TWICE:
            fn(spark, sf_dir).count()
        samples, n = [], 0
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.time() - t0)
        best = round(min(samples), 3)
        spread = (max(samples) - min(samples)) / min(samples) if min(samples) else 0.0
        print(f"# {name}: {best}s rows={n} spread={spread:.0%}", file=sys.stderr)
        return best

    # LHP_BENCH_QUIET_GATE=<seconds>: abort cheaply right after the six
    # TPC-H controls when the box reads loud (controls subtotal > gate) —
    # a quiet-window poller pays ~90s per attempt instead of ~5min.  The
    # driver runs without the env, so recorded BENCH artifacts are
    # unaffected; an aborted attempt prints a distinct one-line JSON.
    gate = os.environ.get("LHP_BENCH_QUIET_GATE")
    for name in HEADLINE:
        timings[name] = time_one(name)
        if gate and name == "q18_large_volume_customer":
            csec = round(sum(timings[c] for c in (
                "q1_pricing_summary", "q3_shipping_priority",
                "q5_local_supplier_volume", "q10_returned_items",
                "q14_promo_revenue", "q18_large_volume_customer")), 3)
            if csec > float(gate):
                print(json.dumps({
                    "metric": "bench_aborted_loud_box",
                    "controls_sec": csec, "gate": float(gate), "sf": sf,
                }))
                return
    extended: dict[str, float] = {}
    for name in EXTENDED:
        extended[name] = time_one(name)

    total = round(sum(timings.values()), 3)
    # the six untouched TPC-H queries are the box-state control group:
    # their subtotal moves only with machine conditions (round-to-round VM /
    # frequency / scheduler drift), so ratios against it separate engine
    # changes from environment changes (see BASELINE.md protocol notes)
    controls = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q10_returned_items", "q14_promo_revenue", "q18_large_volume_customer",
    ]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended": extended,
                "extended_sec": round(sum(extended.values()), 3),
                "controls_sec": round(sum(timings[c] for c in controls), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
