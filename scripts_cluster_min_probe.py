"""Min-of-40 round-robin probe of the seven-query must-confirm cluster.

On a wave-contended host the MINIMUM over many samples spanning wave
phases approximates the quiet reading: if each query's min touches its
r11 value, the engine is unregressed regardless of ambient noise.
q1/q3 are sampled in the same rotation as in-band context.

Reference values and the streaming warm policy are imported from bench.py
(bench.R11_REF is pinned byte-for-byte to BENCH_r11.json by
tests/test_bench_protocol.py) so this probe cannot drift from the bench's
own vs_r11 math."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
import bench
from lakehouse_plumber_spark import get_spark, register_testdata

SF = "/root/testdata/sf0.1"
CLUSTER = ["q1_pricing_summary", "q3_shipping_priority", "pii_redact",
           "dedup_exact", "pipe_cdc_scd2", "text_repetition",
           "dedup_minhash_lsh", "sample_hash_split", "pipe_streaming_fanin"]

spark = get_spark("cluster_min"); spark.sparkContext.setLogLevel("ERROR")
for df in register_testdata(spark, SF).values():
    df.limit(1).count()
entry.warm(spark, SF)
qs = entry.queries()
samples = {q: [] for q in CLUSTER}
for q in CLUSTER:  # shape warm (JIT); streaming-heavy shapes warm twice
    qs[q](spark, SF).count()
    if q in bench.STREAMING_WARM_TWICE:
        qs[q](spark, SF).count()
for i in range(40):
    for q in CLUSTER:
        t0 = time.time()
        qs[q](spark, SF).count()
        samples[q].append(time.time() - t0)
    if i % 10 == 9:
        print(f"# pass {i+1}", file=sys.stderr)
out = {}
for q in CLUSTER:
    s = sorted(samples[q])
    out[q] = {"min": round(s[0], 3), "p10": round(s[3], 3),
              "med": round(s[len(s)//2], 3), "max": round(s[-1], 3),
              "r11": bench.R11_REF[q], "min_vs_r11": round(s[0]/bench.R11_REF[q], 3)}
print(json.dumps(out))
