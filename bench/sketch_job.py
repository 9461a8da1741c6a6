"""Standalone sketch-build job for spark-submit — the scaling-efficiency
workload (BASELINE.json north_rule: same job at two parallelism levels).

Usage:
    zip -r /tmp/pkg.zip associationabacminer_spark
    spark-submit --master local[8] --py-files /tmp/pkg.zip \
        bench/sketch_job.py --data /root/repo/.synth/bench_transcripts \
        --groups 64 --out /tmp/result8.json

Builds the full five-sketch suite (HLL conv_id, CMS tool, KLL text_len,
t-digest inter-turn latency, Bloom conv_id) over the transcript table via
the two-stage applyInPandas tree merge, and reports turns/sec.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--groups", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from associationabacminer_spark.operators.agg import SketchSpec, sketch_aggregate
    from associationabacminer_spark.sketch import (
        BloomFilter,
        CountMinSketch,
        HyperLogLog,
        KLL,
        TDigest,
    )

    df = spark.read.parquet(args.data)
    # SLIM BEFORE THE SHUFFLE: hash the key columns (codegen'd xxhash64)
    # and reduce text to its length at scan time, so the conv_id window
    # exchange moves ~36 B/row instead of ~200 B/row (the raw text).
    # The window partitions on the 64-bit conv hash — collisions are
    # ~n^2/2^64, irrelevant for latency quantiles.
    slim = df.select(
        F.xxhash64("conv_id").alias("conv_h"),
        F.when(F.col("tool").isNotNull(), F.xxhash64("tool")).alias("tool_h"),
        F.length("text").cast("double").alias("text_len"),
        "turn_idx",
        F.col("ts").cast("timestamp").cast("double").alias("ts_s"),
    )
    w = Window.partitionBy("conv_h").orderBy("turn_idx")
    prepared = slim.withColumn(
        "latency_s", F.col("ts_s") - F.lag("ts_s").over(w)
    ).select("conv_h", "tool_h", "text_len", "latency_s")
    # key columns are already xxhash64 values; the kernels' int base-hash
    # path (splitmix on top) keeps query-key consistency via xxh64_keys
    specs = [
        SketchSpec("hll_conv", HyperLogLog, "conv_h", kernel_cls=HyperLogLog),
        SketchSpec(
            "cms_tool",
            lambda: CountMinSketch(width=4096, depth=5),
            "tool_h",
            kernel_cls=CountMinSketch,
        ),
        SketchSpec("kll_len", lambda: KLL(k=200), "text_len", kernel_cls=KLL),
        SketchSpec(
            "td_latency", lambda: TDigest(delta=200), "latency_s", kernel_cls=TDigest
        ),
        SketchSpec(
            "bloom_conv",
            lambda: BloomFilter.from_capacity(2_000_000, 0.01),
            "conv_h",
            kernel_cls=BloomFilter,
        ),
    ]

    n_rows = df.count()  # warms the file-listing/footer caches
    # steady-state measurement: warm Python workers (fork + numpy/pandas
    # import), JIT and codegen on a small LIMIT sample — a different plan,
    # so nothing the timed run could reuse — then time the full build
    sketch_aggregate(prepared.limit(500_000), specs, method="map")
    t0 = time.perf_counter()
    sketches = sketch_aggregate(prepared, specs, method="map")
    elapsed = time.perf_counter() - t0

    result = {
        "rows": n_rows,
        "seconds": round(elapsed, 3),
        "turns_per_sec": round(n_rows / elapsed, 1),
        "parallelism": spark.sparkContext.defaultParallelism,
        "hll_estimate": round(sketches["hll_conv"].estimate(), 1),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main()
