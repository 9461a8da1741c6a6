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
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prepared = (
        df.withColumn("text_len", F.length("text").cast("double"))
        .withColumn(
            "latency_s",
            F.col("ts").cast("timestamp").cast("double")
            - F.lag(F.col("ts").cast("timestamp").cast("double")).over(w),
        )
        .select("conv_id", "tool", "text_len", "latency_s")
    )
    specs = [
        SketchSpec("hll_conv", HyperLogLog, "conv_id", kernel_cls=HyperLogLog),
        SketchSpec(
            "cms_tool",
            lambda: CountMinSketch(width=4096, depth=5),
            "tool",
            kernel_cls=CountMinSketch,
        ),
        SketchSpec("kll_len", lambda: KLL(k=200), "text_len", kernel_cls=KLL),
        SketchSpec(
            "td_latency", lambda: TDigest(delta=200), "latency_s", kernel_cls=TDigest
        ),
        SketchSpec(
            "bloom_conv",
            lambda: BloomFilter.from_capacity(2_000_000, 0.01),
            "conv_id",
            kernel_cls=BloomFilter,
        ),
    ]

    n_rows = df.count()  # warms the file-listing/footer caches for fairness
    t0 = time.perf_counter()
    sketches = sketch_aggregate(prepared, specs, num_groups=args.groups)
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
