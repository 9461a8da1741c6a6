"""Scale-ladder evidence for the LLM curation chain (round-3 VERDICT
item 7): run the COOKBOOK recipe-1 pipeline — exact dedup -> MinHash-LSH
candidate pairs -> components closure -> repetition screen ->
decontaminate vs a held-out split -> hash split -> per-source quota ->
sequence packing — over transcript-turn "documents" at two or more input
sizes, timing EVERY stage, to show no stage grows super-linearly in
rows (the plans are equi-joins and hash aggregations throughout, so
~linear is the expectation).

Each turn becomes a document: doc_id = xxhash64(conv_id # turn_idx)
(deterministic, partitioning-invariant), source = role.

Usage:
    PYTHONPATH=/root/repo python bench/curation_ladder.py \
        --inputs /root/repo/.synth/bench_transcripts /root/repo/.synth/scaling_12M

Prints one JSON line per input with per-stage rows + seconds, then a
combined scaling summary (sec ratio / row ratio per stage).
"""

from __future__ import annotations

import argparse
import json
import time


def run_chain(spark, path: str) -> dict:
    from pyspark.sql import functions as F

    from associationabacminer_spark.functions.text import repetition_ratio
    from associationabacminer_spark.operators import dedup, sampling
    from associationabacminer_spark.operators.components import near_dedup_keep_roots
    from associationabacminer_spark.operators.decontaminate import decontaminate_train
    from associationabacminer_spark.operators.packing import pack_sequences

    t0 = time.monotonic()
    stages: dict[str, dict] = {}

    def stage(name: str, n_rows: int, start: float) -> None:
        stages[name] = {"rows": int(n_rows), "sec": round(time.monotonic() - start, 3)}

    raw = spark.read.parquet(path)
    if "doc_id" in raw.columns:  # a documents table (testdata sf dirs)
        docs = raw.select("doc_id", "text", "source").cache()
    else:  # a transcripts table: each turn becomes a document
        docs = raw.select(
            F.xxhash64(F.concat_ws("#", "conv_id", "turn_idx")).alias("doc_id"),
            F.col("text"),
            F.col("role").alias("source"),
        ).cache()
    s = time.monotonic()
    n_input = docs.count()
    stage("input", n_input, s)

    # production partitioning: scale shuffle partitions with the input
    # (~400k rows each, AQE coalesces overshoot).  At the 59M rung this
    # cuts the spill-bound decontaminate stage ~14% (292 s vs 341 s at
    # the fixed session default of 32; measured round 4).
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(32, n_input // 400_000))
    )

    s = time.monotonic()
    uniq = dedup.exact_dedup(docs, "text", "doc_id").cache()
    stage("exact_dedup", uniq.count(), s)

    s = time.monotonic()
    # method="oph": the one-permutation scale path (O(1) hashing per
    # shingle; 6x the classic signature throughput — see dedup.py)
    pairs = dedup.minhash_lsh_dedup(
        uniq, "text", "doc_id", num_perm=64, bands=16, threshold=0.8,
        method="oph",
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).cache()
    stage("minhash_lsh_pairs", pairs.count(), s)

    s = time.monotonic()
    clean = (
        near_dedup_keep_roots(uniq, pairs, "doc_id")
        .filter(repetition_ratio(F.col("text")) < 0.8)
        .cache()
    )
    stage("components_and_quality", clean.count(), s)

    s = time.monotonic()
    heldout = clean.filter(F.col("doc_id") % 7 == 0)
    pool = clean.filter(F.col("doc_id") % 7 != 0)
    pool_clean = decontaminate_train(pool, heldout, "text", "doc_id", n=5).cache()
    stage("decontaminate", pool_clean.count(), s)

    s = time.monotonic()
    split = sampling.hash_split(pool_clean, "doc_id", test_frac=0.05)
    train = split.filter(F.col("split") == "train")
    capped = sampling.quota_sample(
        train, "source", "doc_id", 100_000_000, pre_buckets=16
    ).cache()
    stage("split_and_quota", capped.count(), s)

    s = time.monotonic()
    packed = pack_sequences(capped, "doc_id", "text", budget=2048, n_buckets=64)
    stage("packing", packed.select("pack_id").distinct().count(), s)

    for frame in (docs, uniq, pairs, clean, pool_clean, capped):
        frame.unpersist()
    return {
        "input": path,
        "total_sec": round(time.monotonic() - t0, 3),
        "stages": stages,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="+", required=True)
    ap.add_argument("--out", default=None, help="write the JSON lines here too")
    args = ap.parse_args()

    from associationabacminer_spark.session import get_spark

    spark = get_spark(app_name="curation-ladder", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    lines = []

    def emit(obj) -> None:
        line = json.dumps(obj)
        lines.append(line)
        print(line, flush=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write("\n".join(lines) + "\n")

    results = []
    for path in args.inputs:
        r = run_chain(spark, path)
        emit(r)
        results.append(r)

    # pairwise ratios between consecutive ladder rungs
    for lo, hi in zip(results, results[1:]):
        row_ratio = hi["stages"]["input"]["rows"] / lo["stages"]["input"]["rows"]
        summary = {}
        for name in lo["stages"]:
            ls, hs = lo["stages"][name]["sec"], hi["stages"][name]["sec"]
            summary[name] = {
                "sec_ratio": round(hs / ls, 2) if ls > 0 else None,
            }
        emit(
            {
                "scaling_summary": summary,
                "lo": lo["input"],
                "hi": hi["input"],
                "row_ratio_input": round(row_ratio, 2),
            }
        )
    spark.stop()


if __name__ == "__main__":
    main()
