"""Packaged curation pipeline (spark-submit --py-files entry): the
COOKBOOK recipe-1 chain as a deployable job —

    exact dedup -> MinHash-LSH + components closure -> quality /
    repetition screen -> decontaminate vs a held-out set ->
    deterministic split -> per-source quota -> sequence packing

Prints one JSON line of per-stage counts (the job's audit record) and
optionally writes the surviving train set + pack assignments as
parquet.

Usage (local):
    PYTHONPATH=/root/repo python bench/curation_job.py \
        --docs /root/testdata/sf0.01/documents.parquet [--out /tmp/curated]

On a cluster: zip the package (see run_scaling.make_pkg_zip) and
    spark-submit --py-files associationabacminer_spark.zip bench/curation_job.py ...
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--max-repetition", type=float, default=0.8)
    ap.add_argument("--decontam-ngram", type=int, default=5)
    ap.add_argument("--test-frac", type=float, default=0.05)
    ap.add_argument("--quota-per-source", type=int, default=1_000_000)
    ap.add_argument("--pack-budget", type=int, default=2048)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from associationabacminer_spark.functions.text import repetition_ratio
    from associationabacminer_spark.operators import dedup, sampling
    from associationabacminer_spark.operators.components import (
        near_dedup_keep_roots,
    )
    from associationabacminer_spark.operators.decontaminate import (
        decontaminate_train,
    )
    from associationabacminer_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(args.docs)
    stages = {"input": docs.count()}

    uniq = dedup.exact_dedup(docs, "text", "doc_id").cache()
    stages["after_exact_dedup"] = uniq.count()

    pairs = dedup.minhash_lsh_dedup(
        uniq, "text", "doc_id", num_perm=64, bands=16,
        threshold=args.near_dup_threshold,
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # cache each audit point: every stage count is an action, and the
    # optional writes re-consume the final frames
    clean = (
        near_dedup_keep_roots(uniq, pairs, "doc_id")
        .filter(repetition_ratio(F.col("text")) < args.max_repetition)
        .cache()
    )
    stages["after_near_dedup_and_quality"] = clean.count()

    heldout = clean.filter(F.col("doc_id") % 7 == 0)
    pool = clean.filter(F.col("doc_id") % 7 != 0)
    # GPT-3 direction: drop POOL docs overlapping the held-out set
    pool_clean = decontaminate_train(
        pool, heldout, "text", "doc_id", n=args.decontam_ngram
    ).cache()
    stages["heldout"] = heldout.count()
    stages["pool_after_decontamination"] = pool_clean.count()

    split = sampling.hash_split(pool_clean, "doc_id", test_frac=args.test_frac)
    train = split.filter(F.col("split") == "train")
    capped = sampling.quota_sample(
        train, "source", "doc_id", args.quota_per_source, pre_buckets=16
    ).cache()
    stages["train_after_quota"] = capped.count()

    packed = pack_sequences(
        capped, "doc_id", "text", budget=args.pack_budget, n_buckets=16
    ).cache()
    stages["packs"] = packed.select("pack_id").distinct().count()

    if args.out:
        capped.write.mode("overwrite").parquet(f"{args.out}/train")
        packed.write.mode("overwrite").parquet(f"{args.out}/packs")

    print(json.dumps({"stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
