"""SQL-reduced sketch builds: let Catalyst/Tungsten do the heavy
reduction JVM-side, then materialize the kernel from the tiny aggregate.

The pandas-UDAF harness (operators/agg.py) ships every row's key through
Arrow.  For HLL and CMS the per-row work is algebraic, so it can be
expressed as pure Spark SQL:

- HLL: register index = top p bits of xxhash64(key); rho = rank of the
  highest set bit of the remaining 50 bits.  ``groupBy(idx).max(rho)``
  computes EXACTLY the kernel's register array — at most 2^p = 16384
  rows leave the cluster no matter the input size, and the whole
  reduction runs in whole-stage codegen with map-side partial max.
- CMS / heavy keys: ``groupBy(key).count()`` (map-side combine) then a
  weighted kernel update over the aggregated (distinct-key, count)
  pairs — Arrow transfer proportional to distinct keys, not rows.

Both produce registers numerically identical to the prehashed
pandas-path kernels (asserted in tests), so estimates and merge
semantics are unchanged; only the physical strategy differs.  This is
the 'let Catalyst pick the physical plan' option for the 100 TB path
where even int64-per-row Arrow transfer is the bottleneck.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from associationabacminer_spark.sketch import BloomFilter, CountMinSketch, HyperLogLog


def hll_register_table(df: DataFrame, col: str, p: int = 14) -> DataFrame:
    """(idx, rho) register table via pure SQL — <= 2^p rows."""
    h = F.xxhash64(col)
    idx = F.shiftrightunsigned(h, 64 - p)
    rest = h.bitwiseAND(F.lit((1 << (64 - p)) - 1))
    # rho = (64-p) - floor(log2(rest)); rest < 2^50 is exact in double
    rho = F.when(rest == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(64 - p) - F.floor(F.log2(rest.cast("double")))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(idx.alias("idx"), rho.cast("int").alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_from_sql(df: DataFrame, col: str, p: int = 14) -> HyperLogLog:
    """HLL built from the SQL register table — register-identical to
    ``HyperLogLog().update_batch(xxhash64 values, prehashed=True)``."""
    rows = hll_register_table(df, col, p).collect()
    out = HyperLogLog(p)
    if rows:
        idx = np.array([r["idx"] for r in rows], dtype=np.uint32)
        rho = np.array([r["rho"] for r in rows], dtype=np.uint32)
        out._absorb_sparse((idx << np.uint32(6)) | rho)
    return out


def key_counts(df: DataFrame, col: str) -> DataFrame:
    """(xxhash64(key), count) pairs — the map-side-combined reduction
    feeding weighted CMS / exact heavy-hitter updates."""
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.xxhash64(col).alias("key_hash"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_from_sql(
    df: DataFrame, col: str, width: int = 4096, depth: int = 5
) -> CountMinSketch:
    """CMS from aggregated counts: identical table to streaming every row
    through the prehashed kernel (addition is associative)."""
    rows = key_counts(df, col).collect()
    cms = CountMinSketch(width=width, depth=depth)
    if rows:
        hashes = np.array([r["key_hash"] for r in rows], dtype=np.int64)
        counts = np.array([r["cnt"] for r in rows], dtype=np.int64)
        cms.update_batch(hashes, counts=counts, prehashed=True)
    return cms


def bloom_word_table(df: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """(word_idx, word) table of the Bloom bit array via pure SQL:
    distinct keys -> k probe positions (overflow-free double hashing:
    pos_i = (pmod(h1,m) + i*pmod(h2|1,m)) mod m) -> word grouping with a
    ``bit_or`` aggregate.  At most m/64 rows leave the cluster."""
    m = int(m_bits)
    keys = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("k")).distinct()
    h1 = F.pmod(F.xxhash64("k"), F.lit(m))
    # lit must be BIGINT: Spark hashes IntegerType as 4 bytes, and the
    # driver-side twin (xxh64_pair_keys) chains an 8-byte long
    h2 = F.pmod(
        F.xxhash64("k", F.lit(1).cast("long")).bitwiseOR(F.lit(1)), F.lit(m)
    )
    probes = keys.select(
        h1.alias("h1m"),
        h2.alias("h2m"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    ).select(
        F.pmod(F.col("h1m") + F.col("i") * F.col("h2m"), F.lit(m)).alias("pos")
    )
    return (
        probes.select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_from_sql(df: DataFrame, col: str, m_bits: int, k: int) -> BloomFilter:
    """Bloom filter whose bit array was reduced JVM-side — word-identical
    to ``BloomFilter.update_pairs`` over (xxhash64(key), xxhash64(key,1))
    pairs (asserted in tests).  Query with ``contains_pairs`` +
    ``sketch.xxhash.xxh64_pair_keys``."""
    rows = bloom_word_table(df, col, m_bits, k).collect()
    out = BloomFilter(m_bits, k)
    if rows:
        idx = np.array([r["word_idx"] for r in rows], dtype=np.int64)
        words = np.array([r["word"] for r in rows], dtype=np.int64).view(np.uint64)
        out.words[idx] = words
    # n_inserted is informational; recover it cheaply if needed
    return out
