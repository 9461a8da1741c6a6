"""Deterministic sampling for training-data pipelines: per-group quota
capping and hash-based train/test splits.  Unlike ``df.sample`` (P7,
q52), these are pure functions of the data — rerunning the pipeline on
the same input yields byte-identical output, which is what a 100-TB
curation job needs for reproducibility and resume.

Reference analog: the reference caps work per window by slicing sorted
event lists (/root/reference/src/job/job_generator.py:60-74); the quota
sampler is that idea as a distributed window function.

Plan shape: one window per group for the quota (single shuffle on the
group key), pure row-local expressions for the split (no shuffle at
all).  The hash order key is md5 of the id — uniform, engine-portable
(hex strings compare identically everywhere), and independent of
physical row order."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(id_col: str, salt: str) -> F.Column:
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    salt: str = "",
    pre_buckets: int | None = None,
) -> DataFrame:
    """At most ``n_per_group`` rows per group, chosen by md5(id) order —
    an unbiased, reproducible per-group cap (e.g. max N docs per source
    domain).  Ties cannot occur (md5 of distinct ids collide only
    cryptographically; id breaks them anyway).

    ``pre_buckets`` is the hot-group dial: a window over (group) sorts
    the WHOLE group on one task, so a group with 10^9 rows is a
    straggler.  With pre_buckets=S the rank runs in two phases — top-n
    within each (group, md5-derived bucket) slice, then top-n over the
    <= S*n survivors per group.  Same result set (the global md5 order's
    first n rows survive their bucket's cut by construction), but no
    task ever sorts more than ~|group|/S rows."""
    key = _hash_key(id_col, salt)
    if pre_buckets:
        bucket = F.conv(F.substring(key, 1, 6), 16, 10).cast("long") % pre_buckets
        w1 = Window.partitionBy(group_col, bucket).orderBy(key, F.col(id_col))
        df = (
            df.withColumn("__rn__", F.row_number().over(w1))
            .filter(F.col("__rn__") <= n_per_group)
            .drop("__rn__")
        )
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n_per_group)
        .drop("__rn__")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Adds ``split`` ('test'/'train'): a row is test iff the first 8 hex
    chars of md5(salt || id) fall below the fraction threshold.  Fixed-
    width lowercase hex compares lexicographically == numerically, so the
    same expression runs on any engine; expected test share is
    ``test_frac`` with per-row independence."""
    if test_frac >= 1.0:
        return df.withColumn("split", F.lit("test"))
    if test_frac <= 0.0:
        return df.withColumn("split", F.lit("train"))
    # clamp: format(16**8) would be 9 chars and break the fixed-width
    # lexicographic comparison
    threshold = format(min(int(test_frac * 16**8), 16**8 - 1), "08x")
    return df.withColumn(
        "split",
        F.when(
            F.substring(_hash_key(id_col, salt), 1, 8) < F.lit(threshold),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    seed: str = "seed42",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic corpus shuffle + sharding for training order:
    shard = prefix of md5(seed || id), position = rank of the full md5
    key within the shard.  Rerunning on the same input reproduces the
    exact global sample order (resume-safe epochs); changing ``seed``
    is a fresh permutation.  One shuffle on the shard key; each
    shard's sort is 1/n_shards of the data, so the plan scales by
    adding shards, never by sorting the corpus globally.  For the
    hex-nibble fast path (n_shards == 16) the shard key is the first
    md5 hex char — portable to any engine; other widths derive the
    shard from the first 8 hex chars mod n_shards."""
    k = _hash_key(id_col, seed + ":")
    if n_shards == 16:
        shard = F.substring(k, 1, 1)
    else:
        shard = (F.conv(F.substring(k, 1, 8), 16, 10).cast("long") % n_shards).cast(
            "string"
        )
    w = Window.partitionBy(shard_col).orderBy("__shuffle_key__")
    return (
        df.withColumn("__shuffle_key__", k)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("__shuffle_key__")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized
    (Efraimidis & Spirakis 2006 A-ES, with the RNG replaced by the
    md5-of-id uniform the rest of this module uses): each row gets
    u in (0,1) from its id hash and priority u^(1/w); the k largest
    priorities are the weighted sample.  Deterministic — same input,
    same k rows, any partitioning — and mergeable (top-k of priorities),
    so it composes with resume the way nothing RNG-based can.

    Rows with non-positive weight are excluded (their inclusion
    probability is zero).  The selection compiles to
    TakeOrderedAndProject (per-task top-k + driver merge), never a
    global sort.  Returns the sampled rows + a rounded ``priority``
    column."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        F.conv(F.substring(_hash_key(id_col, salt), 1, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    pr = F.pow(u, F.lit(1.0) / w.cast("double"))
    return (
        df.filter(w > 0)
        .withColumn("priority", pr)
        .orderBy(F.desc("priority"), F.col(id_col).cast("string"))
        .limit(k)
        .withColumn("priority", F.round("priority", 6))
    )
