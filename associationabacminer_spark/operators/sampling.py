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


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_col: str,
    budget: int,
    weights: dict[str, float] | None = None,
    salt: str = "",
    pre_buckets: int | None = None,
) -> DataFrame:
    """Deterministic data-mixture sampling: fill a global token
    ``budget`` across sources in the ratio ``weights`` (the training-mix
    recipe — e.g. web 0.6 / code 0.2 / books 0.2), selecting each
    source's docs in md5(id) order until its allocation is full.

    Per-source allocation b_s = floor(budget * w_s / sum(w)); the kept
    set is the maximal PREFIX of the source's md5 order whose running
    token sum stays <= b_s (prefix semantics, not knapsack: the first
    doc that overflows the allocation ends the source — unbiased
    because md5 order is independent of doc content).  Sources absent
    from ``weights`` are dropped; ``weights=None`` means equal shares
    over the observed sources (one tiny distinct() to enumerate them).
    Pure function of the data: reruns are byte-identical, like the rest
    of this module.

    ``pre_buckets`` is the hot-source dial (same motivation as
    ``quota_sample``): the default single window sorts a whole source on
    one task.  With pre_buckets=S, rows bucket by the md5 key's leading
    16 bits scaled to S contiguous ranges — bucket order IS key-prefix
    order — and the budget cut decomposes exactly: per-(source, bucket)
    token sums (a tiny aggregate) give each bucket its carry-in; buckets
    that fit entirely under the allocation keep all rows with NO sort,
    buckets past it drop wholesale, and only the single boundary bucket
    (~1/S of the source) pays a window cumsum, offset by its carry.
    Provably the same rows as the single-phase cut (the global running
    sum at any row = its bucket carry + its in-bucket prefix), asserted
    by TestTokenBudgetMix equivalence."""
    key = _hash_key(id_col, salt)
    if weights is None:
        srcs = [r[0] for r in df.select(source_col).distinct().collect()]
        weights = {s: 1.0 for s in srcs}
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    budget_map = F.create_map(
        *[
            x
            for s, w in sorted(weights.items())
            for x in (F.lit(s), F.lit(int(budget * w / total_w)))
        ]
    )
    b = budget_map[F.col(source_col)]
    toks = F.col(token_col).cast("long")
    if pre_buckets:
        s_n = int(pre_buckets)
        v = F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
        bucket = ((v * s_n) / F.lit(65536)).cast("long")
        tagged = df.withColumn("__bkt__", bucket)
        sums = tagged.groupBy(source_col, "__bkt__").agg(
            F.sum(toks).alias("__bsum__")
        )
        wc = (
            Window.partitionBy(source_col)
            .orderBy("__bkt__")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = sums.withColumn(
            "__carry__", F.coalesce(F.sum("__bsum__").over(wc), F.lit(0))
        )
        j = tagged.join(F.broadcast(carry), [source_col, "__bkt__"])
        full = j.filter(F.col("__carry__") + F.col("__bsum__") <= b)
        # boundary uses <= (not <): a bucket whose carry EQUALS the
        # allocation can still contain zero-token rows at its head that
        # the single-phase cut keeps (cum == b); with < they'd be
        # dropped wholesale.  Disjoint from `full` because here
        # carry + bsum > b.
        boundary = j.filter(
            (F.col("__carry__") <= b) & (F.col("__carry__") + F.col("__bsum__") > b)
        )
        wb = (
            Window.partitionBy(source_col, "__bkt__")
            .orderBy(key, F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        bkept = (
            boundary.withColumn("__cum__", F.sum(toks).over(wb))
            .filter(F.col("__carry__") + F.col("__cum__") <= b)
            .drop("__cum__")
        )
        return full.unionByName(bkept).drop("__bkt__", "__bsum__", "__carry__")
    w = (
        Window.partitionBy(source_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum__", F.sum(toks).over(w))
        .filter(F.col("__cum__") <= b)
        .drop("__cum__")
    )


def dsir_sample(
    df: DataFrame,
    id_col: str,
    logw_col,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Importance resampling WITHOUT replacement via derandomized
    Gumbel top-k (the selection step of DSIR, Xie et al. 2023; the
    Gumbel-top-k <-> sampling-without-replacement equivalence is
    Vieira 2014 / Kool et al. 2019): each row gets an independent
    Gumbel(0,1) perturbation g = -ln(-ln u) and the k largest
    ``logw + g`` are EXACTLY a draw of k distinct rows proportional to
    softmax(logw) — no normalizing constant ever computed, so it
    distributes trivially.  The RNG is replaced by this module's
    md5-of-id uniform: same input, same k rows, any partitioning, and
    mergeable (top-k of keys) so it composes with resume; vary ``salt``
    to draw a fresh independent sample.

    ``logw_col`` is the log importance weight (``lm.dsir_logratio``'s
    ``logw``).  Selection compiles to TakeOrderedAndProject (per-task
    top-k + driver merge), never a global sort.  Returns the sampled
    rows + a rounded ``gumbel_key`` column."""
    lw = F.col(logw_col) if isinstance(logw_col, str) else logw_col
    u = (
        F.conv(F.substring(_hash_key(id_col, salt), 1, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    key = lw.cast("double") - F.log(-F.log(u))
    return (
        df.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col).cast("string"))
        .limit(k)
        .withColumn("gumbel_key", F.round("gumbel_key", 6))
    )
