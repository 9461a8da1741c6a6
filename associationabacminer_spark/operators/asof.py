"""As-of join — Spark has no native one (pyspark guide: bucketize or
merge_asof); implemented here as a UNION + ordered-window
``last(ignorenulls)`` sweep, which is a single shuffle on (key, time)
and no Python.

Semantics: for every left row, attach the latest right row with
``right.ts <= left.ts`` within the same key (backward as-of, the DuckDB
``ASOF JOIN`` default — used as the oracle in queries.py).

Scale notes: one exchange hash-partitioned by key, ordered within
partitions; skewed keys can be salted by time-bucketing the key first
(both sides bucketed identically) at the cost of per-bucket boundary
re-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. Ties (equal timestamps) match, with the right
    row sorted before the left row at the same instant."""
    lt = left.select(
        F.col(key).alias("__k__"),
        F.col(left_ts).alias("__t__"),
        F.lit(1).alias("__side__"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}__") for c in right_cols],
    )
    rt = right.select(
        F.col(key).alias("__k__"),
        F.col(right_ts).alias("__t__"),
        F.lit(0).alias("__side__"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        *[F.col(c).alias(f"__r_{c}__") for c in right_cols],
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy("__k__")
        .orderBy("__t__", "__side__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"__r_{c}__", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return (
        filled.filter(F.col("__side__") == 1)
        .drop("__k__", "__t__", "__side__", *[f"__r_{c}__" for c in right_cols])
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Backward as-of join with hot-key salting: the window partitions on
    (key, time-bucket) instead of key alone, so one hot key fans out to
    ~range/bucket_seconds tasks instead of landing on a single one
    (VERDICT.md round 1, scale-killer #4).

    Boundary handling: a left row early in a bucket may need a right row
    from an earlier bucket.  Each (key, bucket) therefore receives a
    CARRY-IN row — the latest right row of any earlier bucket — computed
    on the per-(key, bucket) aggregate (one row per key x bucket, tiny),
    then injected ahead of every in-bucket row in the sweep's sort order.
    Same semantics as ``asof_join``: ties match, right sorts before left
    at the same instant."""
    rdt = dict(right.dtypes)
    ldt = left.dtypes
    t_type = dict(left.dtypes)[left_ts]

    def bucket_of(col):
        return F.floor(
            F.col(col).cast("timestamp").cast("double") / F.lit(float(bucket_seconds))
        ).cast("long")

    lt = left.select(
        F.col(key).alias("__k__"),
        F.col(left_ts).alias("__t__"),
        bucket_of(left_ts).alias("__b__"),
        F.lit(0).alias("__c__"),
        F.lit(1).alias("__side__"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(rdt[c]).alias(f"__r_{c}__") for c in right_cols],
    )
    rt = right.select(
        F.col(key).alias("__k__"),
        F.col(right_ts).alias("__t__"),
        bucket_of(right_ts).alias("__b__"),
        F.lit(0).alias("__c__"),
        F.lit(0).alias("__side__"),
        *[F.lit(None).cast(t).alias(c) for c, t in ldt],
        *[F.col(c).alias(f"__r_{c}__") for c in right_cols],
    )
    # latest right row per (key, bucket), then the running carry across
    # buckets — windows over ONE ROW PER (key, bucket), never raw rows
    grid = lt.select("__k__", "__b__").union(rt.select("__k__", "__b__")).distinct()
    rb = rt.groupBy("__k__", "__b__").agg(
        F.max_by(
            F.struct(*[F.col(f"__r_{c}__").alias(c) for c in right_cols]),
            F.col("__t__"),
        ).alias("__last__")
    )
    wc = (
        Window.partitionBy("__k__")
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        grid.join(rb, ["__k__", "__b__"], "left")
        .select(
            "__k__",
            "__b__",
            F.last("__last__", ignorenulls=True).over(wc).alias("__carry__"),
        )
        .filter(F.col("__carry__").isNotNull())
    )
    carry_rows = carry.select(
        "__k__",
        F.lit(None).cast(t_type).alias("__t__"),
        "__b__",
        F.lit(1).alias("__c__"),
        F.lit(-1).alias("__side__"),
        *[F.lit(None).cast(t).alias(c) for c, t in ldt],
        *[F.col("__carry__")[c].alias(f"__r_{c}__") for c in right_cols],
    )
    merged = lt.unionByName(rt).unionByName(carry_rows)
    w = (
        Window.partitionBy("__k__", "__b__")
        .orderBy(F.desc("__c__"), F.asc("__t__"), F.asc("__side__"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"__r_{c}__", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("__side__") == 1).drop(
        "__k__", "__t__", "__b__", "__c__", "__side__",
        *[f"__r_{c}__" for c in right_cols],
    )
