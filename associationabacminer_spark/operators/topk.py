"""Top-k / heavy-hitter operators (SURVEY.md §2.8 T1/T2, §2.4 A6).

The reference's ``enforce_itemset_limit`` sorts counts descending, takes
the count at rank k as a threshold, keeps strictly-greater entries, then
fills ties back up to k (/root/reference/src/EnvAbacRuleMiner.py:234-247).
Here both tie policies are window functions: ``rank() <= k`` (all ties
kept) and ``row_number() <= k`` with a deterministic tiebreak (exact k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_by_count(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    count_col: str = "count",
    keep_ties: bool = False,
) -> DataFrame:
    """Global top-k by count with deterministic key tiebreak.

    Scale shape: the default path compiles to TakeOrderedAndProject
    (per-task top-k + driver merge of k*tasks rows) — never the
    single-partition global window a ``row_number() OVER (ORDER BY ..)``
    produces, which funnels every input row through one task.
    ``keep_ties=True`` keeps every row tied with the k-th COUNT: the
    k-th largest count is computed by the same bounded top-k and
    broadcast back as a threshold filter."""
    order = [F.desc(count_col)] + [F.asc(c) for c in key_cols]
    if not keep_ties:
        return df.orderBy(*order).limit(k)
    kth = (
        df.select(F.col(count_col).alias("__c__"))
        .orderBy(F.desc("__c__"))
        .limit(k)
        .agg(F.min("__c__").alias("__kth__"))
    )
    return (
        df.crossJoin(F.broadcast(kth))
        .filter(F.col(count_col) >= F.col("__kth__"))
        .drop("__kth__")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] = (),
) -> DataFrame:
    """Top-k within each group (A13's top-10 constraint pattern,
    /root/reference/src/util/ConfigPolicySummarizer.py:18-39)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_col), *[F.asc(c) for c in tiebreak_cols]
    )
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )


def heavy_hitters(
    df: DataFrame, col: str, min_support: float
) -> DataFrame:
    """Keys whose frequency >= min_support * N — the exact version of the
    CMS heavy-hitter query (one pass, map-side partial aggregation)."""
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_support * total)
        .withColumn("support", F.round(F.col("cnt") / F.lit(total), 6))
        .orderBy(F.desc("cnt"), F.asc(col))
    )
