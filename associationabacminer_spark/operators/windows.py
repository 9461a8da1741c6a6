"""Temporal windowing operators (SURVEY.md §2.9).

W1: sliding calendar windows — the reference materializes one job per
30d/1d window (/root/reference/src/job/WindowGenerator.py:13-24); here a
single ``F.window`` grouping computes every window in one pass.
W2: inter-event latency — absent in the reference (events independent),
required for the transcript graft's inter-turn latency quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(col):
    """Epoch seconds from TIMESTAMP or TIMESTAMP_NTZ (session TZ is
    pinned to UTC, so NTZ values are interpreted as UTC — matching
    DuckDB's epoch() on naive timestamps)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def inter_event_latency(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    ts_col: str = "ts",
    out_col: str = "latency_s",
) -> DataFrame:
    """Seconds since the previous event within the partition (null for
    the first event)."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    return df.withColumn(
        out_col,
        _epoch_s(ts_col) - F.lag(_epoch_s(ts_col)).over(w),
    )


def inter_event_gaps_agg(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    ts_col: str = "ts",
    out_col: str = "latency_s",
) -> DataFrame:
    """Inter-event gaps as a HASH AGGREGATE instead of a sort-based
    window: collect each group's (order, ts) pairs, sort the tiny
    per-group array in memory, emit consecutive diffs via a higher-order
    transform.  Same multiset of gaps as ``inter_event_latency`` minus
    the per-group leading null (tested).  Measured on 59M transcript
    turns at 16 cores the sort-based window is FASTER (7.9 s vs 12.4 s)
    — collect_list's per-group object allocation outweighs the external
    sort it avoids — so the window form stays the default; this form
    exists for memory-constrained executors where one partition's
    external sort would spill."""
    pairs = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), _epoch_s(ts_col).alias("t"))
        )
    )
    return (
        df.groupBy(partition_col)
        .agg(pairs.alias("a"))
        .select(
            F.explode(
                F.when(
                    F.size("a") >= 2,
                    F.expr("transform(sequence(1, size(a) - 1), i -> a[i].t - a[i-1].t)"),
                ).otherwise(F.array().cast("array<double>"))
            ).alias(out_col)
        )
    )


def window_counts(
    df: DataFrame, ts_col: str = "ts", width: str = "3 days", slide: str = "1 day"
) -> DataFrame:
    """Sliding window row counts -> (window_start, window_end, n)."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def sessionize(
    df: DataFrame,
    partition_col: str,
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Classic lag+cumsum sessionization: a new session starts when the
    gap to the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(partition_col).orderBy(ts_col)
    gap = _epoch_s(ts_col) - F.lag(_epoch_s(ts_col)).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("__new__", new_sess).withColumn(
        "session_id", F.sum("__new__").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new__")
