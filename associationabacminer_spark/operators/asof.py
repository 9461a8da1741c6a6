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
