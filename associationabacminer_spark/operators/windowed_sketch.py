"""Windowed sketch builds: one pass computes a mergeable sketch per
sliding event-time window.

The reference materializes ONE JOB PER WINDOW — 30d observation / 1d
slide, each reprocessing its whole window from Mongo
(/root/reference/src/job/WindowGenerator.py:13-24, executor
job_executor.py:93-130).  Sliding windows overlap (a 30d/1d config reads
every row 30x); with mergeable sketches the engine instead builds one
partial sketch per (window, partition) via ``F.window`` row replication
only at the slide granularity, then merges per window — and because
sketches merge, DAILY partials can be rolled into any coarser window
without touching rows again (the hypertable-rollup pattern).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_LINEAGE_SCHEMA = (
    "window_start timestamp, window_end timestamp, sketch_name string, "
    "row_count long, sketch binary, wall_time_s double"
)


def windowed_sketches(
    df: DataFrame,
    specs,
    ts_col: str = "ts",
    width: str = "3 days",
    slide: str = "1 day",
) -> DataFrame:
    """One row per (window, sketch): the window-grouped analog of
    ``build_sketches`` + per-window merge in a single applyInPandas pass
    per window (windows are independent, so this parallelizes across
    them; partial-per-partition + merge applies within huge windows via
    the main harness instead)."""
    import time as _time

    from associationabacminer_spark.operators.agg import _clean, NULL_SENTINEL

    exprs: dict[str, object] = {}
    spec_cols: list[str] = []
    for s in specs:
        if s.prehash:
            cn = f"__xxh_{s.column}__"
            exprs.setdefault(
                cn,
                F.when(F.col(s.column).isNotNull(), F.xxhash64(s.column)).otherwise(
                    F.lit(NULL_SENTINEL)
                ),
            )
        else:
            cn = s.column
            exprs.setdefault(cn, F.col(cn))
        spec_cols.append(cn)
    proj = df.select(
        F.window(ts_col, width, slide).alias("__w__"),
        *[v.alias(k) for k, v in exprs.items()],
    )
    spec_list = [
        (
            s.name,
            s.make,
            c,
            s.dropna,
            s.prehash,
            NULL_SENTINEL if s.prehash else s.null_value,
        )
        for s, c in zip(specs, spec_cols)
    ]

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        ws = pdf["__w__"].iloc[0]
        out = []
        for name, make, column, dropna, prehash, sentinel in spec_list:
            t0 = _time.perf_counter()
            kernel = make()
            arr = _clean(pdf[column], dropna, sentinel)
            if len(arr):
                if prehash:
                    kernel.update_batch(arr, prehashed=True)
                else:
                    kernel.update_batch(arr)
            out.append(
                (
                    ws["start"],
                    ws["end"],
                    name,
                    len(arr),
                    kernel.serialize(),
                    _time.perf_counter() - t0,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "window_start",
                "window_end",
                "sketch_name",
                "row_count",
                "sketch",
                "wall_time_s",
            ],
        )

    return proj.groupBy("__w__").applyInPandas(build, schema=WINDOW_LINEAGE_SCHEMA)


def rollup_windows(
    window_lineage: DataFrame, specs, group_days: int
) -> DataFrame:
    """Merge fine-grained window sketches into coarser windows WITHOUT
    re-reading rows (mergeability is the whole point): e.g. daily
    partials -> 30-day observation windows."""
    deser = {s.name: (s.kernel_cls or type(s.make())).deserialize for s in specs}

    bucket = F.window(F.col("window_start"), f"{group_days} days").alias("__w__")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("window_start", kind="stable")
        name = pdf["sketch_name"].iloc[0]
        de = deser[name]
        kernels = [de(b) for b in pdf["sketch"]]
        merged = kernels[0]
        for k in kernels[1:]:
            merged = type(merged).merge(merged, k)
        return pd.DataFrame(
            {
                "window_start": [pdf["__w__"].iloc[0]["start"]],
                "window_end": [pdf["__w__"].iloc[0]["end"]],
                "sketch_name": [name],
                "row_count": [int(pdf["row_count"].sum())],
                "sketch": [merged.serialize()],
                "wall_time_s": [float(pdf["wall_time_s"].sum())],
            }
        )

    return (
        window_lineage.withColumn("__w__", bucket)
        .groupBy("__w__", "sketch_name")
        .applyInPandas(merge, schema=WINDOW_LINEAGE_SCHEMA)
    )
