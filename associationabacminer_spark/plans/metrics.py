"""Distributed runtime counters (SURVEY.md §2 X5).

The reference tracks rows processed across worker threads with a locked
AtomicCounter (/root/reference/src/util/AtomicCounter.py:32-48) and
prints progress from it (EnvLogUniverseGenerator.py, job_executor.py).
The Spark-native analogs, in preference order:

- ``observed``: ``df.observe(Observation, ...)`` — exact aggregate
  metrics collected as a side effect of whatever action consumes the
  DataFrame. Zero extra jobs, zero extra scans; the right default.
- ``with_row_count_accumulator``: a SparkContext accumulator bumped per
  Arrow batch — live, monotone progress visible on the driver *while*
  a long job runs (the AtomicCounter's actual use-case). Opt-in: it
  inserts a mapInPandas pass-through stage, so only wrap the hot path
  when live progress is worth one Arrow round-trip.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame


def observed(df: DataFrame, name: str = "metrics", **exprs: Column):
    """Attach named aggregate observations to ``df``.

    Returns ``(df, observation)``; read ``observation.get`` after an
    action has consumed the returned DataFrame.  Example::

        df, obs = observed(df, rows=F.count(F.lit(1)), vol=F.sum("value"))
        df.write.parquet(path)
        print(obs.get)   # {'rows': ..., 'vol': ...}
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[e.alias(n) for n, e in exprs.items()]), obs


def with_row_count_accumulator(df: DataFrame, accumulator):
    """Pass-through stage that adds each Arrow batch's row count to a
    SparkContext accumulator — live progress a driver thread can poll
    mid-job (``accumulator.value``), matching the reference's
    AtomicCounter.increment loop but batched, not per-row."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    schema = df.schema

    def count_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            accumulator.add(len(pdf))
            yield pdf

    return df.mapInPandas(count_batches, schema=schema)
