"""Structured Streaming variants of the engine's aggregations.

The reference has no streaming at all — its 'windows' are reprocessed
batch jobs from a Mongo queue (SURVEY.md §2.9 W1).  Here the same
semantics run incrementally: watermarked sliding event-time windows, and
a ``foreachBatch`` sketch builder that folds each micro-batch into the
mergeable kernels (exactly-once per epoch id is the caller's concern;
sketch merge idempotence makes at-least-once safe for HLL/Bloom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_window_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    width: str = "3 days",
    slide: str = "1 day",
    watermark: str = "1 day",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked sliding window counts — the streaming twin of
    ``operators.windows.window_counts`` (same output schema + group
    columns), late data beyond ``watermark`` dropped."""
    g = [F.window(ts_col, width, slide).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*g)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_cols or []),
            "n",
        )
    )


def streaming_sketch_build(
    stream: DataFrame,
    specs,
    state: dict,
    num_groups: int = 16,
):
    """foreachBatch sink that folds every micro-batch into ``state``
    ({sketch_name: kernel}) via the batch harness.  Returns the function
    to pass to ``writeStream.foreachBatch``.

    Mergeable sketches make incremental aggregation trivial: each epoch
    builds partial sketches distributed, then merges into the running
    state on the driver — the streaming analog of the two-stage tree.
    """
    from associationabacminer_spark.operators.agg import sketch_aggregate

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = sketch_aggregate(batch_df, specs, num_groups=num_groups)
        for name, kernel in partial.items():
            if name in state:
                state[name] = type(kernel).merge(state[name], kernel)
            else:
                state[name] = kernel

    return fold


def streaming_binned_histogram(
    group_cols: list[str],
    col: str,
    state: dict,
    rel_width: float = 5e-4,
):
    """foreachBatch sink folding each micro-batch's (group, bin)
    centroid table into ``state`` ({group_tuple: {bin: [count, sum]}})
    — the streaming twin of ``operators.sql_sketch.quantiles_by_group``.
    Each batch's reduction runs JVM-side (the same symmetric-log
    binning); only the occupied-bin table crosses to the driver, so
    state stays at groups x occupied bins regardless of stream length,
    and bin (count, sum) pairs are additive, so at-least-once epochs
    only ever need the caller's epoch-id dedup, never a rebuild.
    Quantiles are read at any time via ``quantiles_from_binned_state``
    and equal the batch operator on the union of batches (exactly, for
    integral columns; up to float summation order otherwise)."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        c = F.col(col).cast("double")
        b = (
            F.signum(c) * F.floor(F.log1p(F.abs(c)) / F.lit(float(rel_width)))
        ).cast("long")
        rows = (
            batch_df.filter(c.isNotNull() & ~F.isnan(c))
            .groupBy(*group_cols, b.alias("__bin"))
            .agg(F.count("*").alias("__cnt"), F.sum(c).alias("__sum"))
            .collect()
        )
        for r in rows:
            bins = state.setdefault(tuple(r[g] for g in group_cols), {})
            cur = bins.get(r["__bin"])
            if cur is None:
                bins[r["__bin"]] = [r["__cnt"], r["__sum"]]
            else:
                cur[0] += r["__cnt"]
                cur[1] += r["__sum"]

    return fold


def quantiles_from_binned_state(
    state: dict, qs: tuple = (0.5, 0.9, 0.99)
) -> dict:
    """{group_tuple: {"p50": v, ...}} from a ``streaming_binned_histogram``
    state — the identical rank-ceil(q*n) in-bin-mean selection as the
    batch operator (bin means sort like bin indexes: disjoint value
    intervals)."""
    import math

    from associationabacminer_spark.operators.sql_sketch import _quantile_alias

    out = {}
    for g, bins in state.items():
        items = sorted((s / cnt, cnt) for cnt, s in bins.values())
        total = sum(c for _, c in items)
        res = {}
        for q in qs:
            rank = math.ceil(float(q) * total)
            cum = 0
            val = items[-1][0] if items else None
            for v, cnt in items:
                cum += cnt
                if cum >= rank:
                    val = v
                    break
            res[_quantile_alias(q)] = val
        out[g] = res
    return out


def streaming_conversation_state(
    stream: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
):
    """Custom stateful per-conversation tracker via
    ``applyInPandasWithState`` — the arbitrary-state API the engine uses
    where watermarked windows can't express the semantics (running
    per-KEY aggregates that must survive across micro-batches).

    State per conversation: (turns, last_ts_epoch_s, max_gap_s).  Each
    micro-batch folds its rows in event-time order, chaining the gap
    computation across batches through the state — the streaming twin of
    the batch inter-turn-latency window (operators/windows.py W2).
    Emits one update row per touched conversation per batch
    (outputMode='update').

    Contract: arrival order must respect event time ACROSS micro-batches
    per key (in-batch disorder is sorted away).  That holds for
    append-only time-ordered sources (Kafka per-partition order, file
    drops by time range); for sources that violate it, use the
    watermarked window path instead — arbitrary-state late-data repair
    would need a per-key reorder buffer, which this operator
    deliberately does not grow."""
    import pandas as pd

    out_schema = (
        f"{conv_col} string, turns long, last_ts double, max_gap double"
    )
    state_schema = "turns long, last_ts double, max_gap double"

    def update(key, pdfs, state):
        if state.exists:
            turns, last_ts, max_gap = state.get
        else:
            turns, last_ts, max_gap = 0, None, 0.0
        for pdf in pdfs:
            ts = (
                pd.to_datetime(pdf[ts_col])
                .astype("int64")
                .to_numpy()
                .astype("float64")
                / 1e9
            )
            ts.sort()
            for t in ts:
                if last_ts is not None:
                    gap = t - last_ts
                    if gap > max_gap:
                        max_gap = float(gap)
                last_ts = float(t)
                turns += 1
        state.update((turns, last_ts, max_gap))
        yield pd.DataFrame(
            {
                conv_col: [key[0]],
                "turns": [turns],
                "last_ts": [last_ts],
                "max_gap": [max_gap],
            }
        )

    return stream.groupBy(conv_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first row per key wins, duplicate arrivals
    within the watermark horizon are dropped, and per-key state is
    evicted once the watermark passes — bounded state, unlike a naive
    ``dropDuplicates`` whose state grows forever.  The streaming twin of
    ``operators.dedup.exact_dedup`` (the reference's sha1-keyed unique
    index, EnvLogUniverseGenerator.py:84-104)."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_content_dedup(
    stream: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-hash variant: dedup on md5(text) so byte-identical
    payloads collapse regardless of id."""
    keyed = stream.withColumn("__digest__", F.md5(F.col(text_col)))
    return streaming_dedup(keyed, ["__digest__"], ts_col, watermark).drop(
        "__digest__"
    )
