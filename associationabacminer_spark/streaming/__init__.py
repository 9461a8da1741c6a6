from associationabacminer_spark.streaming.stream_agg import (
    streaming_window_counts,
    streaming_sketch_build,
    streaming_binned_histogram,
    quantiles_from_binned_state,
)

__all__ = [
    "streaming_window_counts",
    "streaming_sketch_build",
    "streaming_binned_histogram",
    "quantiles_from_binned_state",
]
