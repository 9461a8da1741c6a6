from associationabacminer_spark.streaming.stream_agg import (
    streaming_window_counts,
    streaming_sketch_build,
)

__all__ = ["streaming_window_counts", "streaming_sketch_build"]
