from demo_apache_flink_streaming_mode_spark.functions.scalars import (
    cosine_similarity,
    decimal_sum,
    dot,
    epoch_ms,
    hex_to_long,
    norm,
    window_start_ms,
)

__all__ = [
    "cosine_similarity", "decimal_sum", "dot", "epoch_ms",
    "hex_to_long", "norm", "window_start_ms",
]
