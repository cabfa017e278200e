"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference Flink streaming demo
(ducngtrung/demo-apache-flink-streaming-mode), re-expressed Spark-first.

Layout:
    session    -- SparkSession factory + runtime conf normalization
    schemas    -- StructType registry for all input tables
    sources/   -- batch + streaming readers (file-monitor CSV, Kafka, parquet)
    operators/ -- the operator library (transforms, windows, joins, state,
                  dedup, similarity, text analysis, multimodal)
    functions/ -- scalar/column helper expressions shared by operators
    plans/     -- the judged query registry (queries + DuckDB oracle SQL)
    streaming/ -- Structured Streaming layer (sinks, stateful ops, parity)

Everything is built on the DataFrame API so Catalyst/Tungsten handle
optimization; Python UDFs appear only where built-ins cannot express the
semantics (and then only as Arrow-batched pandas UDFs).
"""

from demo_apache_flink_streaming_mode_spark.session import get_spark, ensure_runtime_confs

__all__ = ["get_spark", "ensure_runtime_confs"]
