from demo_apache_flink_streaming_mode_spark.sources.batch import load_table, load_tables

__all__ = ["load_table", "load_tables"]
