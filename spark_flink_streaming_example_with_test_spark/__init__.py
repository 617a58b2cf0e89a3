"""PySpark-native analytics engine with the capabilities of
`erickgunawan99/spark-flink-streaming-example-with-test` (reference), extended with
large-scale LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): a library of pure ``DataFrame ->
DataFrame`` transform functions + source/sink adapters + a session
factory. Every transform is batch/stream agnostic (Structured
Streaming's core promise); no custom Catalyst rules are needed —
the engine declares logical plans and lets Catalyst/Tungsten/AQE
pick physical strategies.
"""

from spark_flink_streaming_example_with_test_spark.session import get_session

__all__ = ["get_session"]
