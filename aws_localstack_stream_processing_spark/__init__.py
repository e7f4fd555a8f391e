"""PySpark-native analytics engine re-expressing the capabilities of the
reference stream-processing pipeline (MartinCastroAlvarez/aws-localstack-stream-processing)
as idiomatic Spark DataFrame / SQL / Structured Streaming programs, extended
with LLM-training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``    : tuned SparkSession factory
- ``catalog``    : test-table loading (handles nanosecond parquet timestamps)
- ``functions``  : deterministic scalar-expression builders (cross-engine)
- ``operators``  : batch operators (partitioning, dedup, similarity, top-k, multimodal)
- ``plans``      : the named query surface + DuckDB oracle SQL registry
- ``streaming``  : Structured Streaming jobs (DLQ split, LRU key ring, windows)
"""

__version__ = "0.1.0"
