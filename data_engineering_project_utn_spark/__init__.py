"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference project (SayeedaBegam/Data_engineering_Project_UTN).

The reference is a Kafka + DuckDB + Streamlit pipeline over the Redset
query-log dataset. This package re-expresses every operator it supports
(SURVEY.md §2) as idiomatic PySpark DataFrame / SQL / Structured Streaming,
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB operation.

Layout:
    session    – SparkSession factory with scale-oriented defaults
    schema     – canonical StructTypes (Redset log + driver tables)
    tables     – loaders for the driver-provided parquet tables
    functions  – scalar expression helpers (deterministic-FP aggregates etc.)
    operators  – batch operator library (pure DataFrame -> DataFrame fns)
    sources    – batch/streaming readers & writers
    streaming  – Structured Streaming wrappers (windowed aggs, stateful EMA)
    llm        – training-data pipeline ops (dedup, similarity, text, multimodal)
    plans      – the query registry (Spark callable + DuckDB oracle twin)
"""

__version__ = "0.1.0"
