"""adtech_log_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query semantics of the reference
Beam/Dataflow pipeline `aroraayush/adtech-log-data-pipeline` (see SURVEY.md)
as idiomatic Spark SQL / DataFrame transformations, plus LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
    session      SparkSession factory (AQE, Arrow, UTC, sane shuffle sizing)
    schemas      StructType constants for the engine's tables
    sources      parquet table readers + the deterministic bid_logs view
    operators    reference-parity operators (validate, profiles, suspicious,
                 features, inference) per SURVEY.md §2
    functions    scale ops: dedup, similarity, text analysis, multimodal
    plans        declared queries + DuckDB oracle SQL (driver contract)
    streaming    Structured Streaming variants of the core aggregations
"""

__version__ = "0.1.0"
