"""appstore_aws_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities declared by
the reference repo ``santoroc/appstore-aws-etl`` (see SURVEY.md): an
App-Store-style ETL (object-store landing zone -> Spark transform ->
warehouse serving tables), widened into a complete DataFrame/SQL operator
surface plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis), all designed for 100 TB scale.

Layout:
    session     — SparkSession factory with scale-aware defaults
    schemas     — explicit StructType schemas for every fixture table
    catalog     — table loading + temp-view registration
    registry    — query registry powering __spark_entry__.py
    io/         — sources & sinks (landing zone, parquet/csv/json, jdbc)
    operators/  — reusable composite operators (as-of join, sessionize, ...)
    llm/        — dedup / similarity / text-analysis operators
    streaming/  — Structured Streaming operators
    queries/    — the declared query inventory (SURVEY.md §2)
"""

__version__ = "0.1.0"
