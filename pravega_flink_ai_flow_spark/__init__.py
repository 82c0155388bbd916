"""PySpark-native analytics engine with the capabilities of the reference
``fyang86/pravega-flink-ai-flow`` (a Flink AI Flow + Pravega sample workflow),
re-designed Spark-first.

Layout
------
- ``engine``    : SparkSession factory, dataset catalog.
- ``io``        : batch sources/sinks (CSV/JSON/Parquet/rows) + the
                  Pravega-sim stream-dir source/sink (bounded + unbounded).
- ``ops``       : relational helpers (as-of join, top-k per group, session
                  windows) and the LLM-data-pipeline operators (dedup,
                  similarity, text analysis, multimodal).
- ``ml``        : model registry with lifecycle stages, train/validate/predict.
- ``workflow``  : in-process event-driven DAG runner (the AI Flow replacement).
- ``streaming`` : Structured Streaming wrappers (watermarks, windows, stateful).
- ``queries``   : the declared-query corpus — every SURVEY.md §2 operator as a
                  (spark, sf_dir) -> DataFrame callable with a DuckDB oracle.
"""

__version__ = "0.1.0"
