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

# Lazy top-level facade: the handful of objects a reference user touches
# (session, project context, catalog, registry, workflow, DDL env) import
# from the package root without dragging pyspark-heavy modules in at
# import time.
_FACADE = {
    "get_spark": ("pravega_flink_ai_flow_spark.engine.session", "get_spark"),
    "init_project": ("pravega_flink_ai_flow_spark.engine.project", "init_project"),
    "Catalog": ("pravega_flink_ai_flow_spark.engine.catalog", "Catalog"),
    "FlinkDdlEnv": ("pravega_flink_ai_flow_spark.engine.ddl", "FlinkDdlEnv"),
    "ModelRegistry": ("pravega_flink_ai_flow_spark.ml.registry", "ModelRegistry"),
    "Workflow": ("pravega_flink_ai_flow_spark.workflow", "Workflow"),
    "WorkflowConfig": ("pravega_flink_ai_flow_spark.workflow", "WorkflowConfig"),
    "WorkflowOperation": ("pravega_flink_ai_flow_spark.workflow", "WorkflowOperation"),
    "register_views": ("pravega_flink_ai_flow_spark.queries", "register_views"),
}


def __getattr__(name):
    if name in _FACADE:
        import importlib
        mod, attr = _FACADE[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_FACADE))
