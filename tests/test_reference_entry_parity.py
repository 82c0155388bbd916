"""Full entry-surface parity flow: the reference's
batch_train_batch_predict workflow executed through EVERY entry point a
reference user would touch, wired exactly as
``batch_train_batch_predict.py`` does —

- ``project.yaml``           → ``init_project`` (af.init_ai_flow_context)
- per-job workflow YAML      → ``WorkflowConfig`` (wfyaml:20-36)
- ``CREATE TABLE … WITH``    → ``FlinkDdlEnv`` (processor.py:44-58,
                               73-90, 95-114) for every source/sink
- control edges              → ``action_on_job_status`` /
                               ``action_on_model_version_event``
                               (py:113-120)
- submit/start lifecycle     → ``WorkflowOperation`` (py:122-126)

The iris end-to-end test (test_iris_workflow.py) proves the ML
semantics; this one proves the WIRING: a user can port the reference's
driver file almost line-for-line.
"""

import os

from pravega_flink_ai_flow_spark.engine.ddl import FlinkDdlEnv
from pravega_flink_ai_flow_spark.engine.project import init_project
from pravega_flink_ai_flow_spark.ml import (
    KNNClassifier, ModelEvent, ModelVersionStage, ops as ml_ops)
from pravega_flink_ai_flow_spark.workflow import (
    ExecutionStatus, JobStatus, Workflow, WorkflowConfig)

from conftest import DATA

FEATURES = ["sl", "sw", "pl", "pw"]

IRIS_DDL_COLS = "sl FLOAT, sw FLOAT, pl FLOAT, pw FLOAT, type FLOAT"

WF_YAML = """
datagen:
  job_type: spark
  properties:
    run_mode: cluster
train:
  job_type: spark
validate:
  job_type: python
predict:
  job_type: spark
"""


def test_reference_entry_surface_flow(spark, tmp_workdir):
    with open(os.path.join(tmp_workdir, "project.yaml"), "w") as f:
        f.write("project_name: pravega_project\n"
                "server_uri: localhost:50051\n"
                "notification_server_uri: localhost:50052\n")
    ctx = init_project(os.path.join(tmp_workdir, "project.yaml"), spark=spark)
    env = FlinkDdlEnv(spark, stream_root=os.path.join(tmp_workdir, "streams"))
    ctx.registry.register_model("iris_knn", "KNN on iris")
    model_dir = os.path.join(tmp_workdir, "saved_model")
    result_dir = os.path.join(tmp_workdir, "predict_result")

    def build() -> Workflow:
        wf = Workflow(spark, ctx.registry)

        def datagen(wf):
            # DatagenSource (processor.py:44-58): filesystem/csv DDL →
            # DatagenSink (:73-90): pravega/json DDL sinks
            env.execute_sql(f"""
                create table iris_train_csv ({IRIS_DDL_COLS}) with (
                    'connector' = 'filesystem',
                    'path' = '{os.path.join(DATA, "iris_train.csv")}',
                    'format' = 'csv',
                    'csv.ignore-parse-errors' = 'true'
                )""")
            env.execute_sql(f"""
                create table iris_test_csv ({IRIS_DDL_COLS}) with (
                    'connector' = 'filesystem',
                    'path' = '{os.path.join(DATA, "iris_test.csv")}',
                    'format' = 'csv',
                    'csv.ignore-parse-errors' = 'true'
                )""")
            for sink, stream in [("datagen_train_sink", "train-stream"),
                                 ("datagen_predict_sink", "predict-stream")]:
                env.execute_sql(f"""
                    create table {sink} ({IRIS_DDL_COLS}) with (
                        'connector' = 'pravega',
                        'controller-uri' = 'tcp://localhost:9090',
                        'scope' = 'scope',
                        'sink.stream' = '{stream}',
                        'format' = 'json'
                    )""")
            env.add_insert("datagen_train_sink", env.from_path("iris_train_csv"))
            env.add_insert("datagen_predict_sink", env.from_path("iris_test_csv"))

        def train_job(wf):
            # TrainSource (processor.py:95-114): bounded pravega scan DDL
            env.execute_sql(f"""
                create table train_source ({IRIS_DDL_COLS}) with (
                    'connector' = 'pravega',
                    'controller-uri' = 'tcp://localhost:9090',
                    'scope' = 'scope',
                    'scan.execution.type' = 'batch',
                    'scan.streams' = 'train-stream',
                    'format' = 'json'
                )""")
            ml_ops.train(env.from_path("train_source"),
                         registry=ctx.registry, model_name="iris_knn",
                         feature_cols=FEATURES, label_col="type",
                         fit_fn=lambda x, y: KNNClassifier(5).fit(x, y),
                         model_dir=model_dir)

        def validate_job(wf):
            df = env.from_path("iris_test_csv")
            ml_ops.validate(df, registry=ctx.registry, model_name="iris_knn",
                            feature_cols=FEATURES, label_col="type",
                            metrics_path=os.path.join(tmp_workdir, "metrics"))

        def predict_job(wf):
            env.execute_sql(f"""
                create table predict_source ({IRIS_DDL_COLS}) with (
                    'connector' = 'pravega',
                    'controller-uri' = 'tcp://localhost:9090',
                    'scope' = 'scope',
                    'scan.execution.type' = 'batch',
                    'scan.streams' = 'predict-stream',
                    'format' = 'json'
                )""")
            env.execute_sql(f"""
                create table predict_sink (prediction FLOAT) with (
                    'connector' = 'filesystem',
                    'path' = '{result_dir}',
                    'format' = 'csv'
                )""")
            ml_ops.register_predict_udf(spark, registry=ctx.registry,
                                        model_name="iris_knn")
            out = spark.sql(
                "SELECT mypred(sl, sw, pl, pw) AS prediction "
                "FROM predict_source")
            env.add_insert("predict_sink", out)

        wf.job("datagen", datagen)
        wf.job("train", train_job)
        wf.job("validate", validate_job)
        wf.job("predict", predict_job)
        wf.action_on_job_status("train", "datagen", JobStatus.FINISHED)
        wf.action_on_model_version_event("validate", "iris_knn",
                                         ModelEvent.MODEL_GENERATED)
        wf.action_on_model_version_event("predict", "iris_knn",
                                         ModelEvent.MODEL_DEPLOYED)
        return wf

    # the reference's exact submission sequence (py:122-126)
    name = "batch_train_batch_predict"
    op = ctx.workflow_operation
    op.submit_workflow(name, build,
                       config=WorkflowConfig.from_yaml(WF_YAML, name))
    op.stop_all_workflow_executions(name)
    ex = op.start_new_workflow_execution(name)

    assert ex.status == ExecutionStatus.FINISHED
    assert ex.job_statuses() == {j: "FINISHED" for j in
                                 ["datagen", "train", "validate", "predict"]}
    deployed = ctx.registry.get_deployed_model_version("iris_knn")
    assert deployed is not None
    assert deployed.current_stage == ModelVersionStage.DEPLOYED

    pred = (spark.read.schema("prediction float").csv(result_dir))
    assert pred.count() == 30
    # sanity: predictions are valid class labels
    labels = {r.prediction for r in pred.collect()}
    assert labels <= {0.0, 1.0, 2.0}
