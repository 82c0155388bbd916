"""Workflow config + execution management (SURVEY.md M6; the
``af.workflow_operation`` / per-job YAML surface of the reference,
batch_train_batch_predict.py:122-126 and batch_train_batch_predict.yaml).
"""

import pytest

from pravega_flink_ai_flow_spark.workflow import (
    ExecutionStatus, JobStatus, Workflow, WorkflowConfig, WorkflowOperation)

# the reference's job-config YAML, verbatim shape
#   (batch_train_batch_predict.yaml:20-36)
REFERENCE_YAML = """
datagen:
  job_type: flink
  properties:
    run_mode: cluster

train:
  job_type: flink
  properties:
    run_mode: cluster

validate:
  job_type: python

predict:
  job_type: flink
  properties:
    run_mode: cluster
"""


def test_yaml_config_parses_reference_file():
    cfg = WorkflowConfig.from_yaml(REFERENCE_YAML, "batch_train_batch_predict")
    assert set(cfg.jobs) == {"datagen", "train", "validate", "predict"}
    assert cfg.job("train").job_type == "flink"
    assert cfg.job("train").run_mode == "cluster"
    assert cfg.job("validate").job_type == "python"
    assert cfg.job("validate").run_mode == "local"
    # undeclared jobs default to engine-executed
    assert cfg.job("extra").job_type == "spark"


def test_yaml_config_rejects_unknown_job_type():
    with pytest.raises(ValueError):
        WorkflowConfig.from_yaml("j:\n  job_type: cobol\n", "w")


def test_mini_yaml_fallback_matches_pyyaml():
    from pravega_flink_ai_flow_spark.workflow.config import (
        _load_yaml, _mini_yaml)
    assert _mini_yaml(REFERENCE_YAML) == _load_yaml(REFERENCE_YAML)


def _build(spark, order):
    wf = Workflow(spark)
    wf.job("datagen", lambda w: order.append("datagen"))
    wf.job("train", lambda w: order.append("train"))
    wf.action_on_job_status("train", "datagen", JobStatus.FINISHED)
    return wf


def test_submit_start_and_list_executions(spark):
    op = WorkflowOperation()
    order = []
    op.submit_workflow(
        "wf", lambda: _build(spark, order),
        config=WorkflowConfig.from_yaml(
            "datagen:\n  job_type: spark\ntrain:\n  job_type: spark\n", "wf"))
    ex1 = op.start_new_workflow_execution("wf")
    ex2 = op.start_new_workflow_execution("wf")
    assert order == ["datagen", "train", "datagen", "train"]
    assert ex1.status == ex2.status == ExecutionStatus.FINISHED
    assert ex1.execution_id != ex2.execution_id
    assert ex1.job_statuses() == {"datagen": "FINISHED", "train": "FINISHED"}
    assert [e.execution_id for e in op.list_workflow_executions("wf")] \
        == [ex1.execution_id, ex2.execution_id]
    assert op.get_workflow_execution(ex2.execution_id) is ex2


def test_stop_prevents_downstream_jobs(spark):
    op = WorkflowOperation()

    def build():
        wf = Workflow(spark)
        # the running job requests stop (stands in for an external
        # stop_all_workflow_executions arriving mid-run)
        wf.job("datagen", lambda w: w.request_stop())
        wf.job("train", lambda w: pytest.fail("train must not start"))
        wf.action_on_job_status("train", "datagen", JobStatus.FINISHED)
        return wf

    op.submit_workflow("wf", build)
    ex = op.start_new_workflow_execution("wf")
    assert ex.status == ExecutionStatus.STOPPED
    assert ex.workflow.status("train") == JobStatus.PENDING


def test_stop_all_marks_running_executions(spark):
    op = WorkflowOperation()
    op.submit_workflow("wf", lambda: _build(spark, []))
    ex = op.start_new_workflow_execution("wf")
    assert op.stop_all_workflow_executions("wf") == 0   # already finished
    ex.status = ExecutionStatus.RUNNING                 # simulate live run
    assert op.stop_all_workflow_executions("wf") == 1
    assert ex.status == ExecutionStatus.STOPPED
    assert ex.workflow.stop_requested


def test_python_job_type_must_not_return_plans(spark):
    op = WorkflowOperation()

    def build():
        wf = Workflow(spark)
        wf.job("validate", lambda w: spark.range(3))
        return wf

    op.submit_workflow(
        "wf", build,
        config=WorkflowConfig.from_yaml("validate:\n  job_type: python\n", "wf"))
    with pytest.raises(TypeError, match="job_type: python"):
        op.start_new_workflow_execution("wf")
    assert op.list_workflow_executions("wf")[0].status == ExecutionStatus.FAILED


def test_unsubmitted_workflow_raises():
    with pytest.raises(KeyError):
        WorkflowOperation().start_new_workflow_execution("ghost")


def test_project_context_from_reference_yaml(spark, tmp_workdir):
    """init_project loads the reference's project.yaml shape and wires
    catalog + registry + workflow operation with persistent state."""
    import os

    from pravega_flink_ai_flow_spark.engine.project import init_project

    ypath = os.path.join(tmp_workdir, "project.yaml")
    with open(ypath, "w") as f:
        f.write("project_name: pravega_project\n"
                "server_uri: localhost:50051\n"
                "notification_server_uri: localhost:50052\n")
    ctx = init_project(ypath, spark=spark)
    assert ctx.project_name == "pravega_project"
    assert ctx.properties["server_uri"] == "localhost:50051"
    ctx.catalog.register_dataset("d1", "parquet", "/tmp/x")
    # a reopened project sees the registration (metadata-DB semantics)
    ctx2 = init_project(ypath, spark=spark)
    assert "d1" in ctx2.catalog
    ctx2.workflow_operation.submit_workflow(
        "wf", lambda: _build(spark, []))
    assert ctx2.workflow_operation.start_new_workflow_execution(
        "wf").status == ExecutionStatus.FINISHED


def test_mini_yaml_keeps_hash_inside_values():
    from pravega_flink_ai_flow_spark.workflow.config import _mini_yaml
    got = _mini_yaml("j:\n  properties:\n"
                     "    path: /data/file#1  # trailing comment\n")
    assert got == {"j": {"properties": {"path": "/data/file#1"}}}
