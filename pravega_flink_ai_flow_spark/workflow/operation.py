"""Workflow execution management (SURVEY.md M6; VERDICT.md r3 missing
item 3) — the ``af.workflow_operation`` surface:

    workflow_operation.stop_all_workflow_executions(name)
    workflow_operation.submit_workflow(name)
    workflow_operation.start_new_workflow_execution(name)

(`pravega_project/workflows/batch_train_batch_predict/
batch_train_batch_predict.py:122-126`.)

The reference submits to an Airflow-backed scheduler; here executions
run in-process on the shared SparkSession. ``submit_workflow``
registers a *builder* (definition → fresh ``Workflow`` per execution,
matching the reference where submit uploads the definition and each
``start_new_workflow_execution`` materializes a new run);
``stop_all_workflow_executions`` requests cooperative cancellation —
the runner finishes the in-flight job and drains the queue, the
execution records STOPPED.
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass, field
from typing import Callable, Optional

from .config import WorkflowConfig
from .runner import JobStatus, Workflow


class ExecutionStatus:
    SUBMITTED = "SUBMITTED"
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"
    FAILED = "FAILED"
    STOPPED = "STOPPED"


@dataclass
class WorkflowExecution:
    workflow_name: str
    execution_id: int
    workflow: Workflow
    status: str = ExecutionStatus.SUBMITTED

    def job_statuses(self) -> dict[str, str]:
        return {n: self.workflow.status(n) for n in self.workflow._jobs}


@dataclass
class _Submitted:
    name: str
    builder: Callable[[], Workflow]
    config: Optional[WorkflowConfig] = None


class WorkflowOperation:
    """In-process registry of submitted workflow definitions and their
    executions."""

    def __init__(self):
        self._submitted: dict[str, _Submitted] = {}
        self._executions: list[WorkflowExecution] = []
        self._ids = itertools.count(1)
        self._lock = threading.Lock()

    # -- definition lifecycle ----------------------------------------------

    def submit_workflow(self, name: str, builder: Callable[[], Workflow],
                        config: WorkflowConfig | None = None) -> None:
        """Register (or replace) a workflow definition. ``builder``
        returns a freshly-constructed Workflow per execution."""
        if config is not None and config.workflow_name != name:
            raise ValueError(
                f"config is for workflow {config.workflow_name!r}, "
                f"not {name!r}")
        self._submitted[name] = _Submitted(name, builder, config)

    # -- execution lifecycle ------------------------------------------------

    def start_new_workflow_execution(self, name: str,
                                     start_jobs: list[str] | None = None
                                     ) -> WorkflowExecution:
        sub = self._submitted.get(name)
        if sub is None:
            raise KeyError(f"workflow {name!r} was never submitted")
        wf = sub.builder()
        if sub.config is not None:
            wf.apply_config(sub.config)
        with self._lock:
            ex = WorkflowExecution(name, next(self._ids), wf,
                                   ExecutionStatus.RUNNING)
            self._executions.append(ex)
        try:
            wf.run(start_jobs)
        except Exception:
            with self._lock:
                ex.status = ExecutionStatus.FAILED
            raise
        with self._lock:
            ex.status = (ExecutionStatus.STOPPED if wf.stop_requested
                         else ExecutionStatus.FINISHED)
        return ex

    def stop_all_workflow_executions(self, name: str) -> int:
        """Request cooperative stop of every live execution of ``name``;
        returns how many were signalled. Finished/failed executions are
        untouched (matching the reference's idempotent pre-submit
        cleanup call). Lock-guarded: RUNNING is only observable from
        another thread, so traversal must not race the starting
        thread's append/status writes."""
        n = 0
        with self._lock:
            for ex in list(self._executions):
                if (ex.workflow_name == name
                        and ex.status == ExecutionStatus.RUNNING):
                    ex.workflow.request_stop()
                    ex.status = ExecutionStatus.STOPPED
                    n += 1
        return n

    def list_workflow_executions(self, name: str) -> list[WorkflowExecution]:
        with self._lock:
            return [e for e in self._executions if e.workflow_name == name]

    def get_workflow_execution(self, execution_id: int) -> WorkflowExecution:
        with self._lock:
            for e in self._executions:
                if e.execution_id == execution_id:
                    return e
        raise KeyError(f"no execution {execution_id}")
