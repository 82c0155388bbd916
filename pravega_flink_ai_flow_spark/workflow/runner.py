"""Event-driven workflow runner (SURVEY.md M6) — the in-process
replacement for AI Flow + Airflow + the notification server.

Reference semantics being reproduced (batch_train_batch_predict.py):

- jobs declared under ``af.job_config(name)`` blocks (py:40,74,84,99);
- control edge "start job B when job A reaches status S":
  ``af.action_on_job_status(job_name='train', upstream_job_name='datagen',
  upstream_job_status=Status.FINISHED)`` (py:114);
- control edge "start job J when model M emits event E":
  ``af.action_on_model_version_event(...)`` for MODEL_GENERATED →
  validate and MODEL_VALIDATED → predict (py:115-120).

Here: jobs are plain callables sharing one SparkSession; data edges are
the values they return/consume; control edges are subscriptions on an
in-process event bus. ``run()`` executes reactively — a job fires when
its trigger event arrives — exactly the reference's event-driven model,
minus the three external servers (SURVEY.md §3.1: IR #2 disappears).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Optional


class JobStatus:
    PENDING = "PENDING"
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"
    FAILED = "FAILED"


@dataclass
class _Job:
    name: str
    fn: Callable[["Workflow"], Any]
    status: str = JobStatus.PENDING
    result: Any = None


@dataclass
class _Trigger:
    job_name: str                      # job to start
    kind: str                          # "job_status" | "model_event"
    upstream: str                      # upstream job name or model name
    event: str                         # status or model event name


class Workflow:
    """Topological/event-driven job runner over one SparkSession."""

    def __init__(self, spark, registry=None):
        self.spark = spark
        self.registry = registry
        self.config = None                 # WorkflowConfig, optional
        self._jobs: dict[str, _Job] = {}
        self._triggers: list[_Trigger] = []
        self._queue: deque[str] = deque()
        self._events_log: list[tuple[str, str, str]] = []
        self._stop = False
        if registry is not None:
            registry.subscribe(self._on_model_event)

    # -- configuration / cancellation ---------------------------------------

    def apply_config(self, config) -> None:
        """Attach a per-job WorkflowConfig (job_type, run_mode, ...). The
        runner validates it at execution time: a job declared
        ``job_type: python`` is a driver-side step and must not return a
        DataFrame plan (those belong to engine jobs)."""
        self.config = config

    def request_stop(self) -> None:
        """Cooperative cancel (``stop_all_workflow_executions``): the
        in-flight job finishes, queued jobs never start."""
        self._stop = True

    @property
    def stop_requested(self) -> bool:
        return self._stop

    # -- graph construction (the af.* DSL equivalents) ----------------------

    def job(self, name: str, fn: Callable[["Workflow"], Any]) -> None:
        """Declare a job (the ``with af.job_config(name):`` block)."""
        self._jobs[name] = _Job(name, fn)

    def action_on_job_status(self, job_name: str, upstream_job_name: str,
                             upstream_job_status: str = JobStatus.FINISHED) -> None:
        self._triggers.append(_Trigger(job_name, "job_status",
                                       upstream_job_name, upstream_job_status))

    def action_on_model_version_event(self, job_name: str, model_name: str,
                                      event: str) -> None:
        self._triggers.append(_Trigger(job_name, "model_event",
                                       model_name, event))

    def result(self, job_name: str) -> Any:
        return self._jobs[job_name].result

    def status(self, job_name: str) -> str:
        return self._jobs[job_name].status

    @property
    def events(self) -> list[tuple[str, str, str]]:
        """(kind, source, event) log in firing order — lets tests assert
        the control edges fired in the reference's order."""
        return list(self._events_log)

    # -- execution ----------------------------------------------------------

    def run(self, start_jobs: Optional[list[str]] = None) -> None:
        """Run reactively: seed with ``start_jobs`` (default: jobs with no
        trigger), then let events drive the rest until quiescence."""
        if start_jobs is None:
            triggered = {t.job_name for t in self._triggers}
            start_jobs = [n for n in self._jobs if n not in triggered]
        self._queue.extend(start_jobs)
        while self._queue and not self._stop:
            name = self._queue.popleft()
            job = self._jobs[name]
            if job.status != JobStatus.PENDING:
                continue
            job.status = JobStatus.RUNNING
            try:
                job.result = job.fn(self)
                self._check_job_type(name, job.result)
            except Exception:
                job.status = JobStatus.FAILED
                self._publish("job_status", name, JobStatus.FAILED)
                raise
            job.status = JobStatus.FINISHED
            self._publish("job_status", name, JobStatus.FINISHED)

    def _check_job_type(self, name: str, result) -> None:
        if self.config is None:
            return
        from pyspark.sql import DataFrame
        if (self.config.job(name).job_type == "python"
                and isinstance(result, DataFrame)):
            raise TypeError(
                f"job {name!r} is configured job_type: python (a driver-"
                "side step) but returned a DataFrame plan — declare it "
                "spark/flink in the workflow YAML")

    # -- event bus ----------------------------------------------------------

    def _publish(self, kind: str, source: str, event: str) -> None:
        self._events_log.append((kind, source, event))
        for t in self._triggers:
            if t.kind == kind and t.upstream == source and t.event == event:
                self._queue.append(t.job_name)

    def _on_model_event(self, model_name: str, event: str, _version) -> None:
        """Registry listener — model-stage transitions behave like the
        reference's notification-server events (processor.py:138 emits
        MODEL_GENERATED; promotions emit MODEL_VALIDATED/DEPLOYED)."""
        self._publish("model_event", model_name, event)
