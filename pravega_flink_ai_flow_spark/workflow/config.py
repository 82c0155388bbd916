"""Per-job workflow configuration (SURVEY.md M6; VERDICT.md r3 missing
item 2).

The reference configures each job of a workflow in a YAML file keyed by
job name (`pravega_project/workflows/batch_train_batch_predict/
batch_train_batch_predict.yaml:20-36`):

    datagen:
      job_type: flink
      properties:
        run_mode: cluster
    validate:
      job_type: python

Here ``job_type`` distinguishes engine-executed jobs (``flink`` in the
reference → ``spark`` here; both accepted) from plain-python driver-side
jobs, and ``properties`` carries free-form per-job settings
(``run_mode`` etc.). In a single-process Spark engine both job types
execute as callables on the shared session — the config is honored as
metadata the runner validates and records (a job declared ``python``
must not return a DataFrame plan, the engine types must match the
declared set), not as a dispatch to external clusters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_KNOWN_JOB_TYPES = {"spark", "flink", "python"}


@dataclass
class JobConfig:
    name: str
    job_type: str = "spark"
    properties: dict = field(default_factory=dict)

    @property
    def run_mode(self) -> str:
        return str(self.properties.get("run_mode", "local"))


@dataclass
class WorkflowConfig:
    workflow_name: str
    jobs: dict[str, JobConfig] = field(default_factory=dict)

    def job(self, name: str) -> JobConfig:
        # undeclared jobs default to engine-executed, like the reference's
        # default job config
        return self.jobs.get(name, JobConfig(name))

    @classmethod
    def from_yaml(cls, text: str, workflow_name: str) -> "WorkflowConfig":
        data = _load_yaml(text)
        jobs: dict[str, JobConfig] = {}
        for name, spec in (data or {}).items():
            spec = spec or {}
            job_type = str(spec.get("job_type", "spark")).lower()
            if job_type not in _KNOWN_JOB_TYPES:
                raise ValueError(
                    f"job {name!r}: unknown job_type {job_type!r} "
                    f"(expected one of {sorted(_KNOWN_JOB_TYPES)})")
            jobs[name] = JobConfig(name=name, job_type=job_type,
                                   properties=dict(spec.get("properties") or {}))
        return cls(workflow_name=workflow_name, jobs=jobs)

    @classmethod
    def from_yaml_file(cls, path: str,
                       workflow_name: str | None = None) -> "WorkflowConfig":
        import os
        with open(path) as f:
            text = f.read()
        name = workflow_name or os.path.splitext(os.path.basename(path))[0]
        return cls.from_yaml(text, name)


def _load_yaml(text: str) -> dict:
    try:
        import yaml
        return yaml.safe_load(text) or {}
    except ImportError:
        return _mini_yaml(text)


def _mini_yaml(text: str) -> dict:
    """Fallback parser for the simple two-level mapping shape the job
    config uses (keys, nested keys, scalar values, '#' comments) — keeps
    the engine dependency-free if PyYAML is absent."""
    import re

    root: dict = {}
    stack: list[tuple[int, dict]] = [(-1, root)]
    for raw in text.splitlines():
        if raw.lstrip().startswith("#"):
            continue
        # YAML comment rule: '#' starts a comment only at line start or
        # after whitespace — a bare '#' inside a value (file#1, #frag)
        # is part of the value
        line = re.split(r"\s#", raw, 1)[0].rstrip()
        if not line.strip():
            continue
        indent = len(line) - len(line.lstrip())
        key, _, val = line.strip().partition(":")
        val = val.strip()
        while stack and indent <= stack[-1][0]:
            stack.pop()
        parent = stack[-1][1]
        if val:
            parent[key] = val
        else:
            child: dict = {}
            parent[key] = child
            stack.append((indent, child))
    return root
