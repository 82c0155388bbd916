from .runner import Workflow, JobStatus

__all__ = ["Workflow", "JobStatus"]
