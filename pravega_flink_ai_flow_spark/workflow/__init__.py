from .runner import Workflow, JobStatus
from .config import WorkflowConfig, JobConfig
from .operation import (ExecutionStatus, WorkflowExecution,
                        WorkflowOperation)

__all__ = ["Workflow", "JobStatus", "WorkflowConfig", "JobConfig",
           "ExecutionStatus", "WorkflowExecution", "WorkflowOperation"]
