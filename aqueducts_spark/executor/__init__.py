from .server import ExecutorServer, run_server
from .client import cancel_execution, check_health, submit_pipeline

__all__ = [
    "ExecutorServer",
    "run_server",
    "submit_pipeline",
    "cancel_execution",
    "check_health",
]
