from .server import ExecutorServer, run_server
from .client import submit_pipeline, cancel_execution

__all__ = ["ExecutorServer", "run_server", "submit_pipeline", "cancel_execution"]
