"""aqueducts_spark — a PySpark-native declarative pipeline engine.

A from-scratch implementation of the capabilities of the Aqueducts ETL
framework (reference study at /root/reference, v0.11.1), re-expressed
Spark-first: pipeline documents (YAML/JSON/TOML) declare sources ->
SQL stage groups -> a destination; execution is one ``SparkSession``
with temp views as the table namespace, Catalyst as the optimizer, and
distributed ``df.write`` paths as the sinks.

Beyond reference parity, :mod:`aqueducts_spark.operators` adds the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB inputs.
"""

from .config.loader import load_pipeline, load_pipeline_str
from .config.model import Pipeline
from .pipeline import run_pipeline, run_pipeline_file
from .progress import (
    CollectingTracker,
    JsonLinesTracker,
    LoggingTracker,
    ProgressTracker,
)
from .session import get_spark, session_builder

__version__ = "0.1.0"

__all__ = [
    "Pipeline",
    "load_pipeline",
    "load_pipeline_str",
    "run_pipeline",
    "run_pipeline_file",
    "ProgressTracker",
    "LoggingTracker",
    "CollectingTracker",
    "JsonLinesTracker",
    "get_spark",
    "session_builder",
]
