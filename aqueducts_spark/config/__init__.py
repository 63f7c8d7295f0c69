from .loader import load_pipeline, load_pipeline_str
from .model import Pipeline, Stage

__all__ = ["load_pipeline", "load_pipeline_str", "Pipeline", "Stage"]
