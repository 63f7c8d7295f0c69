from .json_udfs import register_udfs

__all__ = ["register_udfs"]
