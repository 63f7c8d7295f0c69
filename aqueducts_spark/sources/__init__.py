from .register import register_source, register_sources

__all__ = ["register_source", "register_sources"]
