from .compat import FUNCTION_RENAMES, register_compat_functions, translate_sql
from .json_udfs import register_udfs

__all__ = [
    "register_udfs",
    "register_compat_functions",
    "translate_sql",
    "FUNCTION_RENAMES",
]
