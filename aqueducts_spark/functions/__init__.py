from .compat import FUNCTION_RENAMES, register_compat_functions, translate_sql
from .json_udfs import register_udfs
from .udafs import register_udafs
from .udtfs import register_udtfs

__all__ = [
    "register_udfs",
    "register_compat_functions",
    "register_udafs",
    "register_udtfs",
    "translate_sql",
    "FUNCTION_RENAMES",
]
