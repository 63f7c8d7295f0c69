"""Worker-side code shipping for Python-UDF-bearing modules.

cloudpickle serializes importable module-level functions BY REFERENCE:
the serialized task stores ``(module, qualname)`` and every Python
worker re-imports the module.  That silently couples every pandas UDF /
mapInPandas operator to a deployment requirement — the package must be
importable on all executors (spark-submit --py-files, a cluster-wide
pip install, or PYTHONPATH).  Drivers that embed this library from a
plain checkout (notebooks, test harnesses, the correctness driver) then
fail deep inside the Python worker with an opaque import error.

Registering the defining module for BY-VALUE pickling ships the
function code inside the task itself — zero executor deployment
requirements, at the cost of a few extra KB per serialized task (paid
once per task, irrelevant next to Arrow batch traffic).

Modules whose UDF bodies only reference *nested* functions don't need
this (cloudpickle always serializes closures by value); call it from
any module whose worker-side code references module-level names.
"""

from __future__ import annotations

from types import ModuleType

__all__ = ["ship_module_by_value"]


def ship_module_by_value(module: ModuleType) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception as exc:  # pragma: no cover - best-effort fallback
        # by-reference pickling still works when the package IS
        # importable on executors — but leave a trace: a silent fallback
        # re-creates the exact undiagnosable worker ImportError this
        # module exists to prevent
        import logging

        logging.getLogger(__name__).warning(
            "ship_module_by_value(%s) failed (%s: %s) — UDFs will pickle "
            "by reference; executors must have the package installed",
            module.__name__, type(exc).__name__, exc,
        )
