"""Closure-shipping helper for Python-side kernels (pandas UDFs, decode
loops).

cloudpickle serializes module-level functions by *reference* — the worker
re-imports the defining module. But executors don't necessarily have this
package importable: the driver harness imports ``__spark_entry__`` via a
sys.path insertion that Python workers never see. Registering a module for
by-value pickling ships the function bodies (and any referenced module
globals, e.g. precomputed numpy constants) inside the task closure itself,
so the only executor-side requirements are site-packages (pyspark, numpy,
pandas — present on any Spark+Arrow worker image).
"""

from __future__ import annotations

import sys

_REGISTERED: set[str] = set()


def ship_module_by_value(module_name: str) -> None:
    """Idempotently register ``module_name`` for cloudpickle by-value
    serialization."""
    if module_name in _REGISTERED:
        return
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[module_name])
    _REGISTERED.add(module_name)
