"""Worker-serialization seam.

Any module whose functions/classes ship to Python workers via cloudpickle
(pandas kernels for mapInPandas / applyInPandasWithState, Python
DataSource classes) must be serialized BY VALUE: the caller's session may
have been built outside this repo (plain driver session, arbitrary cwd),
so workers cannot import the package by name (NOTES.md pitfall).

Call ``pickle_module_by_value(__name__)`` once at module import time.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle


def pickle_module_by_value(module_name: str) -> None:
    cloudpickle.register_pickle_by_value(sys.modules[module_name])
