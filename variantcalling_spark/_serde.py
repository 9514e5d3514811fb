"""Closure-serialization policy for worker-side code.

Modules that define Arrow kernel / pandas-UDF bodies register themselves
with cloudpickle's by-value pickling: their worker-side closures then
travel fully self-contained inside the serialized task instead of as
``import variantcalling_spark...`` references. This removes the hidden
deployment requirement that every executor (and any external driver
embedding this engine) has the package on its PYTHONPATH — task bytes
grow by a few KB per module; nothing else changes. Modules stay
importable normally everywhere else.
"""

from __future__ import annotations

import sys


def register_module_by_value(module_name: str) -> None:
    """Best-effort: make cloudpickle serialize ``module_name`` by value
    (call at the END of the module, once fully defined)."""
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:  # pragma: no cover - older pyspark without the API
        pass
