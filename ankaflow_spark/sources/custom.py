"""Custom connection loader (reference surface:
ankaflow/models/connections.py:236-275 ``CustomConnection`` — users point
a stage at their own connector implementation; behavior studied, fresh
implementation).

YAML:

    - kind: tap
      name: my source
      connection:
        kind: custom
        module: my_pkg.connectors.MyConnection
        locator: whatever-the-class-wants

The dotted path resolves to a class implementing the connector protocol
(``__init__(engine, spec, variables)`` + ``tap``/``sink``/``execute``).
Resolution is import-system based; no sandboxing — same trust model as
the reference (custom connectors are user code by definition).
"""

from __future__ import annotations

import importlib
from typing import Any, Dict


class CustomConnectionError(RuntimeError):
    pass


def load_connector_class(dotted: str):
    """``pkg.mod.ClassName`` -> class object."""
    if "." not in dotted:
        raise CustomConnectionError(
            f"custom connection module must be a dotted path, got {dotted!r}"
        )
    mod_path, _, cls_name = dotted.rpartition(".")
    try:
        mod = importlib.import_module(mod_path)
    except ImportError as e:
        raise CustomConnectionError(f"cannot import {mod_path!r}: {e}") from e
    cls = getattr(mod, cls_name, None)
    if cls is None:
        raise CustomConnectionError(f"{mod_path!r} has no attribute {cls_name!r}")
    for required in ("tap", "sink"):
        if not callable(getattr(cls, required, None)):
            raise CustomConnectionError(
                f"{dotted} does not implement the connector protocol ({required} missing)"
            )
    return cls


class CustomConnection:
    """Dispatcher: instantiates the user class and delegates."""

    def __init__(self, engine, spec: Dict[str, Any], variables: Dict[str, Any]):
        dotted = spec.get("module") or (spec.get("options") or {}).get("module")
        if not dotted:
            raise CustomConnectionError("custom connection needs `module: pkg.mod.Class`")
        self._inner = load_connector_class(dotted)(engine, spec, variables)

    def tap(self, query, stage):
        return self._inner.tap(query, stage)

    def sink(self, df, stage):
        return self._inner.sink(df, stage)

    def execute(self, query, stage):
        return self._inner.execute(query, stage)
