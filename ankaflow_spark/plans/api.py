"""Template API object exposed to Jinja contexts (reference surface:
ankaflow/api.py:12-166 — same helper names/semantics, fresh
implementation).

Available in any templated field as ``API``: e.g.
``<< API.dt(variables.since).isoformat() >>`` or
``WHERE id IN << API.sqltuple(variables.ids) >>``.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Optional

import jmespath as _jmespath


class APIError(RuntimeError):
    pass


class API:
    """Stateless helpers + variable accessors bound to one flow run."""

    def __init__(self, variables: Optional[dict] = None):
        self._variables = variables if variables is not None else {}

    # -- datetime coercion (mirrors Fn.dt branch logic driver-side) -------
    @staticmethod
    def dt(value: Any) -> dt.datetime:
        if isinstance(value, dt.datetime):
            return value
        if isinstance(value, dt.date):
            return dt.datetime(value.year, value.month, value.day)
        if isinstance(value, (int, float)):
            v = float(value)
            if 1e18 <= v < 1e20:  # ns
                return dt.datetime.fromtimestamp(v / 1e9, dt.timezone.utc).replace(tzinfo=None)
            if 1e12 <= v < 1e14:  # ms
                return dt.datetime.fromtimestamp(v / 1e3, dt.timezone.utc).replace(tzinfo=None)
            return dt.datetime.fromtimestamp(v, dt.timezone.utc).replace(tzinfo=None)
        s = str(value).strip()
        if s.isdigit():
            return API.dt(int(s))
        iso = s.replace("T", " ").rstrip("Zz")
        for fmt in (
            "%Y-%m-%d %H:%M:%S.%f",
            "%Y-%m-%d %H:%M:%S",
            "%Y-%m-%d %H:%M",
            "%Y-%m-%d",
            "%Y/%m/%d",
        ):
            try:
                return dt.datetime.strptime(iso, fmt)
            except ValueError:
                continue
        try:
            return dt.datetime.fromisoformat(s)
        except ValueError as e:
            raise APIError(f"API.dt: cannot parse {value!r}") from e

    # -- structure lookup --------------------------------------------------
    @staticmethod
    def look(path: str, data: Any) -> Any:
        """JMESPath lookup into dict/list data."""
        return _jmespath.search(path, data)

    # -- SQL literal helpers ----------------------------------------------
    @staticmethod
    def sqltuple(values: Iterable[Any]) -> str:
        """Render an iterable as a SQL IN-list tuple: ``('a', 1, NULL)``.
        Empty input renders ``(NULL)`` so ``IN ()`` never appears."""
        items = list(values)
        if not items:
            return "(NULL)"
        rendered = []
        for v in items:
            if v is None:
                rendered.append("NULL")
            elif isinstance(v, bool):
                rendered.append("TRUE" if v else "FALSE")
            elif isinstance(v, (int, float)):
                rendered.append(str(v))
            else:
                escaped = str(v).replace("'", "''")
                rendered.append(f"'{escaped}'")
        return "(" + ", ".join(rendered) + ")"

    @staticmethod
    def int(value: Any, default: int = 0) -> int:
        try:
            return int(float(value))
        except (TypeError, ValueError):
            return default

    # -- flow interaction --------------------------------------------------
    def setvariable(self, name: str, value: Any) -> str:
        self._variables[name] = value
        return ""

    def getvariable(self, name: str, default: Any = None) -> Any:
        return self._variables.get(name, default)

    @staticmethod
    def error(condition: Any, message: str) -> str:
        """Fail the render (and thus the stage) when condition is truthy."""
        if condition:
            raise APIError(message)
        return ""

    @staticmethod
    def peek(value: Any) -> Any:
        """Log-and-passthrough for template debugging."""
        import logging

        logging.getLogger("ankaflow_spark.api").info("peek: %r", value)
        return value
