"""Sandboxed Jinja template rendering with the reference's custom
delimiters (``<< >>`` variables, ``<% %>`` blocks, ``<# #>`` comments —
reference: ankaflow/common/renderer.py:11-106, semantics studied).

Rendered scalars get light type inference (int/float/bool strings become
typed values) so templated YAML fields keep useful types. Rendering is
recursive over dict/list so whole connection configs can be templated.
"""

from __future__ import annotations

import json
from typing import Any, Dict

from jinja2.sandbox import SandboxedEnvironment


def _infer(value: str) -> Any:
    s = value.strip()
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return value


class Renderer:
    def __init__(self):
        self.env = SandboxedEnvironment(
            variable_start_string="<<",
            variable_end_string=">>",
            block_start_string="<%",
            block_end_string="%>",
            comment_start_string="<#",
            comment_end_string="#>",
            keep_trailing_newline=True,
        )

    def render(self, value: Any, ctx: Dict[str, Any]) -> Any:
        if isinstance(value, str):
            if "<<" not in value and "<%" not in value and "<#" not in value:
                return value
            rendered = self.env.from_string(value).render(**ctx)
            # JSON block marker: a rendered value prefixed with "@json"
            # parses into a real object (reference renderer behavior)
            stripped = rendered.strip()
            if stripped.startswith("@json"):
                return json.loads(stripped[len("@json"):].strip())
            if rendered != value and not isinstance(value, bool):
                inferred = _infer(rendered)
                # only infer when the whole string was a template output
                if value.startswith("<<") and value.endswith(">>"):
                    return inferred
            return rendered
        if isinstance(value, dict):
            return {k: self.render(v, ctx) for k, v in value.items()}
        if isinstance(value, list):
            return [self.render(v, ctx) for v in value]
        return value
