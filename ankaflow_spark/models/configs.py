"""Deployment-level connection configuration (reference surface:
ankaflow/models/configs.py ``ConnectionConfiguration`` — per-deployment
defaults merged under every stage's connection; behavior studied, fresh
implementation).

Flow-level defaults fill in what stage connections omit: storage
bucket/prefix (locator resolution), JDBC url/credentials, REST headers.
A stage's own connection values always win.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pydantic import BaseModel, Field


class JDBCConfig(BaseModel):
    model_config = {"extra": "allow"}

    url: Optional[str] = None
    user: Optional[str] = None
    password: Optional[str] = None
    fetchsize: Optional[int] = None


class ConnectionConfiguration(BaseModel):
    model_config = {"extra": "allow"}

    bucket: Optional[str] = None
    prefix: Optional[str] = None
    jdbc: Optional[JDBCConfig] = None
    rest_headers: Dict[str, str] = Field(default_factory=dict)

    def apply_defaults(self, spec: Dict[str, Any]) -> Dict[str, Any]:
        """Merge these defaults under a rendered connection spec dict."""
        out = dict(spec)
        if self.bucket and not out.get("bucket"):
            out["bucket"] = self.bucket
        if self.prefix and not out.get("prefix"):
            out["prefix"] = self.prefix
        if self.jdbc and out.get("kind", "").lower() in ("jdbc", "clickhouse", "postgres", "mysql"):
            opts = dict(out.get("options") or {})
            for k, v in self.jdbc.model_dump(exclude_none=True).items():
                opts.setdefault(k, v)
            out["options"] = opts
        if self.rest_headers and out.get("kind", "").lower() == "rest":
            opts = dict(out.get("options") or {})
            headers = {**self.rest_headers, **(opts.get("headers") or {})}
            opts["headers"] = headers
            out["options"] = opts
        return out
