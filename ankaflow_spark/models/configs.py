"""Deployment-level connection configuration (reference surface:
ankaflow/models/configs.py ``ConnectionConfiguration`` — per-deployment
defaults merged under every stage's connection; behavior studied, fresh
implementation).

Flow-level defaults fill in what stage connections omit: storage
bucket/prefix (locator resolution), JDBC url/credentials, REST headers.
A stage's own connection values always win.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from pydantic import BaseModel, Field


class JDBCConfig(BaseModel):
    model_config = {"extra": "allow"}

    url: Optional[str] = None
    user: Optional[str] = None
    password: Optional[str] = None
    fetchsize: Optional[int] = None


class S3Config(BaseModel):
    bucket: Optional[str] = None
    region: Optional[str] = None
    access_key_id: Optional[str] = None
    secret_access_key: Optional[str] = None


class GSConfig(BaseModel):
    bucket: Optional[str] = None
    region: Optional[str] = None
    hmac_key: Optional[str] = None
    hmac_secret: Optional[str] = None
    credential_file: Optional[str] = None


class BigQueryConfig(BaseModel):
    project: Optional[str] = None
    credential_file: Optional[str] = None


def _as_bucket_uri(name: str, scheme: str) -> str:
    """A bare bucket name gets its scheme; URIs / absolute paths pass
    through (local paths keep the CLI testable without object storage)."""
    if "://" in name or name.startswith("/"):
        return name
    return f"{scheme}://{name}"


class ConnectionConfiguration(BaseModel):
    model_config = {"extra": "allow"}

    bucket: Optional[str] = None
    prefix: Optional[str] = None
    jdbc: Optional[JDBCConfig] = None
    rest_headers: Dict[str, str] = Field(default_factory=dict)
    s3: Optional[S3Config] = None
    gs: Optional[GSConfig] = None
    bigquery: Optional[BigQueryConfig] = None

    @classmethod
    def from_env(cls, env: Optional[Dict[str, str]] = None) -> "ConnectionConfiguration":
        """Build deployment defaults from environment variables (reference
        cli.py:37-56 resolve_config — same variable names)."""
        e = env if env is not None else os.environ
        s3 = S3Config(
            bucket=e.get("AWS_DEFAULT_BUCKET"),
            region=e.get("AWS_REGION") or e.get("AWS_DEFAULT_REGION"),
            access_key_id=e.get("AWS_ACCESS_KEY_ID"),
            secret_access_key=e.get("AWS_SECRET_ACCESS_KEY"),
        )
        gs = GSConfig(
            bucket=e.get("GOOGLE_STORAGE_BUCKET"),
            region=e.get("GOOGLE_STORAGE_REGION"),
            hmac_key=e.get("GS_HMAC_KEY_ID"),
            hmac_secret=e.get("GS_HMAC_SECRET"),
            credential_file=e.get("GOOGLE_APPLICATION_CREDENTIALS"),
        )
        bq = BigQueryConfig(
            project=e.get("GOOGLE_CLOUD_PROJECT"),
            credential_file=e.get("GOOGLE_APPLICATION_CREDENTIALS"),
        )
        bucket = None
        if s3.bucket:
            bucket = _as_bucket_uri(s3.bucket, "s3")
        elif gs.bucket:
            bucket = _as_bucket_uri(gs.bucket, "gs")
        return cls(bucket=bucket, s3=s3, gs=gs, bigquery=bq)

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
