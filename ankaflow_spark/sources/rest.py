"""REST connector (reference surface: ankaflow/connections/rest/* —
paginated / polled JSON batches materialized incrementally, retry with
exponential backoff on {429,500,502,503,504}).

Spark-first shape: the driver fetches pages (urllib; httpx is absent in
this container) and each page becomes a DataFrame via createDataFrame;
pages are combined with unionByName — the Materializer pattern. The page
loop is inherently driver-side (sequential HTTP pagination); the data
volume contract is the same as the reference's (REST sources are
control-plane-sized, not 100 TB scans).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any, Dict, Iterable, List, Optional

from pyspark.sql import DataFrame

from ..models.core import Stage
from ..session import SparkEngine
from .file import fields_to_schema

RETRY_STATUSES = {429, 500, 502, 503, 504}
MAX_RETRIES = 3


def fetch_with_retry(url: str, headers: Optional[Dict[str, str]] = None) -> bytes:
    """GET with the reference's retry policy: 3 retries, backoff 2^(n+1)s
    on transient statuses."""
    last: Exception = RuntimeError("unreachable")
    for attempt in range(MAX_RETRIES + 1):
        try:
            req = urllib.request.Request(url, headers=headers or {})
            with urllib.request.urlopen(req) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            last = e
            if e.code not in RETRY_STATUSES or attempt == MAX_RETRIES:
                raise
            time.sleep(2 ** (attempt + 1))
        except urllib.error.URLError as e:
            last = e
            if attempt == MAX_RETRIES:
                raise
            time.sleep(2 ** (attempt + 1))
    raise last


class RestConnection:
    def __init__(self, engine: SparkEngine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables

    def _pages(self) -> Iterable[List[Dict[str, Any]]]:
        url = self.spec["locator"]
        headers = self.spec.get("options", {}).get("headers", {})
        page_param = self.spec.get("options", {}).get("page_param")
        max_pages = int(self.spec.get("options", {}).get("max_pages", 1000))
        records_path = self.spec.get("options", {}).get("records_path")
        page = 0
        while page < max_pages:
            page_url = f"{url}{'&' if '?' in url else '?'}{page_param}={page}" if page_param else url
            payload = json.loads(fetch_with_retry(page_url, headers))
            if records_path:
                import jmespath

                payload = jmespath.search(records_path, payload)
            records = payload if isinstance(payload, list) else [payload]
            if not records:
                return
            yield records
            if not page_param:
                return
            page += 1

    def tap(self, query: Optional[str], stage: Stage) -> DataFrame:
        schema = fields_to_schema(self.spec.get("fields"))
        df: Optional[DataFrame] = None
        for records in self._pages():
            batch = self.engine.spark.createDataFrame(records, schema=schema)
            df = batch if df is None else df.unionByName(batch, allowMissingColumns=True)
        if df is None:
            if schema is None:
                raise ValueError("REST source returned no rows and no explicit fields are set")
            df = self.engine.spark.createDataFrame([], schema=schema)
        if query:
            view = f"__rest_{abs(hash(stage.name)) % 10**8}"
            df.createOrReplaceTempView(view)
            df = self.engine.sql(query.replace(f'"{stage.name}"', view))
        return df

    def sink(self, df: DataFrame, stage: Stage) -> None:
        raise NotImplementedError("REST sink is not part of the reference surface")

    def execute(self, query: str, stage: Stage) -> None:
        raise NotImplementedError("REST connection does not support sql stages")
