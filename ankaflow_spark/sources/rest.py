"""REST connector.

Reference surface (behavior studied, not ported): ankaflow/connections/
rest/rest.py (handler dispatch: Basic / Pagination / URLPolling /
StatePolling), rest/server.py:23-211 (auth flows incl. OAuth2
client-credentials + refresh with transient retry), rest/common.py:38-156
(batch materializer for JSON/JSONL/CSV/Parquet payloads), models/
rest.py (Request/RestResponse/handler models).

Spark-first shape: the driver fetches pages/polls (urllib; httpx is
absent in this container) and each batch becomes a DataFrame via
``createDataFrame``; batches combine with ``unionByName`` — the
Materializer pattern. The request loop is inherently driver-side
(sequential HTTP); the data-volume contract matches the reference's
(REST sources are control-plane-sized, not 100 TB scans).

Connection spec — both shapes are accepted:

* **Legacy/simple**: ``locator: <url>`` + ``options: {page_param,
  max_pages, records_path, headers}`` (GET + JSON).
* **Reference-shaped**: ``client: {base_url, timeout, auth: {method,
  provider|values, oauth_header}}`` + ``request: {endpoint, method,
  content_type, query, body, errorhandler, max_retries,
  initial_backoff, response: {handler, content_type, locator}}``.
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Dict, Iterable, List, Optional, Tuple

from pyspark.sql import DataFrame

from ..models.core import Stage
from ..session import SparkEngine
from .file import fields_to_schema

RETRY_STATUSES = {429, 500, 502, 503, 504}
MAX_RETRIES = 3


class RestRequestError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# transport
# ---------------------------------------------------------------------------
def _http(
    method: str,
    url: str,
    *,
    params: Optional[Dict[str, Any]] = None,
    headers: Optional[Dict[str, str]] = None,
    body: Optional[bytes] = None,
    timeout: Optional[float] = None,
) -> Tuple[int, bytes]:
    if params:
        qs = urllib.parse.urlencode({k: str(v) for k, v in params.items()})
        url = f"{url}{'&' if '?' in url else '?'}{qs}"
    req = urllib.request.Request(
        url, data=body, headers=headers or {}, method=method.upper()
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout or 30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def fetch_with_retry(url: str, headers: Optional[Dict[str, str]] = None) -> bytes:
    """GET with the reference's retry policy: 3 retries, backoff 2^(n+1)s
    on transient statuses (kept for the legacy/simple path)."""
    for attempt in range(MAX_RETRIES + 1):
        status, data = _http("GET", url, headers=headers)
        if status < 400:
            return data
        if status not in RETRY_STATUSES or attempt == MAX_RETRIES:
            raise RestRequestError(f"HTTP {status} for {url}: {data[:200]!r}")
        time.sleep(2 ** (attempt + 1))
    raise RestRequestError(f"retries exhausted for {url}")


# ---------------------------------------------------------------------------
# auth (reference server.py:23-211)
# ---------------------------------------------------------------------------
class _Auth:
    def apply(self, headers: Dict[str, str]) -> None:  # pragma: no cover
        pass

    def on_unauthorized(self) -> bool:
        """Return True if the request should be retried (token refreshed)."""
        return False


class HeaderAuth(_Auth):
    def __init__(self, values: Dict[str, str]):
        self.values = dict(values or {})

    def apply(self, headers: Dict[str, str]) -> None:
        headers.update(self.values)


class BearerAuth(_Auth):
    def __init__(self, values: Dict[str, str]):
        self.token = (values or {}).get("token")

    def apply(self, headers: Dict[str, str]) -> None:
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"


class BasicAuth(_Auth):
    def __init__(self, values: Dict[str, str]):
        user = (values or {}).get("username", "")
        pwd = (values or {}).get("password", "")
        self.header = "Basic " + base64.b64encode(f"{user}:{pwd}".encode()).decode()

    def apply(self, headers: Dict[str, str]) -> None:
        headers["Authorization"] = self.header


class OAuth2Auth(_Auth):
    """OAuth2 token management (reference server.py:58-211).

    The provider dict mirrors the reference's OAuth2Provider/OAuth2Config:
    ``{name, config: {access_token_url, client_id, client_secret,
    grant_type, subject_token_type, requested_token_type, subject_token,
    extra_params}, access_token, refresh_token, subject_token}``.

    Flow selection matches the reference: a refresh_token triggers the
    standard refresh grant; otherwise the configured grant (defaulting
    to RFC 8693 token exchange, or ``client_credentials`` if set) runs.
    Token-endpoint calls retry transient statuses 3x with exponential
    backoff. A 401 on a data request invalidates the token and retries
    once after a refresh.
    """

    def __init__(self, provider: Dict[str, Any], oauth_header: Optional[str] = None):
        if not isinstance(provider, dict):
            raise ValueError(
                "rest auth: `provider` must be an inline provider mapping "
                "(keyring lookup by name needs a ConnectionConfiguration "
                "oauth_keyring)"
            )
        self.provider = provider
        self.header = oauth_header

    @property
    def config(self) -> Dict[str, Any]:
        return self.provider.get("config") or {}

    def apply(self, headers: Dict[str, str]) -> None:
        if not self.provider.get("access_token"):
            self._refresh_and_update()
        token = self.provider.get("access_token")
        if not token:
            return
        if self.header:
            headers[self.header] = token
        else:
            headers["Authorization"] = f"Bearer {token}"

    def on_unauthorized(self) -> bool:
        self.provider["access_token"] = None
        self._refresh_and_update()
        return bool(self.provider.get("access_token"))

    def _refresh_and_update(self) -> None:
        data = self._fetch_new_tokens()
        self.provider["access_token"] = data["access_token"]
        if "refresh_token" in data:
            self.provider["refresh_token"] = data["refresh_token"]
        cb = self.provider.get("on_token_refresh")
        if callable(cb):
            cb(self.provider.get("name"), data)

    def _fetch_new_tokens(self) -> Dict[str, Any]:
        conf = self.config
        if self.provider.get("refresh_token"):
            payload = {
                "grant_type": "refresh_token",
                "refresh_token": self.provider["refresh_token"],
                "client_id": conf.get("client_id"),
                "client_secret": conf.get("client_secret"),
            }
        else:
            grant = conf.get("grant_type", "client_credentials")
            payload = {
                "grant_type": grant,
                "client_id": conf.get("client_id"),
                "client_secret": conf.get("client_secret"),
            }
            if grant == "urn:ietf:params:oauth:grant-type:token-exchange":
                payload.update(
                    {
                        "subject_token": self.provider.get("subject_token")
                        or conf.get("subject_token"),
                        "subject_token_type": conf.get(
                            "subject_token_type",
                            "urn:ietf:params:oauth:token-type:id_token",
                        ),
                        "requested_token_type": conf.get(
                            "requested_token_type",
                            "urn:ietf:params:oauth:token-type:access_token",
                        ),
                    }
                )
        payload.update(conf.get("extra_params") or {})
        body = urllib.parse.urlencode(
            {k: v for k, v in payload.items() if v is not None}
        ).encode()
        headers = {
            "Accept": "application/json",
            "Content-Type": "application/x-www-form-urlencoded",
        }
        last: Any = None
        for attempt in range(MAX_RETRIES):
            status, data = _http(
                "POST", conf["access_token_url"], headers=headers, body=body, timeout=10
            )
            if status in RETRY_STATUSES and attempt < MAX_RETRIES - 1:
                time.sleep(2 ** (attempt + 1))
                continue
            if status >= 400:
                self.provider["access_token"] = None  # kill switch
                try:
                    err = json.loads(data)
                except Exception:
                    err = {"error": "non_json_response", "body": data[:200].decode("utf8", "replace")}
                cb = self.provider.get("on_refresh_fail")
                if callable(cb):
                    cb(self.provider.get("name"), {**err, "status_code": status})
                raise RestRequestError(f"token refresh failed ({status}): {err}")
            last = json.loads(data)
            return last
        raise RestRequestError("token refresh retries exhausted")


def build_auth(auth_spec: Optional[Dict[str, Any]]) -> _Auth:
    if not auth_spec:
        return _Auth()
    method = str(auth_spec.get("method", "")).lower()
    values = auth_spec.get("values") or {}
    if method in ("oauth2", "oauth"):
        return OAuth2Auth(auth_spec.get("provider"), auth_spec.get("oauth_header"))
    if method == "basic":
        return BasicAuth(values)
    if method == "bearer":
        return BearerAuth(values)
    if method == "header":
        return HeaderAuth(values)
    raise ValueError(f"rest auth: unsupported method {method!r}")


# ---------------------------------------------------------------------------
# client (reference server.py:224-479)
# ---------------------------------------------------------------------------
class RestClient:
    def __init__(self, client_spec: Dict[str, Any]):
        self.base_url = client_spec.get("base_url", "")
        self.timeout = client_spec.get("timeout") or 30
        self.auth = build_auth(client_spec.get("auth"))

    def url_for(self, endpoint: str) -> str:
        if endpoint.startswith("http"):
            return endpoint
        return urllib.parse.urljoin(self.base_url.rstrip("/") + "/", endpoint.lstrip("/"))

    def fetch(self, request: Dict[str, Any]) -> Tuple[int, bytes]:
        """One request with the reference's retry ladder: transport/5xx/429
        retried with backoff, 4xx raised, custom error conditions checked
        by the caller (which owns the parsed payload)."""
        method = str(request.get("method", "get")).upper()
        content_type = request.get("content_type", "application/json")
        url = self.url_for(request.get("endpoint", ""))
        headers = {"content-type": content_type}
        for k, v in (request.get("headers") or {}).items():
            headers[k] = v
        self.auth.apply(headers)
        body = None
        if method != "GET" and request.get("body") is not None:
            payload = request["body"]
            if "form" in content_type or "urlencoded" in content_type:
                body = urllib.parse.urlencode(payload).encode()
            elif isinstance(payload, (dict, list)):
                body = json.dumps(payload).encode()
            else:
                body = str(payload).encode()
        max_retries = int(request.get("max_retries", MAX_RETRIES))
        backoff = float(request.get("initial_backoff", 0.5))
        unauthorized_retried = False
        attempt = 0
        while True:
            status, data = _http(
                method,
                url,
                params=request.get("query") or {},
                headers=headers,
                body=body,
                timeout=self.timeout,
            )
            if status == 401 and not unauthorized_retried:
                unauthorized_retried = True
                if self.auth.on_unauthorized():
                    headers = {k: v for k, v in headers.items() if k.lower() != "authorization"}
                    self.auth.apply(headers)
                    continue
            if status in RETRY_STATUSES and attempt < max_retries:
                time.sleep(backoff * (2**attempt))
                attempt += 1
                continue
            if status >= 400:
                detail = data[:300].decode("utf8", "replace")
                raise RestRequestError(f"HTTP {status} for {url}: {detail}")
            eh = request.get("errorhandler") or {}
            if eh.get("condition"):
                import jmespath

                payload = json.loads(data)
                if jmespath.search(eh["condition"], payload):
                    msg = (
                        jmespath.search(eh["message"], payload)
                        if eh.get("message")
                        else payload
                    )
                    raise RestRequestError(f"error condition in {url}: {msg}")
            if (request.get("errorhandler") or {}).get("error_status_codes"):
                if status in request["errorhandler"]["error_status_codes"]:
                    raise RestRequestError(f"HTTP {status} flagged as error for {url}")
            return status, data


# ---------------------------------------------------------------------------
# response payload decoding (reference common.py:123-147)
# ---------------------------------------------------------------------------
def decode_payload(raw: bytes, content_type: str, locator: Optional[str]) -> List[Dict[str, Any]]:
    """Decode a response body into a list of records. ``locator`` is a
    JMESPath applied to JSON payloads; a null/missing result is an empty
    page (NOT ``[None]`` — pagination must terminate cleanly)."""
    ct = (content_type or "json").lower()
    if ct in ("json", "jsonl", "application/json"):
        if ct == "jsonl":
            records: Any = [json.loads(line) for line in raw.decode().splitlines() if line.strip()]
        else:
            records = json.loads(raw) if raw else []
        if locator:
            import jmespath

            records = jmespath.search(locator, records)
        records = records if records is not None else []
        return records if isinstance(records, list) else [records]
    if ct in ("csv", "text/csv"):
        import pandas as pd

        pdf = pd.read_csv(io.BytesIO(raw))
        return pdf.to_dict(orient="records")
    if ct == "parquet":
        import pyarrow.parquet as pq

        return pq.read_table(io.BytesIO(raw)).to_pylist()
    raise ValueError(f"rest: unsupported response content_type {content_type!r}")


# ---------------------------------------------------------------------------
# connector
# ---------------------------------------------------------------------------
class RestConnection:
    def __init__(self, engine: SparkEngine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables

    # -- legacy/simple GET+JSON pagination path ---------------------------
    def _pages(self) -> Iterable[List[Dict[str, Any]]]:
        url = self.spec["locator"]
        opts = self.spec.get("options", {})
        headers = opts.get("headers", {})
        page_param = opts.get("page_param")
        max_pages = int(opts.get("max_pages", 1000))
        records_path = opts.get("records_path")
        page = 0
        while page < max_pages:
            page_url = f"{url}{'&' if '?' in url else '?'}{page_param}={page}" if page_param else url
            raw = fetch_with_retry(page_url, headers)
            records = decode_payload(raw, "json", records_path)
            if not records:
                return
            yield records
            if not page_param:
                return
            page += 1

    # -- reference-shaped request path ------------------------------------
    def _request_batches(self) -> Iterable[List[Dict[str, Any]]]:
        client = RestClient(self.spec.get("client") or {})
        request = dict(self.spec.get("request") or {})
        response = request.get("response") or {}
        handler = response.get("handler") or {}
        kind = str(handler.get("kind", "Basic")).lower()
        content_type = response.get("content_type", "json")
        locator = response.get("locator")
        max_polls = int(handler.get("max_polls", 100))

        if kind in ("basic", ""):
            _, raw = client.fetch(request)
            yield decode_payload(raw, content_type, locator)

        elif kind in ("pagination", "paginator"):
            page_param = handler["page_param"]
            page_size = int(handler["page_size"])
            increment = int(handler.get("increment", 1))
            in_body = str(handler.get("param_locator", "query")).lower() == "body"
            total_path = handler.get("total_records")
            throttle = handler.get("throttle")
            # bound like the legacy path's max_pages=1000: an API that
            # over-reports total_records or keeps returning empty pages
            # must not loop forever
            max_pages = int(handler.get("max_pages", 1000))
            received = 0
            req = json.loads(json.dumps(request))  # deep copy
            for _ in range(max_pages):
                _, raw = client.fetch(req)
                records = decode_payload(raw, content_type, locator)
                received += len(records)
                yield records
                has_next = True
                if total_path:
                    import jmespath

                    total = int(jmespath.search(total_path, json.loads(raw)) or 0)
                    has_next = received < total and len(records) > 0
                elif len(records) < page_size:
                    has_next = False
                if not has_next:
                    return
                slot = req.setdefault("body" if in_body else "query", {})
                slot[page_param] = int(slot.get(page_param, 0)) + increment
                if throttle:
                    time.sleep(float(throttle))

        elif kind == "urlpolling":
            # poll the endpooint until ready_status; then stream the URL
            # found at response.locator and parse it by content_type
            import jmespath

            wait = 0.0
            for _ in range(max_polls):
                _, raw = client.fetch(request)
                data = json.loads(raw)
                ready = True
                if handler.get("ready_status"):
                    ready = bool(jmespath.search(handler["ready_status"], data))
                if ready:
                    url = jmespath.search(locator, data) if locator else None
                    if url:
                        _, raw2 = client.fetch({"endpoint": url, "method": "get"})
                        yield decode_payload(raw2, content_type, None)
                    return
                wait = wait * 1.5 if wait else 1
                time.sleep(min(wait, 30))
            raise RestRequestError("url polling exceeded max_polls")

        elif kind == "statepolling":
            import jmespath

            wait = 0.0
            for _ in range(max_polls):
                _, raw = client.fetch(request)
                data = json.loads(raw)
                if bool(jmespath.search(handler["ready_status"], data)):
                    payload = jmespath.search(locator, data) if locator else data
                    payload = payload if payload is not None else []
                    yield payload if isinstance(payload, list) else [payload]
                    return
                wait = wait * 1.5 if wait else 1
                time.sleep(min(wait, 30))
            raise RestRequestError("state polling exceeded max_polls")

        else:
            raise ValueError(f"rest: unknown response handler kind {kind!r}")

    def _batches(self) -> Iterable[List[Dict[str, Any]]]:
        if self.spec.get("request") or self.spec.get("client"):
            return self._request_batches()
        return self._pages()

    def tap(self, query: Optional[str], stage: Stage) -> DataFrame:
        schema = fields_to_schema(self.spec.get("fields"))
        df: Optional[DataFrame] = None
        for records in self._batches():
            if not records:
                continue
            batch = self.engine.spark.createDataFrame(records, schema=schema)
            df = batch if df is None else df.unionByName(batch, allowMissingColumns=True)
        if df is None:
            if schema is None:
                raise ValueError("REST source returned no rows and no explicit fields are set")
            df = self.engine.spark.createDataFrame([], schema=schema)
        if query:
            from ..sqlfront.rewrite import rewrite_table_placeholders

            view = f"__rest_{hashlib.md5(stage.name.encode()).hexdigest()[:8]}"
            df.createOrReplaceTempView(view)
            df = self.engine.sql(rewrite_table_placeholders(query, (stage.name,), view))
        return df

    def sink(self, df: DataFrame, stage: Stage) -> None:
        """Reference Rest.sink fires the configured request (rest.py:329-330)
        — the body is typically templated from variables/stage results by
        the flow's renderer before it reaches the connector."""
        if not (self.spec.get("request") or self.spec.get("client")):
            raise NotImplementedError("REST sink needs a reference-shaped `request`")
        for _ in self._request_batches():
            pass

    def execute(self, query: str, stage: Stage) -> None:
        raise NotImplementedError("REST connection does not support sql stages")
