"""LLM text-to-SQL connection (reference surface: ankaflow/connections/
llm/sqlgen.py + llm/protocols.py — protocol/client split, structured
{query, message} responses, JSON extraction, error-replay loop, and the
variables side-channel; behavior studied, fresh implementation).

Architecture mirrors the reference:

* **Protocol** — formats a prompt (+ replay extras) into a request dict
  and parses the raw response into ``LLMResponse{query, message}``:
  ``MockProtocol`` (echo shape for tests/offline) and
  ``OpenAIProtocol`` (chat-completions shape; the model's content is a
  JSON object extracted by :func:`parse_model_response`).
* **Client** — transports the formatted request: ``MockClient`` (served
  from scripted responses), ``HTTPClient`` (POST to an OpenAI-compatible
  endpoint; urllib — no client libraries exist in this container), and
  ``ProxyClient`` (POST the formatted request to a gateway that relays
  to the provider — reference ProxyClient).
* **Replay loop** — a recoverable SQL error (Spark analysis/parse) is
  fed back as extras {query, error, message} and re-fetched, up to 3
  retries; the reference's variable side-channel is kept:
  ``<name>_user`` (message to user), ``<name>_success`` (True on
  success), ``<name>_fail`` (truncated error on give-up).

Legacy surface (r1) is preserved: a plain callable ``(prompt) -> sql``
injected via ``options.backend_variable`` still works.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql.utils import AnalysisException, ParseException

from ..models.core import Stage
from ..session import SparkEngine

Backend = Callable[[str], str]

MAX_ATTEMPTS = 3
REPLAYABLE_SQL_ERRORS = (AnalysisException, ParseException)

REPLAY_PROMPT = """{prompt}

Previous query failed.

## Previous SQL Query:
{sql}

## SQL Execution Error:
{error}

Review and regenerate the SQL query based on this feedback. Keep the
original intent, correct the issues, and do not include explanations —
only the SQL."""


class SQLGenError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# response parsing (reference protocols.py:17-54)
# ---------------------------------------------------------------------------
def parse_model_response(content: str) -> Dict[str, Any]:
    """Extract a JSON object from a model response: direct JSON, a
    ```json fenced block, or the first inline {...} object."""
    content = content.strip()
    if content.startswith("{"):
        try:
            return json.loads(content)
        except json.JSONDecodeError:
            pass
    m = re.search(r"```json\s*(\{.*?\})\s*```", content, re.DOTALL)
    if m:
        try:
            return json.loads(m.group(1))
        except json.JSONDecodeError:
            raise SQLGenError("Malformed JSON inside ```json``` block.")
    m = re.search(r"(\{.*?\})", content, re.DOTALL)
    if m:
        try:
            return json.loads(m.group(1))
        except json.JSONDecodeError:
            raise SQLGenError("Malformed inline JSON object.")
    raise SQLGenError("No valid JSON object found in model response.")


class LLMResponse:
    """The structured output of a protocol call (reference LLMResponse)."""

    def __init__(self, query: Optional[str], message: Optional[str] = None):
        self.query = query
        self.message = message


# ---------------------------------------------------------------------------
# protocols (format request / parse response)
# ---------------------------------------------------------------------------
class MockProtocol:
    kind = "mock"

    def __init__(self, model: str = "mock-model", temperature: float = 0.0):
        self.model = model
        self.temperature = temperature

    def format(self, prompt: str, extras: Optional[dict] = None) -> dict:
        return {"model": self.model, "prompt": prompt, "extras": extras or {}}

    def parse(self, response: dict) -> LLMResponse:
        return LLMResponse(response.get("query"), response.get("message"))


class OpenAIProtocol:
    kind = "openai"

    def __init__(self, model: str = "gpt-4", temperature: float = 0.0):
        self.model = model
        self.temperature = temperature

    def format(self, prompt: str, extras: Optional[dict] = None) -> dict:
        messages = [{"role": "system", "content": prompt}]
        if extras:
            messages.append({"role": "user", "content": "\n".join(str(v) for v in extras.values())})
        return {"model": self.model, "temperature": self.temperature, "messages": messages}

    def parse(self, response: dict) -> LLMResponse:
        content = response["choices"][0]["message"]["content"]
        parsed = parse_model_response(content)
        return LLMResponse(parsed.get("query"), parsed.get("message"))


def make_protocol(cfg: Dict[str, Any]):
    kind = str(cfg.get("kind", "mock")).lower()
    if kind == "openai":
        return OpenAIProtocol(cfg.get("model", "gpt-4"), cfg.get("temperature", 0.0))
    if kind == "mock":
        return MockProtocol()
    raise SQLGenError(f"Unsupported backend kind: {kind}")


# ---------------------------------------------------------------------------
# clients (transport)
# ---------------------------------------------------------------------------
class MockClient:
    """Serves scripted response dicts in order (repeats the last)."""

    def __init__(self, protocol, responses: List[dict]):
        self.protocol = protocol
        self.responses = list(responses)
        self.calls: List[dict] = []

    def fetch(self, prompt: str, extras: Optional[dict] = None) -> dict:
        self.calls.append(self.protocol.format(prompt, extras))
        idx = min(len(self.calls) - 1, len(self.responses) - 1)
        return self.responses[idx]


class HTTPClient:
    """POSTs the protocol-formatted request to an OpenAI-compatible (or
    proxy/gateway) endpoint; expects the provider's raw JSON back."""

    def __init__(self, protocol, endpoint: str, headers: Optional[Dict[str, str]] = None):
        self.protocol = protocol
        self.endpoint = endpoint
        self.headers = {"Content-Type": "application/json", **(headers or {})}

    def fetch(self, prompt: str, extras: Optional[dict] = None) -> dict:
        import urllib.request

        body = json.dumps(self.protocol.format(prompt, extras)).encode()
        req = urllib.request.Request(self.endpoint, data=body, headers=self.headers)
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())


ProxyClient = HTTPClient  # the reference ProxyClient has the same transport shape


def strip_fences(sql: str) -> str:
    """LLMs wrap SQL in markdown fences; strip them defensively."""
    s = sql.strip()
    if s.startswith("```"):
        s = s.split("\n", 1)[-1]
        if s.rstrip().endswith("```"):
            s = s.rstrip()[:-3]
    return s.strip().rstrip(";")


# ---------------------------------------------------------------------------
# legacy callable-backend loop (r1 surface, kept)
# ---------------------------------------------------------------------------
class StaticBackend:
    """Scripted plain-text responses: returns each entry once, repeats
    the last (legacy callable-backend shape)."""

    def __init__(self, responses: List[str]):
        self.responses = list(responses)
        self.calls: List[str] = []

    def __call__(self, prompt: str) -> str:
        self.calls.append(prompt)
        idx = min(len(self.calls) - 1, len(self.responses) - 1)
        return self.responses[idx]


class HTTPBackend:
    """Legacy simple gateway: POST {"prompt": ...} -> {"sql": ...}."""

    def __init__(self, endpoint: str, headers: Optional[Dict[str, str]] = None):
        self.endpoint = endpoint
        self.headers = {"Content-Type": "application/json", **(headers or {})}

    def __call__(self, prompt: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps({"prompt": prompt}).encode(),
            headers=self.headers,
        )
        with urllib.request.urlopen(req) as resp:
            payload = json.loads(resp.read())
        sql = payload.get("sql")
        if not sql:
            raise SQLGenError(f"backend returned no sql: {payload}")
        return sql


def generate_sql(
    engine: SparkEngine,
    prompt: str,
    backend: Backend,
    max_attempts: int = MAX_ATTEMPTS,
) -> DataFrame:
    """Prompt -> SQL -> execute; replay recoverable SQL errors back to
    the backend with full context. Returns the successful DataFrame."""
    attempt_prompt = prompt
    last_error: Optional[Exception] = None
    for _ in range(max_attempts):
        sql = strip_fences(backend(attempt_prompt))
        try:
            return engine.sql(sql)
        except REPLAYABLE_SQL_ERRORS as e:
            last_error = e
            attempt_prompt = REPLAY_PROMPT.format(
                prompt=prompt, sql=sql, error=str(e).splitlines()[0]
            )
    raise SQLGenError(
        f"SQL generation failed after {max_attempts} attempts: {last_error}"
    )


class SQLGenConnection:
    """Connection kind ``sqlgen``: the stage query is the natural-language
    prompt (additionally Jinja-rendered with ``connection.variables``,
    reference sqlgen.py:_render_prompt). Backend selection:

    * ``options.backend_variable`` — a plain callable (legacy surface);
    * ``options.llm`` — reference-shaped config
      ``{kind: mock|openai, model, temperature, endpoint|proxy,
      responses}`` using the protocol/client machinery.
    """

    def __init__(self, engine: SparkEngine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables
        self.last_response: Optional[LLMResponse] = None

    # -- legacy path -------------------------------------------------------
    def _backend(self) -> Optional[Backend]:
        opts = self.spec.get("options") or {}
        injected = opts.get("backend_variable")
        if injected:
            backend = self.variables.get(injected)
            if backend is None:
                raise SQLGenError(f"backend variable '{injected}' is not set")
            return backend
        return None

    # -- protocol path -----------------------------------------------------
    def _client(self):
        opts = self.spec.get("options") or {}
        cfg = opts.get("llm")
        if cfg is None:
            endpoint = opts.get("endpoint") or self.spec.get("locator")
            if not endpoint:
                raise SQLGenError(
                    "sqlgen needs options.llm, options.endpoint or a backend_variable"
                )
            cfg = {"kind": "openai", "endpoint": endpoint}
        protocol = make_protocol(cfg)
        responses = cfg.get("responses")
        if responses is not None:
            return MockClient(protocol, responses)
        injected = cfg.get("client_variable")
        if injected:
            client = self.variables.get(injected)
            if client is None:
                raise SQLGenError(f"client variable '{injected}' is not set")
            return client
        endpoint = cfg.get("endpoint") or cfg.get("proxy") or self.spec.get("locator")
        if not endpoint:
            raise SQLGenError("sqlgen llm config needs endpoint/proxy/responses")
        return HTTPClient(protocol, endpoint, cfg.get("headers"))

    def _render_prompt(self, template: str) -> str:
        """Jinja render with connection-level variables (reference
        sqlgen.py:_render_prompt uses standard {{ }} delimiters)."""
        conn_vars = self.spec.get("variables")
        if not conn_vars:
            return template
        import jinja2

        env = jinja2.Environment(loader=jinja2.BaseLoader())
        return env.from_string(template).render(**conn_vars)

    def tap(self, query: Optional[str], stage: Stage) -> DataFrame:
        if not query:
            raise SQLGenError("sqlgen stage needs a prompt in `query`")
        prompt = self._render_prompt(query)
        legacy = self._backend()
        if legacy is not None:
            return generate_sql(self.engine, prompt, legacy)
        client = self._client()
        name = stage.name if stage is not None else "sqlgen"
        retries_left = MAX_ATTEMPTS
        extras: Optional[dict] = None
        last_error: Optional[Exception] = None
        while retries_left >= 0:
            raw = client.fetch(prompt, extras)
            response = client.protocol.parse(raw)
            self.last_response = response
            self.variables[f"{name}_user"] = response.message
            if not response.query:
                raise SQLGenError("No SQL query returned by model")
            try:
                df = self.engine.sql(strip_fences(response.query))
                self.variables[f"{name}_success"] = True
                return df
            except REPLAYABLE_SQL_ERRORS as e:
                last_error = e
                retries_left -= 1
                extras = {
                    "1": "Previous query failed.",
                    "3": "## Previous SQL Query:",
                    "query": response.query or "<null>",
                    "5": "## SQL Execution Error:",
                    "error": str(e).splitlines()[0],
                    "7": "## Previous message to User (if any):",
                    "message": response.message or "<none>",
                    "9": (
                        "Review and regenerate the SQL query based on this "
                        "feedback. Keep the original intent, correct the "
                        "issues, and do not include explanations — only "
                        "update the SQL."
                    ),
                }
        self.variables[f"{name}_fail"] = str(last_error).replace("'", "''")[:500]
        raise SQLGenError(f"Retry limit reached: {last_error}")

    def sink(self, df: DataFrame, stage: Stage) -> None:
        raise NotImplementedError("sqlgen is a source-only connection")

    def execute(self, query: str, stage: Stage) -> None:
        raise NotImplementedError("sqlgen does not support sql stages")
