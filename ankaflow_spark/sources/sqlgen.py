"""LLM text-to-SQL connection (reference surface:
ankaflow/connections/llm/sqlgen.py — prompt -> SQL -> execute, with an
error-replay loop that re-prompts on recoverable SQL errors; behavior
studied, fresh implementation).

The backend is a pluggable protocol: any callable
``(prompt: str) -> str`` returning SQL. No LLM client libraries exist in
this container, so the shipped backends are:

* ``StaticBackend`` — fixed/scripted responses (tests, replay files);
* ``HTTPBackend`` — POSTs ``{"prompt": ...}`` to a configured endpoint
  and expects ``{"sql": ...}`` (the self-hosted-gateway shape), built on
  urllib with the engine's retry policy.

Replayable errors are Spark's analysis/parse exceptions — the loop
re-prompts with the failed SQL + error message appended, up to
``max_attempts`` (default 3), mirroring the reference's contract.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql.utils import AnalysisException, ParseException

from ..models.core import Stage
from ..session import SparkEngine

Backend = Callable[[str], str]

MAX_ATTEMPTS = 3

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


class StaticBackend:
    """Scripted responses: returns each entry once, repeats the last."""

    def __init__(self, responses: List[str]):
        self.responses = list(responses)
        self.calls: List[str] = []

    def __call__(self, prompt: str) -> str:
        self.calls.append(prompt)
        idx = min(len(self.calls) - 1, len(self.responses) - 1)
        return self.responses[idx]


class HTTPBackend:
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


def strip_fences(sql: str) -> str:
    """LLMs wrap SQL in markdown fences; strip them defensively."""
    s = sql.strip()
    if s.startswith("```"):
        s = s.split("\n", 1)[-1]
        if s.rstrip().endswith("```"):
            s = s.rstrip()[: -3]
    return s.strip().rstrip(";")


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
        except (AnalysisException, ParseException) as e:
            last_error = e
            attempt_prompt = REPLAY_PROMPT.format(
                prompt=prompt, sql=sql, error=str(e).splitlines()[0]
            )
    raise SQLGenError(
        f"SQL generation failed after {max_attempts} attempts: {last_error}"
    )


class SQLGenConnection:
    """Connection kind ``sqlgen``: the stage query is the natural-language
    prompt; options carry backend config or a pre-bound backend object
    (injected via variables for tests)."""

    def __init__(self, engine: SparkEngine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables

    def _backend(self) -> Backend:
        opts = self.spec.get("options") or {}
        injected = opts.get("backend_variable")
        if injected:
            backend = self.variables.get(injected)
            if backend is None:
                raise SQLGenError(f"backend variable '{injected}' is not set")
            return backend
        endpoint = opts.get("endpoint") or self.spec.get("locator")
        if not endpoint:
            raise SQLGenError("sqlgen needs options.endpoint or a backend_variable")
        return HTTPBackend(endpoint, opts.get("headers"))

    def tap(self, query: Optional[str], stage: Stage) -> DataFrame:
        if not query:
            raise SQLGenError("sqlgen stage needs a prompt in `query`")
        return generate_sql(self.engine, query, self._backend())

    def sink(self, df: DataFrame, stage: Stage) -> None:
        raise NotImplementedError("sqlgen is a source-only connection")

    def execute(self, query: str, stage: Stage) -> None:
        raise NotImplementedError("sqlgen does not support sql stages")
