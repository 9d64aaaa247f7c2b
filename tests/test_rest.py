"""REST connector against a live local HTTP server (model: reference
tests/support/rest_server.py — pagination, retry on 429, empty source)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ankaflow_spark.models.core import Stages
from ankaflow_spark.plans.flow import Flow

PAGES = [
    [{"id": 1, "value": "a"}, {"id": 2, "value": "b"}],
    [{"id": 3, "value": "c"}, {"id": 4, "value": "d"}],
    [{"id": 5, "value": "e"}],
    [],
]


class Handler(BaseHTTPRequestHandler):
    flaky_hits = {"count": 0}

    def log_message(self, *args):
        pass

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        parsed = urlparse(self.path)
        qs = parse_qs(parsed.query)
        if parsed.path == "/pages":
            page = int(qs.get("page", ["0"])[0])
            body = PAGES[page] if page < len(PAGES) else []
            self._json(body)
        elif parsed.path == "/flaky":
            self.flaky_hits["count"] += 1
            if self.flaky_hits["count"] < 3:
                self.send_response(429)
                self.end_headers()
            else:
                self._json([{"ok": 1}])
        elif parsed.path == "/wrapped":
            self._json({"data": {"records": PAGES[0]}, "meta": {"n": 2}})
        else:
            self.send_response(404)
            self.end_headers()

    def _json(self, obj):
        payload = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_rest_pagination(engine, server):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: paged
  connection:
    kind: rest
    locator: {server}/pages
    options: {{page_param: page}}
"""),
        engine=engine,
    )
    df = flow.run()
    assert df.count() == 5
    assert {r["id"] for r in df.collect()} == {1, 2, 3, 4, 5}


def test_rest_retry_on_429(engine, server, monkeypatch):
    import ankaflow_spark.sources.rest as rest_mod

    monkeypatch.setattr(rest_mod.time, "sleep", lambda s: None)  # fast backoff
    Handler.flaky_hits["count"] = 0
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: flaky
  connection:
    kind: rest
    locator: {server}/flaky
"""),
        engine=engine,
    )
    df = flow.run()
    assert df.collect()[0]["ok"] == 1
    assert Handler.flaky_hits["count"] == 3  # two 429s then success


def test_rest_records_path(engine, server):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: wrapped
  connection:
    kind: rest
    locator: {server}/wrapped
    options: {{records_path: data.records}}
"""),
        engine=engine,
    )
    assert flow.run().count() == 2


def test_rest_empty_with_fields(engine, server):
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: empty
  connection:
    kind: rest
    locator: {server}/pages?page=3
    fields:
    - {{name: id, type: BIGINT}}
    - {{name: value, type: VARCHAR}}
"""),
        engine=engine,
    )
    df = flow.run()
    assert df.count() == 0
    assert dict(df.dtypes) == {"id": "bigint", "value": "string"}
