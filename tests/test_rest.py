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
    # oauth2 state: tokens issued so far; current valid token; poll counts
    state = {
        "tokens": [],
        "token_calls": [],
        "job_polls": 0,
        "export_polls": 0,
        "post_bodies": [],
    }

    def log_message(self, *args):
        pass

    # -- helpers -----------------------------------------------------------
    def _json(self, obj, status=200):
        payload = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _raw(self, payload: bytes, ctype: str, status=200):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _body(self):
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _authorized(self):
        tok = (self.headers.get("Authorization") or "").removeprefix("Bearer ")
        return self.state["tokens"] and tok == self.state["tokens"][-1]

    # -- GET ---------------------------------------------------------------
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
        elif parsed.path == "/nomatch":
            self._json({"data": {}})  # records_path matches nothing
        elif parsed.path == "/protected":
            if not self._authorized():
                self._json({"error": "unauthorized"}, status=401)
            else:
                self._json([{"secret": 42}])
        elif parsed.path == "/job":
            self.state["job_polls"] += 1
            done = self.state["job_polls"] >= 3
            body = {"status": {"done": done}}
            if done:
                body["result"] = {"rows": PAGES[0]}
            self._json(body)
        elif parsed.path == "/export":
            self.state["export_polls"] += 1
            ready = self.state["export_polls"] >= 2
            self._json(
                {"ready": ready, "url": f"/download.csv" if ready else None}
            )
        elif parsed.path == "/download.csv":
            self._raw(b"id,value\n10,x\n11,y\n", "text/csv")
        elif parsed.path == "/overreport":
            # lies: claims 100 total records but only page 0 has any
            self.state["overreport_hits"] = self.state.get("overreport_hits", 0) + 1
            page = int(qs.get("page", ["0"])[0])
            self._json({"total": 100, "rows": PAGES[0] if page == 0 else []})
        else:
            self.send_response(404)
            self.end_headers()

    # -- POST --------------------------------------------------------------
    def do_POST(self):
        from urllib.parse import parse_qs, urlparse

        parsed = urlparse(self.path)
        raw = self._body()
        if parsed.path == "/token":
            form = parse_qs(raw.decode())
            self.state["token_calls"].append(form)
            tok = f"tok{len(self.state['tokens'])}"
            self.state["tokens"].append(tok)
            self._json({"access_token": tok, "refresh_token": f"r-{tok}"})
        elif parsed.path == "/search":
            body = json.loads(raw)
            self.state["post_bodies"].append(body)
            page = int(body.get("page", 1))
            self._json({"hits": PAGES[page - 1] if page - 1 < len(PAGES) else []})
        else:
            self.send_response(404)
            self.end_headers()


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


def test_rest_records_path_no_match_is_empty(engine, server):
    """A records_path that matches nothing terminates as an empty page
    (not a [None] crash)."""
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: nomatch
  connection:
    kind: rest
    locator: {server}/nomatch
    options: {{records_path: data.records}}
    fields:
    - {{name: id, type: BIGINT}}
"""),
        engine=engine,
    )
    assert flow.run().count() == 0


def test_rest_oauth2_client_credentials_and_refresh(engine, server):
    """First request fetches a token (client-credentials); after the
    server rotates tokens a 401 triggers one refresh + retry."""
    Handler.state["tokens"] = []
    Handler.state["token_calls"] = []
    spec = f"""
- kind: tap
  name: protected
  connection:
    kind: rest
    client:
      base_url: {server}
      auth:
        method: oauth2
        provider:
          name: test
          config:
            access_token_url: {server}/token
            client_id: cid
            client_secret: secret
            grant_type: client_credentials
    request:
      endpoint: /protected
      method: get
      response:
        content_type: json
"""
    df = Flow(Stages.loads(spec), engine=engine).run()
    assert df.collect()[0]["secret"] == 42
    assert Handler.state["token_calls"][0]["grant_type"] == ["client_credentials"]

    # a provider holding a stale access token + refresh token: the 401
    # triggers exactly one refresh (refresh_token grant) and a retry
    stale_spec = spec.replace("name: protected", "name: protected2").replace(
        "            grant_type: client_credentials\n",
        "            grant_type: client_credentials\n"
        "          access_token: stale-token\n"
        "          refresh_token: r-tok0\n",
    )
    df = Flow(Stages.loads(stale_spec), engine=engine).run()
    assert df.collect()[0]["secret"] == 42
    assert any(c.get("grant_type") == ["refresh_token"] for c in Handler.state["token_calls"])


def test_rest_post_body_pagination(engine, server):
    Handler.state["post_bodies"] = []
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: search
  connection:
    kind: rest
    client: {{base_url: {server}}}
    request:
      endpoint: /search
      method: post
      body: {{q: spark, page: 1}}
      response:
        content_type: json
        locator: hits
        handler:
          kind: Pagination
          page_param: page
          page_size: 2
          param_locator: body
          increment: 1
"""),
        engine=engine,
    )
    df = flow.run()
    assert {r["id"] for r in df.collect()} == {1, 2, 3, 4, 5}
    # three POSTs: page 1 (2 rows), page 2 (2 rows), page 3 (1 row < page_size)
    assert [b["page"] for b in Handler.state["post_bodies"]] == [1, 2, 3]
    assert all(b["q"] == "spark" for b in Handler.state["post_bodies"])


def test_rest_state_polling(engine, server, monkeypatch):
    import ankaflow_spark.sources.rest as rest_mod

    monkeypatch.setattr(rest_mod.time, "sleep", lambda s: None)
    Handler.state["job_polls"] = 0
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: job
  connection:
    kind: rest
    client: {{base_url: {server}}}
    request:
      endpoint: /job
      method: get
      response:
        content_type: json
        locator: result.rows
        handler: {{kind: StatePolling, ready_status: status.done}}
"""),
        engine=engine,
    )
    df = flow.run()
    assert df.count() == 2
    assert Handler.state["job_polls"] == 3


def test_rest_url_polling_csv_payload(engine, server, monkeypatch):
    import ankaflow_spark.sources.rest as rest_mod

    monkeypatch.setattr(rest_mod.time, "sleep", lambda s: None)
    Handler.state["export_polls"] = 0
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: export
  connection:
    kind: rest
    client: {{base_url: {server}}}
    request:
      endpoint: /export
      method: get
      response:
        content_type: csv
        locator: url
        handler: {{kind: URLPolling, ready_status: ready}}
"""),
        engine=engine,
    )
    df = flow.run()
    assert {r["id"] for r in df.collect()} == {10, 11}
    assert Handler.state["export_polls"] == 2


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


def test_rest_pagination_overreported_total_terminates(engine, server):
    """An API that over-reports total_records and then returns empty
    pages must not loop forever: an empty page ends pagination and the
    loop is additionally bounded by max_pages (ADVICE r2)."""
    Handler.state["overreport_hits"] = 0
    flow = Flow(
        Stages.loads(f"""
- kind: tap
  name: liar
  connection:
    kind: rest
    client: {{base_url: {server}}}
    request:
      endpoint: /overreport
      method: get
      query: {{page: 0}}
      response:
        content_type: json
        locator: rows
        handler:
          kind: Pagination
          page_param: page
          page_size: 2
          total_records: total
"""),
        engine=engine,
    )
    df = flow.run()
    assert df.count() == 2
    # page 0 (2 rows) + page 1 (empty -> stop): exactly two requests
    assert Handler.state["overreport_hits"] == 2
