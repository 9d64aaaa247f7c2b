"""Jar-free BigQuery path over the public REST API (v2 wire protocol).

The reference's BigQuery connector is a *client-library* integration —
``client.query(...).to_dataframe()`` for taps and
``load_table_from_dataframe`` with a ``LoadJobConfig`` for sinks
(reference ankaflow/connections/bigquery.py:169-280) — i.e. it speaks
the BigQuery REST API via google-cloud-bigquery and materializes
results driver-side. This module reimplements that contract directly
on the wire protocol with stdlib urllib, so the connector works (and
is e2e-testable against a local protocol emulator) without the
spark-bigquery jar:

* ``query``   -> POST /projects/{p}/queries  (+ pageToken pagination)
* ``load``    -> POST /upload/bigquery/v2/projects/{p}/jobs multipart
                 (metadata JSON + NEWLINE_DELIMITED_JSON payload), the
                 exact shape google-cloud-bigquery's
                 ``load_table_from_file`` emits; dispositions and
                 ``schemaUpdateOptions`` ride in the job config.

Scale note: like the reference's client path, tap results materialize
on the driver — this is the bounded-result fallback. Cluster-scale
BigQuery reads use the spark-bigquery connector when its jar is on the
classpath (sources/bigquery.py prefers it automatically).
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import urllib.error
import urllib.request
import uuid
from typing import Dict, List, Optional, Tuple

_BQ_TO_SPARK = {
    "INTEGER": "bigint",
    "INT64": "bigint",
    "FLOAT": "double",
    "FLOAT64": "double",
    "NUMERIC": "decimal(38,9)",
    "STRING": "string",
    "BOOL": "boolean",
    "BOOLEAN": "boolean",
    "BYTES": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "DATETIME": "timestamp",
}

_SPARK_TO_BQ = {
    "bigint": "INTEGER",
    "int": "INTEGER",
    "smallint": "INTEGER",
    "tinyint": "INTEGER",
    "double": "FLOAT",
    "float": "FLOAT",
    "string": "STRING",
    "boolean": "BOOLEAN",
    "binary": "BYTES",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


class BigQueryHttpError(RuntimeError):
    def __init__(self, status: int, reason: str, body: str):
        self.status = status
        self.reason = reason
        super().__init__(f"BigQuery API error {status} ({reason}): {body[:500]}")


class BigQueryRestClient:
    """Minimal BigQuery v2 REST client (stdlib only). ``endpoint`` is
    the API root (e.g. ``http://localhost:9050/bigquery/v2`` for a
    local emulator, ``https://bigquery.googleapis.com/bigquery/v2`` for
    the real service with a bearer token)."""

    def __init__(self, endpoint: str, project: str, token: Optional[str] = None,
                 timeout: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.project = project
        self.token = token
        self.timeout = timeout

    # -- transport -------------------------------------------------------
    def _request(self, method: str, url: str, body: Optional[bytes] = None,
                 content_type: str = "application/json") -> dict:
        req = urllib.request.Request(url, data=body, method=method)
        req.add_header("Content-Type", content_type)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read()
        except urllib.error.HTTPError as e:
            raise BigQueryHttpError(e.code, e.reason, e.read().decode("utf-8", "replace"))
        return json.loads(payload) if payload else {}

    # -- queries ---------------------------------------------------------
    def query(self, sql: str) -> Tuple[List[Tuple[str, str]], List[list]]:
        """Run a synchronous query; -> ([(name, spark_type)], rows) with
        values decoded from BigQuery's stringly-typed JSON encoding.
        Follows pageToken until the result set is complete."""
        url = f"{self.endpoint}/projects/{self.project}/queries"
        body = json.dumps({"query": sql, "useLegacySql": False}).encode()
        resp = self._request("POST", url, body)
        fields = [
            (f["name"], _BQ_TO_SPARK.get(f.get("type", "STRING").upper(), "string"))
            for f in resp.get("schema", {}).get("fields", [])
        ]
        rows = [self._decode_row(r, fields) for r in resp.get("rows", [])]
        job_id = resp.get("jobReference", {}).get("jobId")
        while resp.get("pageToken") and job_id:
            resp = self._request(
                "GET",
                f"{self.endpoint}/projects/{self.project}/queries/{job_id}"
                f"?pageToken={resp['pageToken']}",
            )
            rows.extend(self._decode_row(r, fields) for r in resp.get("rows", []))
        return fields, rows

    @staticmethod
    def _decode_row(row: dict, fields: List[Tuple[str, str]]) -> list:
        """BigQuery's REST JSON encodes every cell as a string:
        TIMESTAMP as fractional epoch seconds, DATE as ISO, NUMERIC as
        a decimal string, BYTES as base64. createDataFrame rejects str
        for the timestamp/date/decimal/binary Spark types the schema
        declares, so each family decodes to its Python object here
        (mirroring clickhouse_http._to_df's conv())."""
        out = []
        for (name, typ), cell in zip(fields, row.get("f", [])):
            v = cell.get("v")
            if v is None:
                out.append(None)
            elif typ == "bigint":
                out.append(int(v))
            elif typ == "double":
                out.append(float(v))
            elif typ == "boolean":
                out.append(v in (True, "true", "TRUE", "1"))
            elif typ == "timestamp":
                # TIMESTAMP arrives as fractional epoch seconds; DATETIME
                # (mapped to the same Spark type) arrives as an ISO civil
                # string ('2024-03-01T12:30:45.5') — try epoch first, fall
                # back to ISO parse for the DATETIME wire form.
                try:
                    out.append(
                        datetime.datetime.fromtimestamp(
                            float(v), tz=datetime.timezone.utc
                        ).replace(tzinfo=None)
                    )
                except ValueError:
                    out.append(datetime.datetime.fromisoformat(v))
            elif typ == "date":
                out.append(datetime.date.fromisoformat(v))
            elif typ.startswith("decimal"):
                out.append(decimal.Decimal(v))
            elif typ == "binary":
                out.append(base64.b64decode(v))
            else:
                out.append(v)
        return out

    # -- load jobs -------------------------------------------------------
    def load_ndjson(
        self,
        table: str,
        ndjson: bytes,
        schema_fields: List[Tuple[str, str]],
        write_disposition: str = "WRITE_APPEND",
        allow_field_addition: bool = False,
    ) -> dict:
        """Submit a load job exactly as google-cloud-bigquery's
        ``load_table_from_file`` does: multipart/related upload with a
        job-config metadata part and a NEWLINE_DELIMITED_JSON data
        part. Returns the final job resource; raises BigQueryHttpError
        on disposition/schema conflicts (409 / 400)."""
        project, dataset, name = _split_table(table, self.project)
        config = {
            "configuration": {
                "load": {
                    "destinationTable": {
                        "projectId": project,
                        "datasetId": dataset,
                        "tableId": name,
                    },
                    "sourceFormat": "NEWLINE_DELIMITED_JSON",
                    "writeDisposition": write_disposition,
                    "schema": {
                        "fields": [
                            {"name": n, "type": _SPARK_TO_BQ.get(t, "STRING")}
                            for n, t in schema_fields
                        ]
                    },
                }
            }
        }
        if allow_field_addition:
            config["configuration"]["load"]["schemaUpdateOptions"] = [
                "ALLOW_FIELD_ADDITION"
            ]
        boundary = f"bq-{uuid.uuid4().hex}"
        body = (
            f"--{boundary}\r\nContent-Type: application/json; charset=UTF-8\r\n\r\n"
            f"{json.dumps(config)}\r\n"
            f"--{boundary}\r\nContent-Type: application/octet-stream\r\n\r\n"
        ).encode() + ndjson + f"\r\n--{boundary}--\r\n".encode()
        upload_root = self.endpoint
        for marker in ("/bigquery/v2", "/v2"):
            if upload_root.endswith(marker):
                upload_root = upload_root[: -len(marker)] + "/upload/bigquery/v2"
                break
        else:
            upload_root = upload_root + "/upload"
        url = f"{upload_root}/projects/{project}/jobs?uploadType=multipart"
        return self._request(
            "POST", url, body, content_type=f"multipart/related; boundary={boundary}"
        )


def _split_table(table: str, default_project: str) -> Tuple[str, str, str]:
    parts = table.replace("`", "").split(".")
    if len(parts) == 3:
        return parts[0], parts[1], parts[2]
    if len(parts) == 2:
        return default_project, parts[0], parts[1]
    raise ValueError(
        f"BigQuery table locator {table!r} must be dataset.table or "
        "project.dataset.table"
    )
