"""Pipeline executor: runs a ``Stages`` tree against a ``SparkEngine``.

The Spark analog of the reference's flow loop (reference:
ankaflow/core/flow.py:589-625 — behavior studied, not ported): stages run
sequentially; each registers its result under the stage name so later
stages can reference it in SQL; ``pipeline`` stages loop a nested flow
once per row of the previous stage (rows cross to the driver — bounded
by design, the only collect in the engine).

Scale notes: transforms stay lazy (Catalyst fuses across stages); only
taps materialize (read-once semantics for side-effecting sources). A
sink writes distributed output by default; ``single_file: true``
coalesces to 1 partition for locator-compatible single-file output —
documented as a small-result-only option.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import time
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from ..models.core import ErrorPolicy, Stage, StageKind, Stages
from ..session import SparkEngine
from .renderer import Renderer


class FlowError(RuntimeError):
    pass


class Flow:
    """Synchronous pipeline driver (the reference's async facade adds
    nothing on Spark — Spark actions already block on the JVM)."""

    def __init__(
        self,
        stages: Stages,
        engine: Optional[SparkEngine] = None,
        context: Optional[Dict[str, Any]] = None,
        variables: Optional[Dict[str, Any]] = None,
        conn_config: Optional["ConnectionConfiguration"] = None,
    ):
        from ..models.configs import ConnectionConfiguration

        self.stages = stages
        self.engine = engine or SparkEngine()
        self.context = dict(context or {})
        self.variables = variables if variables is not None else {}
        self.conn_config = conn_config or ConnectionConfiguration()
        s3 = getattr(self.conn_config, "s3", None)
        if s3 and s3.bucket and (s3.access_key_id or s3.secret_access_key):
            if "://" not in s3.bucket and not s3.bucket.startswith("/"):
                # scope credentials to the configured bucket (reference:
                # per-bucket secrets; Hadoop per-bucket fs.s3a config)
                self.engine.configure_bucket(
                    s3.bucket, s3.access_key_id, s3.secret_access_key
                )
        self.renderer = Renderer()
        self.lastname: Optional[str] = None
        self._last_df: Optional[DataFrame] = None
        # per-executed-stage (name, kind, seconds) — lazy stages record
        # plan-build time, taps/sinks record real execution; bench.py's
        # PIPELINE section and users profiling a flow read this
        self.stage_timings: list = []

    # ------------------------------------------------------------------
    def run(self) -> Optional[DataFrame]:
        for stage in self.stages:
            self._run_stage(stage)
        return self._last_df

    def df(self):
        """Final stage as pandas (driver-side; small results only)."""
        return self._last_df.toPandas() if self._last_df is not None else None

    def pull_df(self):
        """Run the flow and return the final stage as pandas (the
        reference's one-call convenience entry point)."""
        self.run()
        return self.df()

    # ------------------------------------------------------------------
    def _render(self, value):
        from .api import API

        return self.renderer.render(
            value,
            {
                "context": self.context,
                "variables": self.variables,
                "API": API(self.variables),
                **self.variables,
            },
        )

    def _run_stage(self, stage: Stage) -> None:
        if stage.skip_if is not None:
            rendered = self._render(stage.skip_if)
            if str(rendered).strip().lower() in ("1", "true", "yes"):
                return
        t0 = time.time()
        try:
            handler = HANDLERS[stage.kind]
            df = handler(self, stage)
            self.stage_timings.append(
                (stage.name, getattr(stage.kind, "value", str(stage.kind)),
                 round(time.time() - t0, 3))
            )
        except Exception as e:
            if stage.on_error == ErrorPolicy.proceed:
                return
            raise FlowError(f"stage '{stage.name}' failed: {e}") from e
        if df is not None:
            self._last_df = df
            self.lastname = stage.name
            if stage.explain:
                df.explain("formatted")
            if stage.show:
                # show: -1 means "all rows" in the reference; cap the
                # debug surface at 10k rows so it is one bounded action
                # (never a full count + full collect at 100 TB)
                df.show(10_000 if stage.show < 0 else stage.show)
            if stage.show_schema:
                df.printSchema()
        if stage.throttle:
            time.sleep(stage.throttle)


# ---------------------------------------------------------------------------
# handlers (registry keyed on stage kind, as in the reference's factory)
# ---------------------------------------------------------------------------
def _connector(flow: Flow, stage: Stage):
    from ..sources import get_connector

    spec = stage.connection
    if spec is None:
        raise FlowError(f"stage '{stage.name}' needs a connection")
    rendered = flow._render(spec.model_dump())
    rendered = flow.conn_config.apply_defaults(rendered)
    return get_connector(rendered["kind"])(flow.engine, rendered, flow.variables)


def handle_tap(flow: Flow, stage: Stage) -> DataFrame:
    conn = _connector(flow, stage)
    query = flow._render(stage.query) if stage.query else None
    df = conn.tap(query, stage)
    # eager materialization = the reference's CTAS tap semantics
    return flow.engine.register(stage.name, df, materialize=True)


def handle_transform(flow: Flow, stage: Stage) -> DataFrame:
    query = flow._render(stage.query or "")
    df = flow.engine.sql(query)
    return flow.engine.register(stage.name, df, materialize=False)


def handle_sink(flow: Flow, stage: Stage) -> Optional[DataFrame]:
    conn = _connector(flow, stage)
    if stage.query:
        df = flow.engine.sql(flow._render(stage.query))
    elif flow.lastname:
        df = flow.engine.table(flow.lastname)
    else:
        raise FlowError("sink has no input: no query and no previous stage")
    # A connector may return a read-back of the files it just wrote
    # (identical rows by construction — see FileConnection._sink_readback
    # and its guards): anything consuming the flow's tail then scans the
    # sink output instead of re-executing the upstream plan.
    readback = conn.sink(df, stage)
    return readback if readback is not None else df


def handle_sql(flow: Flow, stage: Stage) -> None:
    """Statement executed on the external system (reference: remote DDL).
    For file/variable connectors this is a no-op surface; Delta admin
    pseudo-SQL (OPTIMIZE/VACUUM) routes through the connector."""
    conn = _connector(flow, stage)
    conn.execute(flow._render(stage.query or ""), stage)


def handle_internal(flow: Flow, stage: Stage) -> DataFrame:
    df = flow.engine.sql(flow._render(stage.query or ""))
    return flow.engine.register(stage.name, df, materialize=False)


def handle_pipeline(flow: Flow, stage: Stage) -> None:
    """Nested pipeline: once, or once per row of the previous stage.

    Per-row iteration collects the driver rows (reference behavior —
    the loop driver is bounded by design; it is control flow, not data
    flow)."""
    if stage.stages is None:
        raise FlowError(f"pipeline stage '{stage.name}' has no stages")
    rows = [None]
    if flow.lastname is not None:
        rows = [r.asDict(recursive=True) for r in flow.engine.table(flow.lastname).collect()]
    for row in rows:
        if row is not None:
            flow.variables["loop_control"] = row
        sub = Flow(
            stage.stages,
            engine=flow.engine,
            context=flow.context,
            variables=flow.variables,
        )
        sub.run()


def handle_operator(flow: Flow, stage: Stage) -> DataFrame:
    """Declarative operator stage: named operator + params over the
    previous stage (or an explicit ``input`` stage)."""
    from ..operators.registry import get_operator

    if not stage.op:
        raise FlowError(f"operator stage '{stage.name}' needs `op`")
    source = stage.input or flow.lastname
    if source is None:
        raise FlowError(f"operator stage '{stage.name}' has no input stage")
    df = flow.engine.table(source)
    params = flow._render(dict(stage.params or {}))
    out = get_operator(stage.op)(flow.engine, df, params)
    return flow.engine.register(stage.name, out, materialize=False)


def handle_stream(flow: Flow, stage: Stage) -> DataFrame:
    """Structured Streaming stage: drives a REAL streaming query
    (readStream file source -> watermarked stateful operator ->
    availableNow trigger) to completion and registers the result as a
    batch table for downstream stages.

    ``op`` selects the streaming operator: ``windowed_agg`` (default;
    complete mode) or ``dedup`` (append mode). The source schema is
    probed with a batch read of the same locator (schema inference is
    disallowed on streaming file sources). In production the same stage
    runs unbounded by swapping the trigger; semantics are identical
    because the operators' state is associative (see operators/streamq
    value-oracle arguments).

    ``params.state_store`` selects the state store provider for this
    stage's query: ``rocksdb`` (off-heap RocksDB state — the
    production setting for large stores) or ``hdfs`` (Spark's
    heap-backed default). Omitted = session setting untouched."""
    from ..streaming.stream import (
        run_stream_to_memory,
        stream_tap,
        streaming_dedup,
        windowed_agg,
    )

    spec = stage.connection
    if spec is None:
        raise FlowError(f"stream stage '{stage.name}' needs a connection")
    rendered = flow._render(spec.model_dump())
    rendered = flow.conn_config.apply_defaults(rendered)
    fmt = rendered.get("kind", "parquet")
    locator = rendered.get("locator")
    params = flow._render(dict(stage.params or {}))
    spark = flow.engine.spark
    # state store provider surface (r12 verdict punch item 4): the
    # bounded-state family's production story needs off-heap state —
    # `state_store: rocksdb` scopes Spark's RocksDB provider to this
    # stage's query (set before start, restored unset-aware after)
    from ..streaming.stream import state_store_conf

    with state_store_conf(spark, params.get("state_store")):
        if os.path.isfile(locator):
            # the file stream source requires a DIRECTORY; a single-file
            # locator is staged as a symlink dir (md5-keyed: stable across
            # processes, no per-run leak)
            d = os.path.join(
                tempfile.gettempdir(),
                f"ankaflow_streamstage_{hashlib.md5(locator.encode()).hexdigest()[:8]}",
            )
            os.makedirs(d, exist_ok=True)
            link = os.path.join(d, os.path.basename(locator))
            if not os.path.exists(link):
                os.symlink(locator, link)
            locator = d
        schema = spark.read.format(fmt).load(locator).schema
        stream = stream_tap(
            spark, locator, schema, fmt=fmt,
            max_files_per_trigger=params.get("max_files_per_trigger"),
        )
        # watermarks hard-require TIMESTAMP; no-tz parquet columns probe as
        # NTZ on a default Spark 4 session (same normalization as the
        # batch loader / streaming staging)
        from pyspark.sql import functions as F
        from pyspark.sql.types import TimestampType

        for f in stream.schema.fields:
            if f.dataType.typeName() == "timestamp_ntz":
                stream = stream.withColumn(f.name, F.col(f.name).cast(TimestampType()))
        op = stage.op or "windowed_agg"
        ts_col = params.get("ts", "ts")
        watermark = params.get("watermark", "10 minutes")
        if op == "windowed_agg":
            out = windowed_agg(
                stream, ts_col,
                window_len=params.get("window", "5 minutes"),
                watermark=watermark,
                group_cols=list(params.get("keys", [])),
            )
            mode = "complete"
        elif op == "dedup":
            out = streaming_dedup(stream, keys=list(params["keys"]), ts_col=ts_col)
            mode = "append"
        elif op == "sessionize":
            from ..streaming.stream import sessionize_stateful

            out = sessionize_stateful(
                stream,
                ts_col=ts_col,
                key_col=params.get("key", "user_id"),
                gap_minutes=int(params.get("gap_minutes", 30)),
                watermark=watermark if "watermark" in params else "2 hours",
            )
            mode = "append"
        elif op == "static_join":
            # enrich the stream against an already-materialized stage (the
            # broadcast stream-static pattern, st05), then window-aggregate
            right = params.get("right")
            if not right:
                raise FlowError(
                    f"stream stage '{stage.name}': op static_join needs params.right "
                    "(the name of a previous stage to broadcast)"
                )
            dim = flow.engine.table(right)
            # "join_on" preferred: a bare `on:` key is YAML-1.1 boolean True
            join_cols = params.get("join_on") or params.get("on") or params.get(True) or []
            joined = stream.join(F.broadcast(dim), list(join_cols))
            out = windowed_agg(
                joined, ts_col,
                window_len=params.get("window", "5 minutes"),
                watermark=watermark,
                group_cols=list(params.get("keys", [])),
            )
            mode = "complete"
        elif op == "upsert":
            # foreachBatch latest-wins keyed state (st09); terminal batch
            # result registers directly — no memory sink involved
            from ..streaming.stream import foreachbatch_upsert

            base = os.path.join(
                tempfile.gettempdir(),
                "ankaflow_upsert_"
                + hashlib.md5(f"{locator}|{stage.name}".encode()).hexdigest()[:10],
            )
            final = foreachbatch_upsert(
                stream,
                keys=list(params["keys"]),
                version=params.get("version", ts_col),
                tiebreak=params.get("tiebreak"),
                state_base=base,
            )
            return flow.engine.register(stage.name, final, materialize=True)
        elif op == "batch_sql":
            # stateless per-micro-batch SQL screen with an append-only sink
            # (st13's shape): each batch registers as `__batch__`, the
            # stage SQL may join it against any previously-materialized
            # stage (broadcast statics), and outputs append — no streaming
            # state, so the stage scales with output volume only
            from ..streaming.stream import foreachbatch_append

            sql = params.get("sql")
            if not sql:
                raise FlowError(
                    f"stream stage '{stage.name}': op batch_sql needs params.sql "
                    "(SELECT over the per-micro-batch view __batch__)"
                )

            def _screen(batch_df):
                batch_df.createOrReplaceTempView("__batch__")
                return batch_df.sparkSession.sql(sql)

            base = os.path.join(
                tempfile.gettempdir(),
                "ankaflow_batchsql_"
                + hashlib.md5(f"{locator}|{stage.name}".encode()).hexdigest()[:10],
            )
            final = foreachbatch_append(stream, _screen, base)
            return flow.engine.register(stage.name, final, materialize=True)
        else:
            raise FlowError(
                f"stream stage '{stage.name}': unknown op {op!r} "
                "(windowed_agg, dedup, sessionize, static_join, upsert, batch_sql)"
            )
        mem = "__stream_" + "".join(c if c.isalnum() else "_" for c in stage.name) + "__"
        run_stream_to_memory(out, mem, output_mode=mode)
        return flow.engine.register(stage.name, spark.table(mem), materialize=True)


HANDLERS = {
    StageKind.source: handle_tap,
    StageKind.tap: handle_tap,
    StageKind.transform: handle_transform,
    StageKind.sink: handle_sink,
    StageKind.sql: handle_sql,
    StageKind.internal: handle_internal,
    StageKind.pipeline: handle_pipeline,
    StageKind.operator: handle_operator,
    StageKind.stream: handle_stream,
}
