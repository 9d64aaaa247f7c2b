"""Delta Lake connector (reference surface: ankaflow/connections/delta.py —
strategy matrix SKIP/CREATE/WRITE, modes append/overwrite/error, schema
merge/overwrite, partition_by, post-write OPTIMIZE/VACUUM pseudo-SQL).

With delta-spark jars on the classpath the connector maps the full
option surface onto ``spark.read.format("delta")`` / ``df.write.format``.
Without them (this container) every operation routes through the
jar-free delta_log fallback — a minimal reader/writer for the public
Delta transaction-log protocol (see sources/delta_log.py for the
documented subset) — so tap/sink/TRUNCATE/OPTIMIZE all execute e2e
against real local tables (tests/test_delta.py). The admin pseudo-SQL
parser (OPTIMIZE table [COMPACT] [VACUUM] [AGE=..] [DRY_RUN]) is
engine-independent.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from ..models.core import Stage
from ..session import SparkEngine
from ..sqlfront.ranking import apply_ranking


class DeltaUnavailable(RuntimeError):
    pass


def _delta_available(spark) -> bool:
    try:
        # py4j resolves packages lazily; Class.forName is a real probe
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")  # noqa: SLF001
        return True
    except Exception:
        return False


_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<table>\S+)"
    r"(?P<compact>\s+COMPACT)?"
    r"(?P<vacuum>\s+VACUUM)?"
    r"(?:\s+AGE\s*=\s*(?P<age>\d+)\s*(?P<unit>HOURS?|DAYS?)?)?"
    r"(?P<dry>\s+DRY_RUN)?\s*$",
    re.IGNORECASE,
)

VACUUM_DEFAULT_DAYS = 7
VACUUM_MAX_DAYS = 365


def parse_optimize(sql: str) -> Optional[Dict[str, Any]]:
    """Parse the admin pseudo-SQL into an action dict; None if not an
    OPTIMIZE statement. Retention clamps to [0, 365] days with a 7-day
    default, mirroring the reference's retention policy."""
    m = _OPTIMIZE_RE.match(sql)
    if not m:
        return None
    age_days = VACUUM_DEFAULT_DAYS
    if m.group("age"):
        val = int(m.group("age"))
        unit = (m.group("unit") or "DAYS").upper()
        age_days = val / 24 if unit.startswith("HOUR") else val
        age_days = max(0, min(VACUUM_MAX_DAYS, age_days))
    return {
        "table": m.group("table").strip('"'),
        "compact": bool(m.group("compact")),
        "vacuum": bool(m.group("vacuum")),
        "retention_hours": age_days * 24,
        "dry_run": bool(m.group("dry")),
    }


class SinkStrategy:
    """Reference delta.py:368-386 — decided from declared schema + rows."""

    SKIP = "SKIP"
    CREATE = "CREATE"
    WRITE = "WRITE"


def create_strategy(has_schema: bool, rows: int) -> str:
    """The reference's strategy matrix (delta.py sink docstring):

    | Schema (fields) | Data | Strategy                    |
    |-----------------|------|-----------------------------|
    | no              | no   | SKIP   — no action          |
    | yes             | no   | CREATE — define schema only |
    | yes             | yes  | WRITE  — create & write     |
    | no              | yes  | WRITE  — infer & write      |
    """
    if not has_schema and rows == 0:
        return SinkStrategy.SKIP
    if has_schema and rows == 0:
        return SinkStrategy.CREATE
    return SinkStrategy.WRITE


class DeltaConnection:
    """Full surface mapped onto spark delta format; every JVM-touching
    operation is gated behind a clear error while the jars are absent
    (strategy decisions and spec parsing stay testable without them)."""

    def __init__(self, engine: SparkEngine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables

    def _use_jars(self) -> bool:
        """True when delta-spark is on the classpath (preferred: full
        protocol, concurrent writers). Otherwise every operation routes
        through the jar-free delta_log fallback — single-writer local
        commits, reader protocol <= 2 (delta_log module docstring)."""
        return _delta_available(self.engine.spark)

    def _read(self) -> DataFrame:
        # time travel: options.version_as_of / versionAsOf (NOT the
        # spec-level `version` key — that is the ranking column)
        opts = dict(self.spec.get("options") or {})
        as_of = opts.get("version_as_of", opts.get("versionAsOf"))
        if self._use_jars():
            reader = self.engine.spark.read.format("delta")
            if as_of is not None:
                reader = reader.option("versionAsOf", int(as_of))
            return reader.load(self.spec["locator"])
        from . import delta_log

        return delta_log.read_delta_table(
            self.engine.spark,
            self.spec["locator"],
            version_as_of=None if as_of is None else int(as_of),
        )

    def tap(self, query: Optional[str], stage: Stage) -> DataFrame:
        df = self._read()
        df = apply_ranking(df, self.spec)
        if query:
            # md5 of the stage name, not hash(): per-process hash salting
            # would make the view name unreproducible across runs.
            view = f"__delta_{hashlib.md5(stage.name.encode()).hexdigest()[:8]}"
            df.createOrReplaceTempView(view)
            # the reference corpus spells the placeholder as the kind
            # name (`select * from Deltatable`); rewriting is
            # table-position-aware (FROM/JOIN only) so the word in a
            # literal or column position survives.
            from ..sqlfront.rewrite import rewrite_table_placeholders

            q = rewrite_table_placeholders(query, (stage.name, "Deltatable"), view)
            return self.engine.sql(q)
        return df

    # -- sink strategy machinery (reference delta.py:316-366, 461-520) ----
    def _is_deltatable(self) -> bool:
        if self._use_jars():
            from delta.tables import DeltaTable  # type: ignore

            return DeltaTable.isDeltaTable(self.engine.spark, self.spec["locator"])
        from . import delta_log

        return delta_log.is_delta_table(self.spec["locator"])

    def _create_empty_table(self) -> None:
        """CREATE: an empty Delta table from declared fields (reference
        _create_deltatable writes a dummy row through delta-rs; Spark can
        write a genuinely empty DataFrame with the declared schema)."""
        from .file import fields_to_schema

        schema = fields_to_schema(self.spec.get("fields"))
        if schema is None:
            raise ValueError(
                "Cannot create empty Delta table: no schema fields provided."
            )
        if not self._use_jars():
            from . import delta_log

            delta_log.create_empty_table(
                self.engine.spark,
                self.spec["locator"],
                schema,
                list(self.spec.get("partition_by") or []),
            )
            return
        empty = self.engine.spark.createDataFrame([], schema=schema)
        empty.write.format("delta").mode("overwrite").option(
            "overwriteSchema", "true"
        ).save(self.spec["locator"])

    def _write(self, df: DataFrame) -> None:
        spec = self.spec
        if not self._use_jars():
            from . import delta_log

            delta_log.write_delta_table(
                self.engine.spark,
                df,
                spec["locator"],
                mode=spec.get("mode") or "append",
                partition_by=list(spec.get("partition_by") or []),
            )
            return
        writer = df.write.format("delta").mode(spec.get("mode") or "append")
        if spec.get("options", {}).get("merge_schema"):
            writer = writer.option("mergeSchema", "true")
        if spec.get("options", {}).get("overwrite_schema"):
            writer = writer.option("overwriteSchema", "true")
        if spec.get("partition_by"):
            writer = writer.partitionBy(*spec["partition_by"])
        writer.save(spec["locator"])

    def sink(self, df: DataFrame, stage: Stage) -> None:
        # emptiness, not a full count: the matrix only needs rows == 0
        rows = 0 if df.isEmpty() else 1
        strategy = create_strategy(bool(self.spec.get("fields")), rows)
        if strategy == SinkStrategy.SKIP:
            return
        if strategy == SinkStrategy.CREATE:
            if not self._is_deltatable() and self.spec.get("fields"):
                self._create_empty_table()
            return
        self._write(df)
        if self.spec.get("optimize") is not None:
            self.execute(f"OPTIMIZE {self.spec['locator']} COMPACT VACUUM", stage)

    def execute(self, query: str, stage: Stage) -> None:
        trunc = re.match(r"^\s*TRUNCATE\s+(\S+)\s*;?\s*$", query, re.IGNORECASE)
        if trunc:
            # reference integration.yaml: `truncate Deltatable` deletes
            # all rows but keeps the table + schema
            if self._use_jars():
                from delta.tables import DeltaTable  # type: ignore

                DeltaTable.forPath(self.engine.spark, self.spec["locator"]).delete()
            else:
                from . import delta_log

                delta_log.truncate_delta_table(self.engine.spark, self.spec["locator"])
            return
        action = parse_optimize(query)
        if action is None:
            self.engine.spark.sql(query)
            return
        if self._use_jars():
            from delta.tables import DeltaTable  # type: ignore

            dt = DeltaTable.forPath(self.engine.spark, self.spec["locator"])
            if action["compact"] and not action["dry_run"]:
                dt.optimize().executeCompaction()
            if action["vacuum"] and not action["dry_run"]:
                dt.vacuum(action["retention_hours"])
            return
        from . import delta_log

        if action["compact"] and not action["dry_run"]:
            delta_log.compact_delta_table(self.engine.spark, self.spec["locator"])
        if action["vacuum"] and not action["dry_run"]:
            delta_log.vacuum_delta_table(
                self.engine.spark, self.spec["locator"], action["retention_hours"]
            )
