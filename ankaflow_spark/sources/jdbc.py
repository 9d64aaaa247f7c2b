"""JDBC connection: the Spark-native path for the reference's
ClickHouse-style warehouse taps/sinks (reference surface:
ankaflow/connections/clickhouse.py — streamed reads in 50k-row blocks,
batched inserts; behavior studied, fresh implementation).

Spark's JDBC source replaces the driver-side block streaming with
executor-side partitioned reads (``partitionColumn``/``numPartitions``),
and ``fetchsize`` plays the reference's blocksize role (default 50_000).
The incremental version/key dedup is PUSHED INTO the remote query
exactly as the reference does — the remote engine ranks, Spark reads
only surviving rows (SURVEY.md §4 row 1, the one rewrite Catalyst can't
do for us).

No JDBC driver jars ship in this container; ``tap``/``sink`` raise a
clear error at use time, while query construction (the engine logic) is
fully unit-testable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from ..models.core import Stage
from ..session import SparkEngine
from ..sqlfront.ranking import build_ranked_sql
from ..sqlfront.validate import validate_simple_query

DEFAULT_FETCHSIZE = 50_000  # the reference's stream block size


def build_remote_query(
    query: str,
    version: Optional[str] = None,
    keys: Optional[list] = None,
    limit: Optional[int] = None,
) -> str:
    """Compose the exact SQL the remote engine runs: validate the simple
    select, inject latest-record-wins ranking when version+keys are
    declared, wrap with LIMIT last."""
    ranking = bool(version and keys)
    validate_simple_query(query, ranking_enabled=ranking)
    out = query.strip().rstrip(";")
    if ranking:
        out = build_ranked_sql(out, version=version, keys=list(keys))
    if limit is not None:
        out = f"SELECT * FROM ({out}) __limited__ LIMIT {int(limit)}"
    return out


_WAREHOUSE_KINDS = ("clickhouse", "postgres", "mysql")


def resolve_warehouse_table(locator: str, database: Optional[str] = None) -> str:
    """Fully-qualified ``"db"."table"`` with the reference's validation
    rules (reference clickhouse.py:120-143 locate()): a dotted locator
    must be exactly db.table and must NOT be combined with a configured
    database; a bare locator REQUIRES a configured database."""
    if "." in locator:
        parts = locator.split(".")
        if len(parts) != 2:
            raise ValueError(f"Invalid locator format: {locator}")
        if database:
            raise ValueError(
                f"Locator '{locator}' must not include a database prefix "
                "when 'database' is set."
            )
        db, table = parts
    else:
        if not database:
            raise ValueError(
                f"Locator '{locator}' must include a database prefix "
                "when 'database' is not set."
            )
        db, table = database, locator
    return f'"{db}"."{table}"'


_CLICKHOUSE_TYPES = {
    "bigint": "Int64",
    "int": "Int32",
    "smallint": "Int16",
    "tinyint": "Int8",
    "double": "Float64",
    "float": "Float32",
    "string": "String",
    "boolean": "Bool",
    "binary": "String",
    "date": "Date32",
    "timestamp": "DateTime64(6)",
    "timestamp_ntz": "DateTime64(6)",
}


def clickhouse_type(spark_type: str, nullable: bool = False) -> str:
    """Spark SQL type -> ClickHouse column type (the DDL dialect the
    reference's warehouse leaves to the server; Spark's JDBC writer needs
    it spelled via createTableColumnTypes). DECIMAL(p,s) passes through
    (ClickHouse spells it identically); unknowns fail actionably."""
    t = spark_type.strip().lower()
    if t.startswith("decimal"):
        ch = t.replace("decimal", "Decimal")
    elif t in _CLICKHOUSE_TYPES:
        ch = _CLICKHOUSE_TYPES[t]
    else:
        raise ValueError(
            f"no ClickHouse type mapping for Spark type {spark_type!r}; "
            "add an explicit options.createTableColumnTypes"
        )
    return f"Nullable({ch})" if nullable else ch


def clickhouse_ddl_options(df, spec: Dict[str, Any]) -> Dict[str, str]:
    """The two writer options that make Spark's generic JDBC CREATE
    TABLE valid ClickHouse DDL: a full column-type list (ClickHouse
    rejects Spark's default TEXT/TIMESTAMP spellings) and the mandatory
    ENGINE clause. ``spec.engine`` / ``spec.order_by`` override the
    MergeTree default; explicit user options always win."""
    cols = ", ".join(
        f"{f.name} {clickhouse_type(f.dataType.simpleString(), f.nullable)}"
        for f in df.schema.fields
    )
    engine = spec.get("engine") or "MergeTree()"
    order_by = spec.get("order_by") or "tuple()"
    return {
        "createTableColumnTypes": cols,
        "createTableOptions": f"ENGINE = {engine} ORDER BY {order_by}",
    }


class JDBCConnection:
    def __init__(self, engine: SparkEngine, spec: Dict[str, Any], variables: Dict[str, Any]):
        self.engine = engine
        self.spec = spec
        self.variables = variables

    def _qualified_table(self) -> Optional[str]:
        """The sink/tap target table. Warehouse kinds (clickhouse/...)
        use the reference's db-qualification rules; plain ``jdbc`` takes
        the name verbatim. A jdbc: locator is a URL, never a table."""
        table = self.spec.get("table") or self.spec.get("locator")
        if not table or str(table).startswith("jdbc:"):
            return None
        kind = str(self.spec.get("kind") or "").lower()
        if kind in _WAREHOUSE_KINDS:
            database = self.spec.get("database") or (self.spec.get("options") or {}).get(
                "database"
            )
            return resolve_warehouse_table(str(table), database)
        return str(table)

    def _options(self, dbtable_or_query: Dict[str, str]) -> Dict[str, str]:
        opts = dict(self.spec.get("options") or {})
        url = opts.pop("url", None) or self.spec.get("locator")
        if not url or not str(url).startswith("jdbc:"):
            raise ValueError("jdbc connection needs a jdbc:... url (locator or options.url)")
        base = {
            "url": url,
            "fetchsize": str(opts.pop("fetchsize", DEFAULT_FETCHSIZE)),
            "batchsize": str(opts.pop("batchsize", DEFAULT_FETCHSIZE)),
            **dbtable_or_query,
            **opts,
        }
        return base

    def tap(self, query: Optional[str], stage: Stage) -> DataFrame:
        spec = self.spec
        if query:
            remote = build_remote_query(
                query, version=spec.get("version"), keys=spec.get("key")
            )
            options = self._options({"query": remote})
        else:
            table = self._qualified_table() or spec.get("table") or spec.get("locator")
            options = self._options({"dbtable": table})
        return self.engine.spark.read.format("jdbc").options(**options).load()

    def sink(self, df: DataFrame, stage: Stage) -> None:
        # the reference's warehouse sinks name the target table in the
        # locator (integration.yaml ClickHouse stages)
        table = self._qualified_table()
        if not table:
            raise ValueError("jdbc sink needs `table` (or a table-name locator)")
        mode = self.spec.get("mode") or "append"
        options = self._options({"dbtable": table})
        if str(self.spec.get("kind") or "").lower() == "clickhouse":
            # ClickHouse rejects Spark's generic DDL (TEXT columns, no
            # ENGINE clause); synthesize the dialect-correct CREATE
            # TABLE options. Explicit user options still win.
            for k, v in clickhouse_ddl_options(df, self.spec).items():
                options.setdefault(k, v)
        df.write.format("jdbc").options(**options).mode(mode).save()

    def execute(self, query: str, stage: Stage) -> None:
        """Remote DDL/DML statement on the external system (reference
        'sql' stage for warehouse connections): executed through
        java.sql.DriverManager on the driver JVM — any JDBC driver on
        the Spark classpath works (Derby ships with Spark; ClickHouse/
        Postgres need their jar added)."""
        opts = dict(self.spec.get("options") or {})
        url = opts.get("url") or self.spec.get("locator")
        if not url or not str(url).startswith("jdbc:"):
            raise ValueError("jdbc sql stage needs a jdbc:... url (locator or options.url)")
        jvm = self.engine.spark._jvm  # noqa: SLF001
        # authenticated warehouses (the normal ClickHouse/Postgres case)
        # need the same credentials the Spark reader gets via _options;
        # a bare getConnection(url) only ever worked for embedded Derby.
        user = opts.get("user")
        password = opts.get("password")
        if user is not None:
            conn = jvm.java.sql.DriverManager.getConnection(url, str(user), str(password or ""))
        else:
            conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                st.execute(query)
            finally:
                st.close()
        finally:
            conn.close()
