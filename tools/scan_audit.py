"""Executed-scan audit: count REAL FileSourceScanExec nodes per query.

`explain()` text overcounts (reused subtrees are re-printed) and
`collectLeaves()` undercounts (AdaptiveSparkPlanExec is opaque), so this
walker executes each query once and traverses the FINAL adaptive plan —
descending AdaptiveSparkPlanExec, children AND subqueries, skipping
ReusedExchange/ReusedSubquery — and reports how many times each base
parquet table is genuinely scanned. Spark re-expands a CTE (or a
re-referenced DataFrame subtree) per consumer with NO physical reuse
(PERF.md r27: the inline ts22 executed 28 separate events scans), so a
query whose big-table count exceeds its number of semantically distinct
passes is re-executing work — at 100 TB, each extra count is an extra
pass over the full corpus.

Usage: python tools/scan_audit.py [sf_dir] [query ...]
Prints per-query base-table scan counts (only tables scanned >= 2 times
unless specific queries are requested). Streaming/multimodal queries
(st*/m*) are skipped: their work happens in micro-batch jobs, not the
returned DataFrame's plan.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def real_scans(df) -> dict:
    df.count()
    plan = df._jdf.queryExecution().executedPlan()
    counts: dict = {}

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.startswith("ReusedExchange") or cls.startswith("ReusedSubquery"):
            return
        if cls == "FileSourceScanExec":
            mt = re.search(r"(\w+)\.parquet", node.toString())
            key = mt.group(1) if mt else "?"
            counts[key] = counts.get(key, 0) + 1
            return
        if cls == "InMemoryTableScanExec":
            counts["(cached)"] = counts.get("(cached)", 0) + 1
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        sq = node.subqueries()
        for i in range(sq.size()):
            walk(sq.apply(i))

    walk(plan)
    return counts


def main() -> int:
    import importlib.util

    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spec = importlib.util.spec_from_file_location(
        "entry", __file__.rsplit("/", 2)[0] + "/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    wanted = args or [n for n in qs if not n.startswith(("st", "m"))]
    for name in wanted:
        if name not in qs:
            print(f"[SKIP] {name} not in queries()")
            continue
        if name.startswith(("st", "m")) and not args:
            continue
        try:
            counts = real_scans(qs[name](spark, sf))
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"{name:34s} ERR {str(e)[:80]}")
            continue
        flagged = {t: c for t, c in counts.items() if c >= 2 and t != "(cached)"}
        if args or flagged:
            print(f"{name:34s} {counts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
