"""Plan audit: dump the physical-plan node profile of every graded
batch query — the reproducible source for PERF.md's plan-evidence
claims and a quick diff surface when a Spark upgrade or query change
shifts join strategies.

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]

Prints one line per query: join/exchange/scan node counts and the
pushed-filter summary of the first scan. Plans are compiled, never
executed (streaming/mapInPandas queries that must execute to plan are
skipped).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

INTERESTING = (
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "Window",
    "Scan",
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    import __spark_entry__ as entry

    for name, fn in sorted(entry.queries().items()):
        if args and name not in args:
            continue
        if name.startswith("st") or name.startswith("m0"):
            print(f"{name:32s} (skipped: executes to plan)")
            continue
        plan = jvm.PythonSQLUtils.explainString(
            fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
        )
        nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
        counts = {k: sum(1 for n in nodes if n == k or (k == "Scan" and n.startswith("Scan"))) for k in INTERESTING}
        profile = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        extra = f"  pushed=[{pushed.group(1)[:60]}]" if pushed and pushed.group(1) else ""
        print(f"{name:32s} {profile}{extra}")


if __name__ == "__main__":
    main()
