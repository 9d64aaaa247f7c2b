"""Shuffled-hash-join vs sort-merge-join stress — the reproducible
source for PERF.md's q92 rows (r13).

q92's shape: a dim too large to broadcast (at scale: over the 10MB
threshold / 8GB cap) joining a much larger fact. Spark's
preferSortMergeJoin=true default plans SMJ — both sides SORT after the
shuffle; with the lever off (false) and the build side inside the
(autoBroadcastJoinThreshold x shuffle partitions) local-map window,
Spark plans ShuffledHashJoin — same shuffle, NO sorts, the fact
streams through a per-partition hash map.

This harness times the identical join text both ways at 1x (sf0.1
orders, 150k rows) and N-times-cloned orders (clone waves shift
o_orderkey; o_custkey is an entity key and stays, so the dim:fact
ratio GROWS with volume — the regime where the fact-side sort SMJ
pays is the dominant cost). Broadcast is held off in both regimes
(the dim "exceeds the budget" by construction); the SHJ plan must
show ShuffledHashJoin and no Sort, the SMJ plan must show
SortMergeJoin. Both must return identical aggregates.

Usage: python tools/stress_shj.py [n_copies]   (default: 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SQL derives from the graded operator's own constant (r13 self-review:
# a hand-copied spelling would silently measure a different query than
# the one whose PERF rows this tool reproduces)
def _join_sql() -> str:
    from ankaflow_spark.operators.relational import _Q92_SQL

    assert "FROM orders o" in _Q92_SQL
    return _Q92_SQL.replace("FROM orders o", "FROM {fact} o")


def run_once(spark, fact: str, shj: bool) -> tuple:
    spark.conf.set(
        "spark.sql.join.preferSortMergeJoin", "false" if shj else "true"
    )
    df = spark.sql(_join_sql().format(fact=fact))
    t0 = time.time()
    rows = df.collect()
    wall = time.time() - t0
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    if shj:
        assert "ShuffledHashJoin" in final, "SHJ not planned"
        # no join-key sorts (the remaining Sort is the bounded 5-row
        # ORDER BY segment on the aggregate output)
        assert "Sort [o_custkey" not in final
        assert "Sort [c_custkey" not in final
    else:
        assert "SortMergeJoin" in final, "SMJ not planned"
    return wall, [tuple(r) for r in rows]


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from ankaflow_spark.operators.tables import load_tables
    from ankaflow_spark.session import get_spark
    from tools.stress_volume import build_corpus

    spark = get_spark("stress_shj")
    load_tables(spark, "/root/testdata/sf0.1")
    # hold broadcast off in BOTH regimes (the dim "exceeds the budget"
    # by construction) while keeping the SHJ local-map window open —
    # AQE re-checks (threshold x partitions) against RUNTIME shuffle
    # bytes, so the reducer count carries the window. Confs are q92's
    # own, minus the lever key the tool toggles itself.
    from ankaflow_spark.operators.relational import _Q92_SHJ_CONF

    for k, v in _Q92_SHJ_CONF.items():
        if k != "spark.sql.join.preferSortMergeJoin":
            spark.conf.set(k, v)

    big_dir = build_corpus(spark, n_copies, "orders")
    spark.read.parquet(
        os.path.join(big_dir, "orders.parquet")
    ).createOrReplaceTempView("orders_big")

    for label, fact in (("1x", "orders"), (f"{n_copies}x", "orders_big")):
        spark.table(fact).write.format("noop").mode("overwrite").save()
        results = {}
        for shj in (True, False):
            wall, rows = min(
                (run_once(spark, fact, shj) for _ in range(2)),
                key=lambda t: t[0],
            )
            results[shj] = (wall, rows)
        assert results[True][1] == results[False][1], "SHJ/SMJ results differ"
        shj_w, smj_w = results[True][0], results[False][0]
        print(
            f"{label}: SHJ {shj_w:.2f}s  SMJ {smj_w:.2f}s  "
            f"speedup {smj_w / shj_w:.2f}x  ({len(results[True][1])} rows)"
        )


if __name__ == "__main__":
    main()
