"""Runtime Bloom-filter join pruning stress — the reproducible source
for PERF.md's q91 on/off rows (r13 verdict punch item 3).

q91's shape: a selective dim filter (one nation's suppliers, ~4% of
keys) joining an unpartitioned, unbucketed fact (lineitem on
l_suppkey) through a forced shuffle join — the common 100 TB case
where neither partition pruning (q85/q86) nor bucket pruning (q89)
applies because the join key has no layout. With
spark.sql.optimizer.runtime.bloomFilter.enabled, Spark builds a Bloom
filter over the filtered dim keys and injects
might_contain(xxhash64(l_suppkey)) above the fact scan, so non-matching
fact rows die BEFORE the shuffle feeding the join; with it off, the
full fact shuffles and the join itself does all the discarding.

This harness times the identical join text both ways at 1x (sf0.1) and
N-times-cloned lineitem (clone waves shift l_orderkey; l_suppkey is an
entity key and stays, so the ~4% selectivity is scale-invariant —
exactly the regime where the filter's win grows with the fact). Both
regimes must return identical aggregates; the ON plan must carry
might_contain, the OFF plan must not.

Usage: python tools/stress_bloom.py [n_copies]   (default: 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SQL and confs derive from the graded operator's own constants (r13
# self-review: a hand-copied spelling would silently measure a
# different query than the one whose PERF rows this tool reproduces)
def _join_sql() -> str:
    from ankaflow_spark.operators.relational import _Q91_SQL

    assert "FROM lineitem l" in _Q91_SQL
    return _Q91_SQL.replace("FROM lineitem l", "FROM {fact} l")


def _conf() -> dict:
    from ankaflow_spark.operators.relational import _Q91_BLOOM_CONF

    # the tool toggles the lever itself; everything else is q91's
    return {
        k: v
        for k, v in _Q91_BLOOM_CONF.items()
        if k != "spark.sql.optimizer.runtime.bloomFilter.enabled"
    }


def run_once(spark, fact: str, bloom_on: bool) -> tuple:
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true" if bloom_on else "false",
    )
    df = spark.sql(_join_sql().format(fact=fact))
    t0 = time.time()
    rows = df.collect()
    wall = time.time() - t0
    executed = df._jdf.queryExecution().executedPlan().toString()
    has_bloom = "might_contain" in executed
    assert has_bloom == bloom_on, (
        f"bloom_on={bloom_on} but might_contain={'present' if has_bloom else 'absent'}"
    )
    return wall, [tuple(r) for r in rows]


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from ankaflow_spark.operators.tables import load_tables
    from ankaflow_spark.session import get_spark
    from tools.stress_volume import build_corpus

    spark = get_spark("stress_bloom")
    load_tables(spark, "/root/testdata/sf0.1")
    for k, v in _conf().items():
        spark.conf.set(k, v)

    # Nx fact: clone lineitem with shifted l_orderkey (l_suppkey stays)
    big_dir = build_corpus(spark, n_copies, "lineitem")
    spark.read.parquet(os.path.join(big_dir, "lineitem.parquet")).createOrReplaceTempView(
        "lineitem_big"
    )

    for label, fact in ((f"1x", "lineitem"), (f"{n_copies}x", "lineitem_big")):
        # warm the scan once so ON/OFF compare compute, not page cache
        spark.table(fact).write.format("noop").mode("overwrite").save()
        results = {}
        for on in (True, False):
            wall, rows = min(
                (run_once(spark, fact, on) for _ in range(2)),
                key=lambda t: t[0],
            )
            results[on] = (wall, rows)
        assert results[True][1] == results[False][1], "ON/OFF results differ"
        on_w, off_w = results[True][0], results[False][0]
        print(
            f"{label}: bloom ON {on_w:.2f}s  OFF {off_w:.2f}s  "
            f"speedup {off_w / on_w:.2f}x  ({len(results[True][1])} rows)"
        )


if __name__ == "__main__":
    main()
