"""Volume stress harness — the reproducible source for PERF.md's 10x
scale rows.

Replicates one table N times with shifted primary keys (entity keys —
o_custkey, user_id — stay, so per-entity history deepens with volume,
the realistic growth axis) into a temp sf-shaped dir, then times
selected operators warm at 1x and Nx. A scale-safe plan grows
~linearly in wall time; a hidden single-partition stage grows
super-linearly.

Usage: python tools/stress_volume.py [n_copies] [table[:perturb]] [op ...]
Defaults: 10 copies of orders; ts27_scd2_history q60_column_profile.

``table:perturb`` (embeddings only) circular-shifts each clone wave's
embedding vector by the wave index — norm-preserving but decorrelated,
so clones are NOT near-duplicates of their source. Without it, cloning
embeddings creates n_copies exact copies of every vector, which makes
the TRUE near-dup pair set itself grow quadratically (each clone group
of k contributes k(k-1)/2 pairs) — the dup-dense regime, useful for
worst-case stress but not for measuring organic volume growth.

``events:users`` additionally shifts user_id per clone wave — the
KEY-GROWTH axis: 10x distinct users, 10x sessions, 10x streaming
state rows (the default clone keeps entity keys, which deepens
history but leaves session/state cardinality flat — useless for
state-store stress like st21/st22).

``events:horizon`` additionally shifts ts per clone wave by the
corpus time span — the LONG-RUNNING-STREAM axis: same users, 10x
the history depth, 10x sessions per user. This is the axis that
separates bounded from unbounded streaming state: an
all-sessions-in-state form (st21 complete mode) grows its store 10x,
while a gap-closure emitter (st22) holds one live session per key
regardless of horizon.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
# per-table primary key to shift per clone wave (entity/attr columns untouched)
SHIFT_KEY = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
}
DEFAULT_OPS = ["ts27_scd2_history", "q60_column_profile"]


def build_corpus(spark, n_copies: int, table: str, perturb: bool = False,
                 shift_users: bool = False, shift_horizon: bool = False) -> str:
    import tempfile

    tag = "rot" if perturb else ("u" if shift_users else ("h" if shift_horizon else "x"))
    out = os.path.join(
        tempfile.gettempdir(), f"ankaflow_volume_{table}_{n_copies}{tag}"
    )
    target = os.path.join(out, f"{table}.parquet")
    if not os.path.exists(target):
        os.makedirs(out, exist_ok=True)
        for t in ALL_TABLES:
            if t == table:
                continue
            src = os.path.join(BASE, f"{t}.parquet")
            dst = os.path.join(out, f"{t}.parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        from pyspark.sql import functions as F

        base = spark.read.parquet(os.path.join(BASE, f"{table}.parquet"))
        key = SHIFT_KEY[table]
        n_base = base.count()
        copies = base
        for i in range(1, n_copies):
            wave = base.withColumn(key, F.col(key) + i * n_base * 10)
            if shift_horizon and "ts" in base.columns:
                # long-running-stream axis: each wave extends the time
                # horizon by one corpus span (+1 day guard), so every
                # entity accrues n_copies x the session history
                # parquet ts may be NTZ: round-trip through TIMESTAMP
                # (session-tz interpretation is lossless both ways)
                span_us = base.agg(
                    F.expr(
                        "unix_micros(CAST(max(ts) AS TIMESTAMP)) - "
                        "unix_micros(CAST(min(ts) AS TIMESTAMP))"
                    )
                ).collect()[0][0] or 0
                ntz = dict(base.dtypes)["ts"] == "timestamp_ntz"
                shifted = (
                    f"timestamp_micros(unix_micros(CAST(ts AS TIMESTAMP)) + "
                    f"{i} * CAST({span_us + 86400000000} AS BIGINT))"
                )
                wave = wave.withColumn(
                    "ts",
                    F.expr(
                        f"CAST({shifted} AS TIMESTAMP_NTZ)" if ntz else shifted
                    ),
                )
            if shift_users and "user_id" in base.columns:
                # key-growth axis: each wave is a NEW user population,
                # so sessions and streaming state rows scale with volume
                wave = wave.withColumn(
                    "user_id", F.col("user_id") + i * 10_000_000
                )
            if perturb and "embedding" in base.columns:
                # circular-shift by the wave index: same norm, same value
                # histogram, but decorrelated from the source vector —
                # clones are new points, not exact duplicates
                d = i  # shift distance
                wave = wave.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {d + 1}, size(embedding) - {d}), "
                        f"slice(embedding, 1, {d}))"
                    ),
                )
            copies = copies.unionAll(wave)
        copies.write.mode("overwrite").parquet(target)
    return out


def main() -> None:
    import __spark_entry__ as entry

    from ankaflow_spark.session import get_spark

    args = sys.argv[1:]
    n_copies = int(args[0]) if args else 10
    table = args[1] if len(args) > 1 else "orders"
    perturb = table.endswith(":perturb")
    if perturb:
        table = table[: -len(":perturb")]
    shift_users = table.endswith(":users")
    if shift_users:
        table = table[: -len(":users")]
    shift_horizon = table.endswith(":horizon")
    if shift_horizon:
        table = table[: -len(":horizon")]
    ops = args[2:] or DEFAULT_OPS
    spark = get_spark("volume-stress")
    corpus = build_corpus(spark, n_copies, table, perturb, shift_users, shift_horizon)
    qs = entry.queries()
    for name in ops:
        fn = qs[name]
        fn(spark, corpus).count()  # warm (JIT/codegen + table registration)
        t0 = time.time()
        n = fn(spark, corpus).count()
        big = time.time() - t0
        fn(spark, BASE).count()  # warm base
        t0 = time.time()
        fn(spark, BASE).count()
        one = time.time() - t0
        growth = big / one if one > 0 else float("inf")
        print(
            f"{name}  {n_copies}x={big:.2f}s  1x={one:.2f}s  "
            f"growth={growth:.1f}x  rows={n}"
        )


if __name__ == "__main__":
    main()
