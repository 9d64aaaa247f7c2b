"""Band-index maintenance economics — the reproducible source for
PERF.md's d33/d34 amortization row.

On the dup-dense N x documents corpus (tools/stress_dupdense's clone
layout — every doc has N-1 identical twins, so the index is worst-case
hot), measures the three costs the d33/d34 design trades between:

  * bands        — materializing the shared band relation (paid once
                   per corpus snapshot by ANY near-dup path),
  * full rebuild — writing the WHOLE merged corpus as a fresh bucketed
                   index (what every day costs WITHOUT d34's merge),
  * merge        — bucketed APPEND of one day's batch (d34's upkeep),
  * probe        — the day-2 batch probe against the merged index
                   (d33's recurring cost).

The claim under test: merge ~ O(|batch|) and probe ~ O(|batch| +
corpus-scan) while rebuild ~ O(|corpus|) — so at 100 TB the
maintenance loop wins by the corpus/batch ratio, paying only the
documented small-file compaction cadence.

Usage: python tools/stress_bandindex.py [n_copies]   (default 20)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ankaflow_spark.operators import clear_shared_caches
    from ankaflow_spark.operators.dedup import (
        _D33_KEY_COLS,
        D33_NEW_MOD,
        D33_NEW_REM,
        D34_DAY2_REM,
        band_probe_sql,
        cached_bands,
    )
    from ankaflow_spark.operators.tables import load_tables
    from ankaflow_spark.session import SparkEngine, get_spark
    from tools.stress_dupdense import build_corpus

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("bandindex-stress")
    corpus_dir = build_corpus(spark, n_copies)
    load_tables(spark, corpus_dir)
    clear_shared_caches(spark)

    t0 = time.time()
    cached_bands(spark, corpus_dir)
    t_bands = time.time() - t0
    n_bands = spark.table("__bands__").count()

    engine = SparkEngine(spark)

    def write_index(pred: str, table: str) -> float:
        df = spark.sql(f"SELECT * FROM __bands__ WHERE {pred}")
        t0 = time.time()
        engine.write_bucketed(
            df, table, _D33_KEY_COLS, n_buckets=16, sort_cols=_D33_KEY_COLS
        )
        return time.time() - t0

    # day-0 index (corpus without day-1/day-2)
    t_day0 = write_index(
        f"doc_id % {D33_NEW_MOD} NOT IN ({D33_NEW_REM}, {D34_DAY2_REM})",
        "sbi_index",
    )
    # what a rebuild-every-day policy pays: the merged corpus rewritten
    t_rebuild = write_index(
        f"doc_id % {D33_NEW_MOD} <> {D34_DAY2_REM}", "sbi_rebuilt"
    )
    # d34's policy: append ONLY the day-1 batch
    t0 = time.time()
    (
        spark.sql(
            f"SELECT * FROM __bands__ WHERE doc_id % {D33_NEW_MOD} = {D33_NEW_REM}"
        )
        .write.mode("append")
        .bucketBy(16, *_D33_KEY_COLS)
        .sortBy(*_D33_KEY_COLS)
        .format("parquet")
        .saveAsTable("sbi_index")
    )
    t_merge = time.time() - t0
    # the recurring probe (day-2 batch vs merged index)
    spark.sql(
        f"SELECT * FROM __bands__ WHERE doc_id % {D33_NEW_MOD} = {D34_DAY2_REM}"
    ).createOrReplaceTempView("__sbi_batch__")
    t0 = time.time()
    n_verdicts = spark.sql(
        band_probe_sql("__sbi_batch__"), b=spark.table("sbi_index").hint("merge")
    ).count()
    t_probe = time.time() - t0
    assert (
        spark.table("sbi_index").count() == spark.table("sbi_rebuilt").count()
    ), "merged index != rebuilt index"
    print(
        f"band-index[{n_copies}x]  bands={n_bands} rows {t_bands:.1f}s  "
        f"day0-build={t_day0:.1f}s  daily-rebuild={t_rebuild:.1f}s  "
        f"d34-merge={t_merge:.1f}s ({t_rebuild / max(t_merge, 1e-9):.1f}x cheaper)  "
        f"d33-probe={t_probe:.1f}s  verdicts={n_verdicts}"
    )


if __name__ == "__main__":
    main()
