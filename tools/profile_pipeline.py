"""Per-job wall profiler for YAML pipeline flows (r14, guide §1).

Runs one example flow end-to-end with bench.py's exact methodology
(sf0.001 warm pass, caches cleared, noop sink), with every EAGER driver
action — DataFrame.localCheckpoint(eager), DataFrame.count,
DataFrameWriter.parquet/saveAsTable — wrapped to record (caller
file:line, wall seconds). The report is the sequential driver-job
timeline the VERDICT r13 punch item 1 asks for: which of the ~15-20
small jobs inside sem_dedup / dedup_survivors carry the pipeline wall.

Usage:
    python tools/profile_pipeline.py [--sf DIR] [--flow NAME] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS: list = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "profile_pipeline" in fn or "pyspark" in fn or "py4j" in fn:
            continue
        return f"{os.path.basename(fn)}:{fr.lineno} ({fr.name})"
    return "?"


def _wrap(obj, name, label):
    orig = getattr(obj, name)

    def timed(self, *a, **kw):
        t0 = time.time()
        out = orig(self, *a, **kw)
        dt = time.time() - t0
        EVENTS.append((label, _caller(), round(dt, 3)))
        return out

    setattr(obj, name, timed)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--flow", default="dedup_ann_curation")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from bench import input_bytes

    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ:
        parts = max(8, min(2000, input_bytes(args.sf) // (64 * 1024 * 1024)))
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = str(parts)

    # Spark 4 executes through pyspark.sql.classic.dataframe.DataFrame
    # (a subclass of the compat pyspark.sql.DataFrame) — methods must be
    # wrapped on the CLASSIC class or calls bypass the wrapper.
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    from ankaflow_spark.operators import clear_shared_caches, collect_all
    from ankaflow_spark.session import get_spark

    _wrap(DataFrame, "localCheckpoint", "localCheckpoint")
    _wrap(DataFrame, "count", "count")
    _wrap(DataFrame, "first", "first")
    _wrap(DataFrameWriter, "parquet", "write.parquet")
    _wrap(DataFrameWriter, "saveAsTable", "saveAsTable")
    _wrap(DataFrameWriter, "save", "write.save")

    spark = get_spark("profile_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    collect_all()

    import shutil
    import tempfile

    from ankaflow_spark.models.core import Stages
    from ankaflow_spark.plans.flow import Flow
    from ankaflow_spark.session import SparkEngine

    engine = SparkEngine(spark)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "examples", f"{args.flow}.yaml")
    warm_dir = "/root/testdata/sf0.001"

    for rnd in range(args.runs + 1):  # round 0 = warm pass at sf0.001
        data_dir = warm_dir if rnd == 0 else args.sf
        clear_shared_caches(spark)
        EVENTS.clear()
        tmp = tempfile.mkdtemp(prefix="prof_pipe_")
        try:
            variables = {"data_dir": data_dir, "out_dir": tmp, "out": tmp}
            t0 = time.time()
            flow = Flow(Stages.load(path), engine=engine, variables=variables)
            df = flow.run()
            t_run = time.time() - t0
            t1 = time.time()
            if df is not None:
                df.write.format("noop").mode("overwrite").save()
            t_noop = time.time() - t1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        if rnd == 0:
            continue
        print(f"\n=== {args.flow} run {rnd} @ {data_dir}: "
              f"flow.run()={t_run:.2f}s final-noop={t_noop:.2f}s ===")
        print("stage walls:")
        for n, k, s in flow.stage_timings:
            print(f"  {s:7.3f}  {k:9s} {n}")
        print("eager driver actions (sequential timeline):")
        tot = 0.0
        for label, caller, dt in EVENTS:
            tot += dt
            print(f"  {dt:7.3f}  {label:16s} {caller}")
        print(f"  eager-action total: {tot:.2f}s")


if __name__ == "__main__":
    main()
