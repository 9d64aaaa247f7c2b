"""CLI: run a YAML pipeline (reference surface: ``ankaflow
pipeline.yaml`` — cli.py; same shape, Spark engine).

    python -m ankaflow_spark pipeline.yaml [--var k=v ...] [--out out.parquet]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ankaflow_spark", description=__doc__)
    parser.add_argument("pipeline", help="YAML pipeline file")
    parser.add_argument("--var", action="append", default=[], help="variable k=v")
    parser.add_argument("--out", help="write final stage to this file (parquet/csv/json)")
    parser.add_argument("--show", type=int, default=0, help="print N rows of the final stage")
    args = parser.parse_args(argv)

    from .models.core import Stages
    from .plans.flow import Flow

    variables = {}
    for kv in args.var:
        k, _, v = kv.partition("=")
        variables[k] = v

    flow = Flow(Stages.load(args.pipeline), variables=variables)
    df = flow.run()
    if df is None:
        print("pipeline produced no output stage", file=sys.stderr)
        return 1
    if args.show:
        df.show(args.show)
    if args.out:
        pdf = df.toPandas()
        if args.out.endswith(".csv"):
            pdf.to_csv(args.out, index=False)
        elif args.out.endswith(".json"):
            pdf.to_json(args.out, orient="records")
        else:
            pdf.to_parquet(args.out, index=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
