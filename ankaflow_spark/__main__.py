"""CLI: run a YAML pipeline (reference surface: ``ankaflow
pipeline.yaml`` — cli.py:37-146; same shape, Spark engine).

    python -m ankaflow_spark pipeline.yaml [--var k=v ...] [--out out.parquet]

Storage connections are configured from environment variables, exactly
as the reference CLI does (cli.py:37-56): AWS_DEFAULT_BUCKET /
AWS_REGION / AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY for S3,
GOOGLE_STORAGE_BUCKET / GS_HMAC_KEY_ID / GS_HMAC_SECRET for GCS,
GOOGLE_CLOUD_PROJECT / GOOGLE_APPLICATION_CREDENTIALS for BigQuery.
The template context exposes ``context.env`` (the environment) and
``context.user`` (from ``--context k=v``).
"""

from __future__ import annotations

import argparse
import os
import sys


def _parse_keyvals(pairs):
    out = {}
    for kv in pairs:
        k, sep, v = kv.partition("=")
        if not sep:
            raise SystemExit(f"invalid key=value: {kv!r}")
        out[k] = v
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ankaflow_spark", description=__doc__)
    parser.add_argument("pipeline", help="YAML pipeline file")
    parser.add_argument("--var", action="append", default=[], help="variable k=v")
    parser.add_argument("--context", action="append", default=[], help="context k=v")
    parser.add_argument("--out", help="write final stage to this file (parquet/csv/json)")
    parser.add_argument("--show", type=int, default=0, help="print N rows of the final stage")
    args = parser.parse_args(argv)

    from .models.configs import ConnectionConfiguration
    from .models.core import Stages
    from .plans.flow import Flow

    variables = _parse_keyvals(args.var)
    context = {"env": dict(os.environ), "user": _parse_keyvals(args.context)}

    flow = Flow(
        Stages.load(args.pipeline),
        context=context,
        variables=variables,
        conn_config=ConnectionConfiguration.from_env(),
    )
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
