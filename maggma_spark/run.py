"""CLI pipeline runner — the `mrun` equivalent.

Reference parity: `mrun builder.json` (reference:src/maggma/cli/
__init__.py:105-228). The -n workers / serial / distributed mode flags
disappear: Spark is the execution engine; `--cpus` sizes the local
master, and on a cluster you submit this module with spark-submit
against your cluster master instead.

Usage:
    python -m maggma_spark.run pipeline.json [--cpus 8] [--report out.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="maggma-spark-run")
    ap.add_argument("spec", help="pipeline spec JSON file")
    ap.add_argument("--cpus", default=None, help="local[N] cores")
    ap.add_argument("--report", default=None,
                    help="write per-builder report records (JSON lines)")
    args = ap.parse_args(argv)

    import os

    if args.cpus:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from maggma_spark.plans.pipeline import PipelineRunner
    from maggma_spark.session import get_spark

    spark = get_spark("maggma_spark-run")
    runner = PipelineRunner(spark).load(args.spec)

    sink = open(args.report, "a") if args.report else None
    try:
        reports = runner.run(
            reporter=(lambda rec: sink.write(json.dumps(rec) + "\n"))
            if sink else None)
    finally:
        if sink:
            sink.close()
    for rec in reports:
        print(json.dumps(rec))
    return 0 if all(r["state"] == "successful" for r in reports) else 1


if __name__ == "__main__":
    sys.exit(main())
