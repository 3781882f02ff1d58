"""spark-submit entry point.

    spark-submit --py-files corhist_spark.zip -m corhist_spark.cli \
        --warehouse /data/wh --documents .../documents \
        --edits .../edits --revisions .../revisions \
        --sameas .../sameas_edges --constraints .../constraints.json

Runs the full checkpoint-resumable KG-construction pipeline
(pipeline.run_full_pipeline); rerunning after a kill resumes from the
audit ledger.
"""

from __future__ import annotations

import argparse
import json

import pandas as pd

from .pipeline import run_full_pipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="corhist-spark")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--documents", required=True)
    p.add_argument("--edits", required=True)
    p.add_argument("--revisions", required=True)
    p.add_argument("--sameas", required=True)
    p.add_argument("--constraints", required=True, help="JSON lines of constraint rows")
    p.add_argument("--run-id", default="run")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    spark = get_spark("corhist-pipeline", cores=args.cores)
    constraints_pdf = pd.DataFrame(
        [json.loads(line) for line in open(args.constraints) if line.strip()]
    )
    out = run_full_pipeline(
        spark,
        args.warehouse,
        spark.read.parquet(args.documents),
        spark.read.parquet(args.edits),
        spark.read.parquet(args.revisions),
        spark.read.parquet(args.sameas),
        constraints_pdf,
        run_id=args.run_id,
    )
    for name, df in out.items():
        print(f"{name}: {df.count()} rows")


if __name__ == "__main__":
    main()
