#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query isolation with
the noop sink, min-of-N timing identical to bench.py's methodology,
and `.explain("formatted")` capture for the plan evidence in
plans/r06/.  bench.py is FROZEN for measurement — extra benchmarks
live here (OPTIMIZATION_r06.md cites these numbers; the driver's
official numbers come from bench.py).

Usage:
  python bench_extra.py time  q1,q2,...   [repeats]
  python bench_extra.py plan  q1,q2,...   [outdir=plans/r06] [suffix=before]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from corhist_spark.session import get_spark


def _boot():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("corhist-bench-extra", cores=cores)
    spark.range(10).count()
    # same warm shared inputs as bench.py
    entry_mod._hist(spark, sf_dir)
    entry_mod._signatures(spark, sf_dir)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(cores * 4).repartition(cores * 4).select(_warm("id")).count()
    return spark, sf_dir


def main() -> None:
    mode = sys.argv[1]
    names = [q.strip() for q in sys.argv[2].split(",") if q.strip()]
    spark, sf_dir = _boot()
    qs = entry_mod.queries()
    unknown = [q for q in names if q not in qs]
    if unknown:
        raise SystemExit(f"not in queries(): {unknown}")

    if mode == "time":
        repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        timings = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            print(json.dumps({name: timings[name]}), flush=True)
        print(json.dumps({"total": round(sum(timings.values()), 3), "queries": timings}))
    elif mode == "plan":
        outdir = sys.argv[3] if len(sys.argv) > 3 else "plans/r06"
        suffix = sys.argv[4] if len(sys.argv) > 4 else "before"
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
