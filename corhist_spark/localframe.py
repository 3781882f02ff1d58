"""Arrow-backed construction of driver-small DataFrames.

``spark.createDataFrame(list_of_rows)`` plants a pickled Python-RDD
scan into the plan: every job that evaluates the frame — a broadcast
build, a ``collect`` of constraint metadata, a staging write — round-
trips through a Python worker (~0.3-0.5 s per job measured on the r6
host, ~5 s inside a parquet write).  Routing the same rows through
pandas + Arrow (`spark.sql.execution.arrow.pyspark.enabled`, on in
session.py) yields a JVM-evaluable local relation with identical rows:
guide §4 — keep the Python boundary out of plans that don't need it.

Falls back to the classic path when the rows don't survive the Arrow
conversion (exotic types, Arrow disabled), so callers get the old
behavior at worst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, data, schema) -> DataFrame:
    """Drop-in for ``spark.createDataFrame(data, schema)`` for driver-
    small row lists (dicts or tuples) with an explicit schema."""
    if not data:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd

        if isinstance(data[0], dict):
            pdf = pd.DataFrame.from_records(data)
        else:
            pdf = pd.DataFrame.from_records(list(data))
        out = spark.createDataFrame(pdf, schema=schema)
        # Arrow conversion failures are reported lazily via a fallback
        # inside createDataFrame itself (non-Arrow pandas path), which
        # still avoids the per-row pickle scan; a hard failure here
        # falls through to the classic builder below.
        return out
    except Exception:
        return spark.createDataFrame(data, schema)
