"""Table storage + audit ledger + resume.

The design targets Iceberg (`spark.read.format("iceberg")`, MERGE INTO,
snapshot-based resume) per SURVEY §1.3; this environment has no Iceberg
runtime jar (re-verified rounds 2-5, twice in round 5 — a full-disk
find for iceberg/delta jars and media codecs both come back empty),
so the same semantics run on a
parquet warehouse directory with atomic directory-swap commits:

- a table write goes to ``<table>/.staging-<token>`` and is promoted by
  an atomic rename; readers only ever see complete table versions,
- the ``audit`` table records one row per (stage, partition) with row
  counts and timings — the per-partition lineage + metrics the north
  rule requires,
- resume = anti-join of the pending work units against the audit ledger
  (the reference's stats-file skip, `corhist/.../mining/Main.java:47-48,
  89-91,209-217`): finished stages are skipped on rerun, so a killed
  run re-executes only missing stages and the final tables are
  identical to a single run.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def write(self, table: str, df: DataFrame, mode: str = "overwrite") -> None:
        """Atomic write: stage directory + rename promotion."""
        final = self._path(table)
        staging = f"{final}.staging-{uuid.uuid4().hex[:8]}"
        df.write.format(self.fmt).mode("overwrite").save(staging)
        old = f"{final}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(staging, final)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def read(self, table: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self._path(table))

    # ---- audit ledger ----------------------------------------------------

    def _audit_path(self) -> str:
        p = os.path.join(self.root, "_audit")
        os.makedirs(p, exist_ok=True)
        return p

    def log_stage(self, run_id: str, stage: str, df: DataFrame) -> DataFrame:
        """Materialize a stage and record per-partition lineage+metrics.

        Returns the materialized DataFrame.  The per-partition row
        counts come from a single pass (spark_partition_id groupBy) —
        cheap relative to the stage itself.
        """
        t0 = time.time()
        self.write(stage, df)
        out = self.read(stage)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        dt = time.time() - t0
        rows = [
            {
                "run_id": run_id,
                "stage": stage,
                "partition_id": int(r.partition_id),
                "rows": int(r.rows),
                "seconds": round(dt, 3),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            for r in per_part
        ] or [
            {
                "run_id": run_id,
                "stage": stage,
                "partition_id": -1,
                "rows": 0,
                "seconds": round(dt, 3),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        ]
        with open(os.path.join(self._audit_path(), f"{stage}-{uuid.uuid4().hex[:8]}.json"), "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        return out

    def audit(self) -> DataFrame:
        return self.spark.read.json(self._audit_path())

    def done_stages(self) -> set[str]:
        p = self._audit_path()
        out = set()
        for fn in os.listdir(p):
            if fn.endswith(".json"):
                out.add(fn.rsplit("-", 1)[0])
        return out


def run_resumable(
    wh: Warehouse, run_id: str, stages: list[tuple[str, "callable"]]
) -> dict[str, DataFrame]:
    """Execute named stages in order, skipping any stage whose output
    table + audit entry already exist (the reference's
    skip-if-done ledger).  Each stage fn receives the dict of completed
    outputs and returns a DataFrame.
    """
    done = wh.done_stages()
    out: dict[str, DataFrame] = {}
    for name, fn in stages:
        if name in done and wh.exists(name):
            out[name] = wh.read(name)
        else:
            out[name] = wh.log_stage(run_id, name, fn(out))
    return out


def snapshot_delta(
    cur: DataFrame, prev: DataFrame, key: str = "doc_id", fp_col: str = "text"
) -> DataFrame:
    """CDC-style diff between two corpus snapshots -> (key, change)
    with change in {'added', 'removed', 'changed'} — the incremental-
    ingest primitive of a periodically re-crawled corpus: downstream
    stages (dedup, quality, indexing) reprocess ONLY the delta instead
    of the whole snapshot.

    Change detection is by md5 fingerprint of ``fp_col``; unchanged
    rows are ABSENT from the output, so the result is churn-sized, not
    corpus-sized.  One full-outer join on the key is the entire plan —
    at warehouse scale both snapshots are bucketed on the key and the
    join is co-located with zero shuffle; with Iceberg this is the
    snapshot-diff read the format provides natively (SURVEY §1.3), and
    this operator is its engine-side equivalent for plain tables."""
    c = cur.select(F.col(key).alias("k"), F.md5(fp_col).alias("fp_cur"))
    p = prev.select(F.col(key).alias("k"), F.md5(fp_col).alias("fp_prev"))
    return (
        c.join(p, "k", "full_outer")
        .select(
            F.col("k").alias(key),
            F.when(F.col("fp_prev").isNull(), F.lit("added"))
            .when(F.col("fp_cur").isNull(), F.lit("removed"))
            .when(F.col("fp_cur") != F.col("fp_prev"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )
