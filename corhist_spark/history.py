"""Deterministic edit-history derivation from the driver's `events`
table.

The driver's DuckDB correctness harness runs on the TPC-H-ish parquet
tables only, so the corhist-shaped operators (state reconstruction,
constraint kernels) are exercised over a synthetic edit history derived
*identically* in Spark (here, DataFrame API) and in ANSI SQL (the
`oracle_sql` strings).  The mapping uses only integer arithmetic on
event_id/user_id so both engines produce byte-identical rows:

    rev_id = event_id
    subj   = 'Q' || user_id            (entity page)
    pred   = 'P' || event_id % 5
    obj    = 'V' || event_id % 31
    op     = 'del' if event_id % 4 == 0 else 'add'

A triple space of 155 per entity and ~25% deletes gives realistic
add/del/re-add alternations, orphan deletes and double adds — the
state builder's dirty-stream semantics (last op wins) are exercised
for real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .schemas import MAX_REV

# SQL fragments shared by every oracle query (DuckDB dialect-neutral).
EDITS_SQL = """
  SELECT event_id AS rev_id,
         CASE WHEN event_id % 4 = 0 THEN 'del' ELSE 'add' END AS op,
         'Q' || CAST(user_id AS VARCHAR) AS subj,
         'P' || CAST(event_id % 5 AS VARCHAR) AS pred,
         'V' || CAST(event_id % 31 AS VARCHAR) AS obj
  FROM events
"""

REVS_SQL = """
  SELECT rev_id, subj AS entity,
         lag(rev_id) OVER (PARTITION BY subj ORDER BY rev_id) AS parent_rev_id
  FROM h_edits
"""

INTERVALS_SQL = f"""
  SELECT subj, pred, obj, from_rev, to_rev FROM (
    SELECT subj, pred, obj, op, rev_id AS from_rev,
           COALESCE(lead(rev_id) OVER (PARTITION BY subj, pred, obj ORDER BY rev_id),
                    {MAX_REV}) AS to_rev
    FROM (
      SELECT * FROM (
        SELECT rev_id, op, subj, pred, obj,
               lag(op) OVER (PARTITION BY subj, pred, obj ORDER BY rev_id) AS prev_op
        FROM h_edits
      ) WHERE prev_op IS NULL OR prev_op <> op
    )
  ) WHERE op = 'add'
"""


def with_history_ctes(body: str) -> str:
    """Wrap an oracle query body with the shared derived-history CTEs."""
    return (
        "WITH h_edits AS (" + EDITS_SQL + "),\n"
        "h_revs AS (" + REVS_SQL + "),\n"
        "h_state AS (" + INTERVALS_SQL + "),\n"
        f"h_cur AS (SELECT subj, pred, obj FROM h_state WHERE to_rev = {MAX_REV})\n"
        + body
    )


def derived_edits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id").alias("rev_id"),
        F.when(F.col("event_id") % 4 == 0, F.lit("del")).otherwise(F.lit("add")).alias("op"),
        F.concat(F.lit("Q"), F.col("user_id").cast("string")).alias("subj"),
        F.concat(F.lit("P"), (F.col("event_id") % 5).cast("string")).alias("pred"),
        F.concat(F.lit("V"), (F.col("event_id") % 31).cast("string")).alias("obj"),
        F.lit("iri").alias("obj_kind"),
    )


def derived_revisions(edits: DataFrame) -> DataFrame:
    w = Window.partitionBy("subj").orderBy("rev_id")
    return edits.select(
        "rev_id",
        F.col("subj").alias("entity"),
        F.lag("rev_id").over(w).alias("parent_rev_id"),
        F.concat(F.lit("u"), (F.col("rev_id") % 19).cast("string")).alias("author"),
        F.lit(None).cast("long").alias("based_on_rev_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
