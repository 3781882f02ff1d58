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

Revision metadata carries author + isBasedOn links so the driver
oracles exercise the distance-1 expansion + argmin of
`ConstraintViolationCorrectionLookup.java:128-208` (not just the
distance-0 path):

    author           = 'a' || subj        (one author per entity)
    based_on_rev_id  = parent revision    when rev_id % 7 == 3 else NULL

Because the link points at the previous revision of the SAME entity
and the author is entity-determined, the expansion's same-author
filter keeps every neighbor, and the neighbor's edit shares the main
correction's subject — so co-edit matches, the min-revision argmin,
two-statement corrections, the >1-extra collapse and the target guard
all fire on real rows (≈1/7 of revisions carry a link; the neighbor's
pred/obj coincide with the main statement's ≈1/5 / 1/31 of the time).
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
  SELECT rev_id, subj AS entity, parent_rev_id,
         'a' || subj AS author,
         CASE WHEN rev_id % 7 = 3 THEN parent_rev_id END AS based_on_rev_id
  FROM (
    SELECT rev_id, subj,
           lag(rev_id) OVER (PARTITION BY subj ORDER BY rev_id) AS parent_rev_id
    FROM h_edits
  )
"""

# Revision-metadata CTE body reused by the typed-history oracles
# (type/valueType kernels build their own edit streams but share the
# same author/isBasedOn arithmetic).
REVS_META_SQL_FMT = """
  SELECT rev_id, parent_rev_id,
         'a' || subj AS author,
         CASE WHEN rev_id % 7 = 3 THEN parent_rev_id END AS based_on_rev_id
  FROM (
    SELECT rev_id, subj,
           lag(rev_id) OVER (PARTITION BY subj ORDER BY rev_id) AS parent_rev_id
    FROM {edits}
  )
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
    parent = F.lag("rev_id").over(w)
    return edits.select(
        "rev_id",
        F.col("subj").alias("entity"),
        parent.alias("parent_rev_id"),
        F.concat(F.lit("a"), F.col("subj")).alias("author"),
        F.when(F.col("rev_id") % 7 == 3, parent).cast("long").alias("based_on_rev_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def expansion_sql(
    edits: str = "h_edits",
    revs: str = "h_revs",
    cur: str = "h_cur",
    keyed_by_constraint: bool = False,
    final_select: str | None = None,
) -> str:
    """ANSI-SQL transcription of expansion.expand_corrections +
    filter_still_applied, appended after a kernel CTE named ``kr`` with
    columns (target_subj, target_obj, corr_rev, corr_subj, corr_pred,
    corr_obj, main_op, co_op, property).

    With ``keyed_by_constraint`` the kr CTE additionally carries a
    ``constraint_id`` column which rides through every key and the
    output — the multi-constraint one-pass shape where several
    constraints (possibly on the same property) expand in one plan,
    exactly like Spark's row_key which hashes constraint_id too.

    ``final_select`` replaces the default projection; it reads the
    ``okf`` CTE — one row per expanded correction with the full
    (target/corr/op/has_extra/ex_*) columns plus ``still_ok`` — so
    downstream shapes (baseline evaluation, array comparisons) can be
    transcribed without duplicating the expansion.

    Mirrors `ConstraintViolationCorrectionLookup.java:128-222`:
    distance-0/1 same-author candidate revisions, the target guard, the
    co-edit match on (mainS, mainP-or-mainO), the min-distance group +
    collapse-to-main when >1 extra statement, final revision = min id,
    and the still-applied filter over every statement of the
    correction set.
    """
    cid = "constraint_id, " if keyed_by_constraint else ""
    cid_join = (
        " AND a.constraint_id = kx.constraint_id" if keyed_by_constraint else ""
    )
    return f"""
    , kx AS (
        SELECT DISTINCT {cid}target_subj, target_obj, corr_rev, corr_subj, corr_pred,
               corr_obj, main_op, co_op, property FROM kr
    ), nbp AS (
        SELECT rev_id AS main_r, based_on_rev_id AS cand_rev FROM {revs}
        WHERE based_on_rev_id IS NOT NULL
        UNION ALL
        SELECT based_on_rev_id AS main_r, rev_id AS cand_rev FROM {revs}
        WHERE based_on_rev_id IS NOT NULL
    ), cand_revs AS (
        SELECT kx.*, kx.corr_rev AS cand_rev, 0 AS dist FROM kx
        UNION ALL
        SELECT kx.*, p.cand_rev, 1 AS dist
        FROM kx
        JOIN nbp p ON p.main_r = kx.corr_rev
        JOIN {revs} rm ON rm.rev_id = kx.corr_rev
        JOIN {revs} rc ON rc.rev_id = p.cand_rev
        WHERE rc.author = rm.author
    ), gcand AS (
        SELECT * FROM cand_revs c
        WHERE NOT EXISTS (
          SELECT 1 FROM {edits} e
          WHERE e.rev_id = c.cand_rev AND e.op = c.co_op
            AND e.subj = c.target_subj AND e.pred = c.property
            AND e.obj = c.target_obj)
    ), mt AS (
        SELECT c.*, e.subj AS x_subj, e.pred AS x_pred, e.obj AS x_obj
        FROM gcand c
        JOIN {edits} e ON e.rev_id = c.cand_rev AND e.op = c.co_op
          AND e.subj = c.corr_subj
          AND (e.pred = c.corr_pred OR e.obj = c.corr_obj)
    ), mtm AS (
        SELECT * FROM (
          SELECT mt.*, MIN(dist) OVER (PARTITION BY {cid}target_subj, target_obj,
                 corr_rev, corr_subj, corr_pred, corr_obj, main_op, co_op,
                 property) AS mind
          FROM mt
        ) WHERE dist = mind
    ), ag AS (
        SELECT {cid}target_subj, target_obj, corr_rev, corr_subj, corr_pred, corr_obj,
               main_op, co_op, property,
               COUNT(DISTINCT x_subj || chr(31) || x_pred || chr(31) || x_obj) AS n_extra,
               MIN(cand_rev) AS best_rev,
               MIN(x_subj) AS ex_subj, MIN(x_pred) AS ex_pred, MIN(x_obj) AS ex_obj
        FROM mtm
        GROUP BY {cid}target_subj, target_obj, corr_rev, corr_subj, corr_pred, corr_obj,
                 main_op, co_op, property
    ), fin AS (
        SELECT {("kx.constraint_id, " if keyed_by_constraint else "")}
               kx.target_subj, kx.target_obj, kx.property,
               least(kx.corr_rev, COALESCE(a.best_rev, {MAX_REV})) AS corr_rev,
               kx.corr_subj, kx.corr_pred, kx.corr_obj, kx.main_op, kx.co_op,
               CASE WHEN a.n_extra = 1 THEN 1 ELSE 0 END AS has_extra,
               a.ex_subj, a.ex_pred, a.ex_obj
        FROM kx LEFT JOIN ag a
          ON a.target_subj = kx.target_subj AND a.target_obj = kx.target_obj
         AND a.corr_rev = kx.corr_rev AND a.corr_subj = kx.corr_subj
         AND a.corr_pred = kx.corr_pred AND a.corr_obj = kx.corr_obj
         AND a.main_op = kx.main_op AND a.property = kx.property{cid_join}
    ), okf AS (
        SELECT f.*,
               CASE WHEN ((f.main_op = 'add' AND EXISTS (SELECT 1 FROM {cur} c
                      WHERE c.subj = f.corr_subj AND c.pred = f.corr_pred AND c.obj = f.corr_obj))
                  OR (f.main_op = 'del' AND NOT EXISTS (SELECT 1 FROM {cur} c
                      WHERE c.subj = f.corr_subj AND c.pred = f.corr_pred AND c.obj = f.corr_obj)))
                AND (f.has_extra = 0
                  OR (f.co_op = 'add' AND EXISTS (SELECT 1 FROM {cur} c
                      WHERE c.subj = f.ex_subj AND c.pred = f.ex_pred AND c.obj = f.ex_obj))
                  OR (f.co_op = 'del' AND NOT EXISTS (SELECT 1 FROM {cur} c
                      WHERE c.subj = f.ex_subj AND c.pred = f.ex_pred AND c.obj = f.ex_obj)))
               THEN 1 ELSE 0 END AS still_ok
        FROM fin f
    )
    """ + (
        final_select
        or f"SELECT DISTINCT {cid}target_subj, target_obj, corr_rev FROM okf WHERE still_ok = 1"
    )
