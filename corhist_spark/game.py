"""Online serving path (game.Main reduced scope, SURVEY §3.3):
apply mined rules to live constraint violations over an entity
snapshot, filter to still-applicable edits, and select game tiles.

Transcribes:
- `corhist/.../game/CorrectionLookup.java:56-84`: rules are applied
  with the ``?g`` context var dropped (live snapshots have no history
  graph); the violating value comes from the statement node's ``ps:``
  edge; first matching rule by (confidence, support) rank wins.
- `game/ApplicableEditChecker.java:37-94`: an edit is applicable iff
  its removed claim still exists and its created claim is not already
  present — expressed as semi/anti joins against the snapshot instead
  of live API calls.
- `game/ConstraintCorrectionsGame.java:49-66`: fetch 2x the requested
  tiles in random order (seeded here), filter applicability, limit.

The snapshot models the statement-node layout of the reference's smoke
test (`CorrectionLookup.java:86-102`): rows (subj, pred, obj) with
``p:``-edges entity->statement-node, ``ps:``-edges statement->value and
``wdt:`` direct edges, encoded as pred prefixes 'p:', 'ps:', '' (direct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_possible_corrections(
    rules: DataFrame, violations: DataFrame, snapshot: DataFrame
) -> DataFrame:
    """violations(violation_id, entity, property, statement_id,
    constraint_id) x snapshot(subj, pred, obj) -> + predicted
    correction (array<struct<subj,pred,obj,op>>, NULL when no rule
    fires).

    The violating object is resolved via the statement node
    (`statement ps:prop ?o`), mirroring `CorrectionLookup.java:69-71`.
    """
    ps = snapshot.filter(F.col("pred").startswith("ps:")).select(
        F.col("subj").alias("ps_stmt"),
        F.expr("substr(pred, 4)").alias("ps_prop"),
        F.col("obj").alias("target_obj"),
    )
    v = violations.join(
        ps,
        (F.col("statement_id") == F.col("ps_stmt")) & (F.col("property") == F.col("ps_prop")),
    ).select("violation_id", "entity", "property", "statement_id", "constraint_id", "target_obj")

    r = F.broadcast(
        rules.select("rule_id", "constraint_id", "violation_obj", "head", "context", "support", "confidence")
    )
    m = v.join(
        r,
        (v["constraint_id"] == r["constraint_id"])
        & (r["violation_obj"].isNull() | (r["violation_obj"] == v["target_obj"])),
    ).drop(r["constraint_id"])

    # context atoms evaluated on the snapshot with ?g dropped
    # (`removeContext`, `CorrectionLookup.java:56-66`)
    m = m.withColumn("atom", F.explode_outer("context"))
    direct = snapshot.filter(~F.col("pred").contains(":")).select(
        F.col("subj").alias("sn_subj"), F.col("pred").alias("sn_pred"), F.col("obj").alias("sn_obj")
    )
    val = F.when(F.col("atom.var") == "?s", F.col("entity")).otherwise(F.col("target_obj"))
    sat = (
        m.filter(F.col("atom").isNotNull())
        .join(
            direct,
            (F.col("sn_subj") == val)
            & (F.col("sn_pred") == F.col("atom.pred"))
            & ((F.col("atom.obj") == "?v") | (F.col("sn_obj") == F.col("atom.obj"))),
            "left_semi",
        )
        .select("violation_id", "rule_id")
    )
    ok = (
        m.filter(F.col("atom").isNull())
        .select("violation_id", "rule_id", "head", "support", "confidence")
        .unionByName(
            m.filter(F.col("atom").isNotNull())
            .join(sat, ["violation_id", "rule_id"], "left_semi")
            .select("violation_id", "rule_id", "head", "support", "confidence")
        )
    )
    w = Window.partitionBy("violation_id").orderBy(
        F.desc("confidence"), F.desc("support"), F.asc("rule_id")
    )
    first = ok.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    first = first.join(
        v.select("violation_id", F.col("entity").alias("e2"), F.col("target_obj").alias("o2")),
        "violation_id",
    ).withColumn(
        "predicted",
        F.array_sort(
            F.transform(
                "head",
                lambda p: F.struct(
                    F.when(p["subj"] == "?s", F.col("e2")).when(p["subj"] == "?o", F.col("o2")).otherwise(p["subj"]).alias("subj"),
                    p["pred"].alias("pred"),
                    F.when(p["obj"] == "?s", F.col("e2")).when(p["obj"] == "?o", F.col("o2")).otherwise(p["obj"]).alias("obj"),
                    p["op"].alias("op"),
                ),
            )
        ),
    )
    return v.join(first.select("violation_id", "predicted"), "violation_id", "left")


def filter_applicable(predictions: DataFrame, snapshot: DataFrame) -> DataFrame:
    """`ApplicableEditChecker` as set logic: every del-statement must
    exist in the snapshot's direct edges, every add-statement must
    not."""
    direct = snapshot.filter(~F.col("pred").contains(":")).select(
        F.col("subj").alias("sn_subj"), F.col("pred").alias("sn_pred"), F.col("obj").alias("sn_obj")
    )
    ex = predictions.filter(F.col("predicted").isNotNull()).select(
        "violation_id", F.explode("predicted").alias("stmt")
    )
    ex = ex.join(
        direct,
        (F.col("stmt.subj") == F.col("sn_subj"))
        & (F.col("stmt.pred") == F.col("sn_pred"))
        & (F.col("stmt.obj") == F.col("sn_obj")),
        "left",
    ).withColumn(
        "ok",
        F.when(F.col("stmt.op") == "del", F.col("sn_subj").isNotNull()).otherwise(
            F.col("sn_subj").isNull()
        ),
    )
    ok_ids = (
        ex.groupBy("violation_id")
        .agg(F.min(F.col("ok").cast("int")).alias("all_ok"))
        .filter(F.col("all_ok") == 1)
        .select("violation_id")
    )
    return predictions.join(ok_ids, "violation_id", "left_semi")


def queue_stats(log: DataFrame) -> DataFrame:
    """`game/ViolationDatabase.java:175-191` (countByTypeStateAndUser):
    counts per (constraint_type, state, user_id) over the action log,
    plus the '*' row per (constraint_type, state) cell aggregating ALL
    rows including NULL users — the exact shape
    `scripts/game_stats.py:20-32` consumes."""
    per_user = (
        log.filter(F.col("user_id").isNotNull())
        .groupBy("constraint_type", "state", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    star = (
        log.groupBy("constraint_type", "state")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("constraint_type", "state", F.lit("*").alias("user_id"), "n")
    )
    return per_user.unionByName(star)


def approval_summary(stats: DataFrame) -> DataFrame:
    """`scripts/game_stats.py:20-32`: per constraint type, total tiles
    over all states, approved ('a'), rejected ('r') and the approval
    ratio rounded to 2 dp (NULL when nothing was decided)."""
    s = stats.filter(F.col("user_id") == "*")
    agg = s.groupBy("constraint_type").agg(
        F.sum("n").alias("all_n"),
        F.sum(F.when(F.col("state") == "a", F.col("n")).otherwise(0)).alias("approved"),
        F.sum(F.when(F.col("state") == "r", F.col("n")).otherwise(0)).alias("rejected"),
    )
    decided = F.col("approved") + F.col("rejected")
    return agg.withColumn(
        "ratio", F.when(decided > 0, F.round(F.col("approved") / decided, 2))
    )


def select_tiles(
    predictions: DataFrame, snapshot: DataFrame, count: int, seed: int = 42
) -> DataFrame:
    """`ConstraintCorrectionsGame.java:49-66`: fetch 2x count tiles in
    random order BEFORE the applicability check (the oversample exists
    because the filter discards tiles), then filter and take count;
    cap 30/request (`game/Main.java:49`)."""
    count = min(count, 30)
    sample = predictions.filter(F.col("predicted").isNotNull()).orderBy(F.rand(seed)).limit(2 * count)
    return filter_applicable(sample, snapshot).limit(count)
