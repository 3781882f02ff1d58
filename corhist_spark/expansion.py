"""Correction expansion + still-applied filter as one DataFrame
pipeline.

Transcribes `corhist/.../dataset/ConstraintViolationCorrectionLookup.java`:
- expansion queries + argmin post-processing (`:128-208`): find co-edits
  by the same author at isBasedOn-distance <= 1 that share the main
  correction's subject and (predicate OR object), keep the minimum
  distance group, collapse to the main statement alone when more than
  one extra statement survives, final revision = min id,
- still-applied filter (`:210-222`): every add-statement must exist in
  the current state and every del-statement must not.

Reference ambiguity (documented in oracle.py too): the from-addition
expansion query's target guard filters on an *unbound* ``?additions``
graph (`:152-165`); we implement the intended mirror — a candidate
revision is skipped when its *deletions* touched the target triple.

Scale shape: everything is keyed by ``row_key`` (hash of the candidate
row), so the whole pipeline is hash-partitioned joins + one window —
no driver loops, no per-correction queries like the reference's
prepared-statement-per-correction (`:167-208`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kernels import ROW_COLS
from .schemas import MAX_REV


def expand_corrections(rows: DataFrame, edits: DataFrame, revisions: DataFrame) -> DataFrame:
    """rows: candidate output of kernels.correction_candidates ->
    corrections(constraint_id, corr_rev, target_subj, target_pred,
    target_obj, correction array<struct<subj,pred,obj,op>>, row_key)."""
    rows = rows.withColumn(
        "row_key", F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in ROW_COLS]), 256)
    ).withColumn("main_op", F.when(F.col("is_add"), F.lit("add")).otherwise(F.lit("del")))
    rows = rows.withColumn(
        "co_op", F.when(F.col("is_add"), F.lit("del")).otherwise(F.lit("add"))
    )
    main_author = revisions.select(
        F.col("rev_id").alias("corr_rev"), F.col("author").alias("main_author")
    )
    rows = rows.join(main_author, "corr_rev", "left")

    # candidate revisions: distance 0 (the revision itself) and the
    # same-author isBasedOn neighbors at distance 1 (both directions)
    base = rows.select("row_key", "corr_rev", "main_author", "co_op",
                       "property", "target_subj", "target_obj",
                       "corr_subj", "corr_pred", "corr_obj")
    dist0 = base.withColumn("cand_rev", F.col("corr_rev")).withColumn("dist", F.lit(0))
    nb = revisions.filter(F.col("based_on_rev_id").isNotNull()).select(
        F.col("rev_id").alias("nb_a"), F.col("based_on_rev_id").alias("nb_b")
    )
    # prune the whole distance-1 branch when the corpus carries no
    # isBasedOn links at all (cheap driver check; two joins saved)
    if nb.isEmpty():
        cands = dist0
    else:
        pairs = nb.select(F.col("nb_b").alias("main_r"), F.col("nb_a").alias("cand_rev")).union(
            nb.select(F.col("nb_a").alias("main_r"), F.col("nb_b").alias("cand_rev"))
        )
        cand_author = revisions.select(
            F.col("rev_id").alias("cand_rev"), F.col("author").alias("cand_author")
        )
        dist1 = (
            base.join(pairs, base["corr_rev"] == pairs["main_r"])
            .join(cand_author, "cand_rev")
            .filter(F.col("cand_author") == F.col("main_author"))
            .drop("main_r", "cand_author")
            .withColumn("dist", F.lit(1))
        )
        cands = dist0.unionByName(dist1)

    # guard: skip candidate revisions whose co-op graph touched the target
    guard = edits.select(
        F.col("rev_id").alias("gd_rev"),
        F.col("op").alias("gd_op"),
        F.col("subj").alias("gd_subj"),
        F.col("pred").alias("gd_pred"),
        F.col("obj").alias("gd_obj"),
    )
    cands = cands.join(
        guard,
        (F.col("gd_rev") == F.col("cand_rev"))
        & (F.col("gd_op") == F.col("co_op"))
        & (F.col("gd_subj") == F.col("target_subj"))
        & (F.col("gd_pred") == F.col("property"))
        & (F.col("gd_obj") == F.col("target_obj")),
        "left_anti",
    )

    # co-edited statements sharing mainS and (mainP or mainO)
    co = edits.select(
        F.col("rev_id").alias("co_rev"),
        F.col("op").alias("co_op_e"),
        F.col("subj").alias("co_subj"),
        F.col("pred").alias("co_pred"),
        F.col("obj").alias("co_obj"),
    )
    matches = cands.join(
        co,
        (F.col("co_rev") == F.col("cand_rev"))
        & (F.col("co_op_e") == F.col("co_op"))
        & (F.col("co_subj") == F.col("corr_subj"))
        & ((F.col("co_pred") == F.col("corr_pred")) | (F.col("co_obj") == F.col("corr_obj"))),
    )

    # keep only the minimum-distance group per row (`:179-201`)
    w = Window.partitionBy("row_key")
    matches = matches.withColumn("min_dist", F.min("dist").over(w)).filter(
        F.col("dist") == F.col("min_dist")
    )
    agg = matches.groupBy("row_key").agg(
        F.countDistinct("co_subj", "co_pred", "co_obj").alias("n_extra"),
        F.min("cand_rev").alias("best_rev"),
        F.array_distinct(
            F.collect_list(F.struct(
                F.col("co_subj").alias("subj"),
                F.col("co_pred").alias("pred"),
                F.col("co_obj").alias("obj"),
                F.col("co_op_e").alias("op"),
            ))
        ).alias("extra"),
    )

    main_stmt = F.struct(
        F.col("corr_subj").alias("subj"),
        F.col("corr_pred").alias("pred"),
        F.col("corr_obj").alias("obj"),
        F.col("main_op").alias("op"),
    )
    out = (
        rows.join(agg, "row_key", "left")
        .withColumn(
            "correction",
            F.array_sort(
                F.when(
                    F.col("n_extra").isNull() | (F.col("n_extra") > 1),
                    F.array(main_stmt),
                ).otherwise(F.array_append(F.col("extra"), main_stmt))
            ),
        )
        .withColumn(
            "corr_rev_final",
            F.least(F.col("corr_rev"), F.coalesce(F.col("best_rev"), F.lit(MAX_REV))),
        )
        .select(
            "row_key",
            "constraint_id",
            F.col("corr_rev_final").alias("corr_rev"),
            "target_subj",
            F.col("property").alias("target_pred"),
            "target_obj",
            "correction",
        )
    )
    return out


def filter_still_applied(corrections: DataFrame, state: DataFrame) -> DataFrame:
    """`...Lookup.java:210-222`: add-statements must be in the current
    state, del-statements must not."""
    cur = (
        state.filter(F.col("to_rev") == MAX_REV)
        .select(
            F.col("subj").alias("cs_subj"),
            F.col("pred").alias("cs_pred"),
            F.col("obj").alias("cs_obj"),
        )
        .distinct()
    )
    ex = corrections.select("row_key", F.explode("correction").alias("stmt"))
    ex = ex.join(
        cur,
        (F.col("stmt.subj") == F.col("cs_subj"))
        & (F.col("stmt.pred") == F.col("cs_pred"))
        & (F.col("stmt.obj") == F.col("cs_obj")),
        "left",
    ).withColumn(
        "ok",
        F.when(F.col("stmt.op") == "add", F.col("cs_subj").isNotNull()).otherwise(
            F.col("cs_subj").isNull()
        ),
    )
    ok_keys = ex.groupBy("row_key").agg(F.min(F.col("ok").cast("int")).alias("all_ok")).filter(
        F.col("all_ok") == 1
    )
    return corrections.join(ok_keys.select("row_key"), "row_key", "left_semi")


def build_corrections(rows: DataFrame, edits: DataFrame, revisions: DataFrame, state: DataFrame) -> DataFrame:
    """Full post-kernel pipeline: expansion then still-applied."""
    return filter_still_applied(expand_corrections(rows, edits, revisions), state)
