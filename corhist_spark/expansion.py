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

Shuffle budget: the target guard and the co-edit match are ONE join
against ``edits`` (keyed on the candidate revision + op), with the
guard evaluated as a per-candidate aggregate instead of a second
anti-join — and both predicates pushed into the join condition, so
only edits that can affect the aggregate ever reach the groupBy
shuffle (at sf1 this cuts the intermediate from candidates x
co-op-edits-per-revision, hundreds of millions of rows, to the
matching pairs).  The min-distance window and the per-row aggregate
share the ``row_key`` partitioning, so the whole expansion costs one
edits join + one groupBy + one window.  The kernel output is
localCheckpoint-ed (DISK_ONLY — candidate sets reach ~1e8 rows at
sf1) so the (much deeper) kernel plan is computed once, not once per
downstream consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

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
    # cut the kernel lineage once: `rows` feeds both the candidate fan-
    # out and the final re-join, and the still-applied filter downstream.
    # DISK_ONLY: the candidate set can be huge (98M rows for the sf1
    # unique kernel — value-keyed joins are quadratic on hot values);
    # deserialized in-memory blocks at that size GC-thrash an 8g heap,
    # while serialized disk blocks stream back fine.  (r6 re-validated
    # this the hard way: MEMORY_AND_DISK — serialized in PySpark — still
    # heap-OOMs the sf1 run when the ~5 GB of candidate blocks are
    # pulled back through maybeCacheDiskBytesInMemory under storage
    # pressure; the local saving was within noise, so DISK_ONLY stays.)
    # On a cluster this lineage cut would be a warehouse write;
    # executor-local disk is the local-mode equivalent.
    rows = rows.join(main_author, "corr_rev", "left").localCheckpoint(
        storageLevel=StorageLevel.DISK_ONLY
    )

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

    # ONE join against edits per candidate revision, keyed on
    # (cand_rev, co_op); the target guard and the co-edit match are
    # both evaluated on the joined rows and folded in one aggregate
    ed = edits.select(
        F.col("rev_id").alias("e_rev"),
        F.col("op").alias("e_op"),
        F.col("subj").alias("e_subj"),
        F.col("pred").alias("e_pred"),
        F.col("obj").alias("e_obj"),
    )
    is_guard = (
        (F.col("e_subj") == F.col("target_subj"))
        & (F.col("e_pred") == F.col("property"))
        & (F.col("e_obj") == F.col("target_obj"))
    )
    is_co = (F.col("e_subj") == F.col("corr_subj")) & (
        (F.col("e_pred") == F.col("corr_pred")) | (F.col("e_obj") == F.col("corr_obj"))
    )
    # the guard/co-edit predicates are pushed INTO the join: only edits
    # that can affect the aggregate survive the match.  Result-identical
    # — a (row_key, cand_rev) group whose joined edits all fail both
    # predicates would aggregate to guarded=0 + empty co_arr and be
    # dropped by the `matched` filter anyway — but the intermediate
    # volume drops from candidates x all-co-op-edits-per-revision
    # (hundreds of millions of rows at sf1) to just the matching pairs
    # before the groupBy shuffle.
    j = cands.join(
        ed,
        (F.col("e_rev") == F.col("cand_rev"))
        & (F.col("e_op") == F.col("co_op"))
        & (is_guard | is_co),
    )
    co_stmt = F.when(
        is_co,
        F.struct(
            F.col("e_subj").alias("subj"),
            F.col("e_pred").alias("pred"),
            F.col("e_obj").alias("obj"),
            F.col("co_op").alias("op"),
        ),
    )
    per_cand = j.groupBy("row_key", "cand_rev", "dist").agg(
        F.max(is_guard.cast("int")).alias("guarded"),
        F.array_distinct(F.collect_list(co_stmt)).alias("co_arr"),  # nulls skipped
    )
    matched = per_cand.filter((F.col("guarded") == 0) & (F.size("co_arr") > 0))

    # keep only the minimum-distance group per row (`:179-201`); the
    # window and the aggregate below reuse the row_key partitioning
    w = Window.partitionBy("row_key")
    matched = matched.withColumn("min_dist", F.min("dist").over(w)).filter(
        F.col("dist") == F.col("min_dist")
    )
    agg = matched.groupBy(F.col("row_key").alias("agg_key")).agg(
        F.min("cand_rev").alias("best_rev"),
        F.array_distinct(F.flatten(F.collect_list("co_arr"))).alias("extra"),
    )

    main_stmt = F.struct(
        F.col("corr_subj").alias("subj"),
        F.col("corr_pred").alias("pred"),
        F.col("corr_obj").alias("obj"),
        F.col("main_op").alias("op"),
    )
    out = (
        rows.join(agg, F.col("row_key") == F.col("agg_key"), "left")
        .drop("agg_key")
        .withColumn(
            "correction",
            F.array_sort(
                F.when(
                    F.col("extra").isNull() | (F.size("extra") > 1),
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
    ok_keys = (
        ex.groupBy(F.col("row_key").alias("ok_key"))
        .agg(F.min(F.col("ok").cast("int")).alias("all_ok"))
        .filter(F.col("all_ok") == 1)
        .select("ok_key")
    )
    return corrections.join(ok_keys, F.col("row_key") == F.col("ok_key"), "left_semi")


def build_corrections(rows: DataFrame, edits: DataFrame, revisions: DataFrame, state: DataFrame) -> DataFrame:
    """Full post-kernel pipeline: expansion then still-applied.  The
    expansion output is checkpointed — still-applied consumes it twice
    (explode + semi-join back) and it is small relative to its plan.
    DISK_ONLY for the same reason as the candidate checkpoint: the
    expanded set is candidate-sized."""
    return filter_still_applied(
        expand_corrections(rows, edits, revisions).localCheckpoint(
            storageLevel=StorageLevel.DISK_ONLY
        ),
        state,
    )
