"""Edit-history state reconstruction as validity intervals.

The reference delegates "graph at revision r" to its history store's
pre-built ``globalState`` named graphs (queried e.g. at
`corhist/.../dataset/queries/SingleValueQueriesBuilder.java:26-31`).  We
reconstruct the same semantics from the `edits` diff stream as interval
rows: a triple is visible in globalState(g) iff
``from_rev <= g < to_rev``.

Semantics: for each (subj, pred, obj), the *last* op with rev_id <= g
wins ('add' -> visible, 'del' -> not).  This tolerates dirty diff
streams (double adds, orphan deletes) by first collapsing consecutive
duplicate ops, then pairing each surviving 'add' with the next 'del'.

Scale notes: one window per (subj, pred, obj, obj_kind) group — the
shuffle key is fine-grained (no skew: a single triple's history is tiny)
and the same partitioning serves both window steps, so Catalyst runs
them in ONE shuffle stage.  At 100 TB the `edits` table would be
bucketed by subj so downstream as-of joins co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .schemas import MAX_REV

TRIPLE_KEY = ["subj", "pred", "obj", "obj_kind"]


def build_state(edits: DataFrame) -> DataFrame:
    """edits(rev_id, op, subj, pred, obj, obj_kind) -> interval table
    state(subj, pred, obj, obj_kind, from_rev, to_rev)."""
    w = Window.partitionBy(*TRIPLE_KEY).orderBy("rev_id")
    collapsed = (
        edits.select("rev_id", "op", *TRIPLE_KEY)
        .withColumn("prev_op", F.lag("op").over(w))
        .filter((F.col("prev_op").isNull()) | (F.col("prev_op") != F.col("op")))
    )
    intervals = (
        collapsed.withColumn("next_rev", F.lead("rev_id").over(w))
        .filter(F.col("op") == "add")
        .select(
            *TRIPLE_KEY,
            F.col("rev_id").alias("from_rev"),
            F.coalesce(F.col("next_rev"), F.lit(MAX_REV)).alias("to_rev"),
        )
    )
    return intervals


def state_at(state: DataFrame, rev: int) -> DataFrame:
    """Snapshot of the KB right after revision ``rev`` was applied."""
    return state.filter((F.col("from_rev") <= rev) & (F.lit(rev) < F.col("to_rev"))).select(
        "subj", "pred", "obj", "obj_kind"
    )


def current_state(state: DataFrame) -> DataFrame:
    """CURRENT_GLOBAL_STATE (`...Lookup.java:214-216`): open intervals."""
    return state.filter(F.col("to_rev") == MAX_REV).select("subj", "pred", "obj", "obj_kind")


def asof_condition(state_alias: str, rev_col):
    """Join condition matching state rows visible at a per-row revision.

    Use with an equi-key (subj and/or pred) so the planner gets a hash
    join plus a residual range filter, never a pure theta join.
    """
    return (F.col(f"{state_alias}.from_rev") <= rev_col) & (rev_col < F.col(f"{state_alias}.to_rev"))
