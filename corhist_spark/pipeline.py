"""End-to-end orchestration: edits -> state -> closure -> kernels ->
expansion -> corrections (dataset.Main semantics,
`corhist/.../dataset/Main.java:17-41`), with checkpoint/resume and an
audit ledger (added in pipeline_audit.py helpers below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .canonicalize import interval_closure
from .expansion import build_corrections
from .kernels import correction_candidates, prepare_constraints
from .state import build_state


def run_correction_pipeline(
    spark: SparkSession,
    edits: DataFrame,
    revisions: DataFrame,
    constraints_pdf,
    state: DataFrame | None = None,
    closure: DataFrame | None = None,
) -> DataFrame:
    """Compute the corrections dataset for all constraints in one pass.

    ``constraints_pdf`` is a pandas frame (the constraint table is
    driver-small and broadcast, `SURVEY.md §1.1` row 2).
    """
    if state is None:
        state = build_state(edits).cache()
    if closure is None:
        closure = interval_closure(state)
    cons = prepare_constraints(spark, constraints_pdf)
    rows = correction_candidates(edits, revisions, state, closure, cons)
    return build_corrections(rows, edits, revisions, state)
