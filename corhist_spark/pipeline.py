"""End-to-end orchestration: edits -> state -> closure -> kernels ->
expansion -> corrections (dataset.Main semantics,
`corhist/.../dataset/Main.java:17-41`), with checkpoint/resume and an
audit ledger (added in pipeline_audit.py helpers below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canonicalize import canonicalize_triples, connected_components, interval_closure
from .expansion import build_corrections
from .extract import aggregate_triples, extract_triples
from .kernels import SAMPLING_THRESHOLD, correction_candidates, prepare_constraints
from .state import build_state
from .storage import Warehouse, run_resumable


def run_correction_pipeline(
    spark: SparkSession,
    edits: DataFrame,
    revisions: DataFrame,
    constraints_pdf,
    state: DataFrame | None = None,
    closure: DataFrame | None = None,
    sampling_threshold: int = SAMPLING_THRESHOLD,
) -> DataFrame:
    """Compute the corrections dataset for all constraints in one pass.

    ``constraints_pdf`` is a pandas frame (the constraint table is
    driver-small and broadcast, `SURVEY.md §1.1` row 2).
    ``sampling_threshold`` feeds the reference's per-constraint modulo
    sampling guard (kernels.SAMPLING_THRESHOLD).
    """
    if state is None:
        state = build_state(edits).cache()
    if closure is None:
        closure = interval_closure(state)
    cons = prepare_constraints(spark, constraints_pdf)
    rows = correction_candidates(
        edits, revisions, state, closure, cons, sampling_threshold
    )
    return build_corrections(rows, edits, revisions, state)


def run_full_pipeline(
    spark: SparkSession,
    warehouse_root: str,
    documents: DataFrame,
    edits: DataFrame,
    revisions: DataFrame,
    sameas_edges: DataFrame,
    constraints_pdf,
    run_id: str = "run",
) -> dict[str, DataFrame]:
    """The complete KG-construction flow (north rule), checkpoint-
    resumable: every stage is written to the warehouse with audit rows;
    a rerun after a kill skips finished stages (run_resumable) and ends
    in identical tables.

    documents -> triples -> canonicalize; edits -> state/closure ->
    corrections.  All stages stay declarative DataFrame plans; the
    warehouse boundary doubles as the lineage cut between them.
    """
    wh = Warehouse(spark, warehouse_root)

    def s_state(done):
        return build_state(edits)

    def s_closure(done):
        return interval_closure(done["state"])

    def s_candidates(done):
        cons = prepare_constraints(spark, constraints_pdf)
        return correction_candidates(edits, revisions, done["state"], done["closure"], cons)

    def s_corrections(done):
        return build_corrections(done["candidates"], edits, revisions, done["state"])

    def s_triples(done):
        return aggregate_triples(extract_triples(documents))

    def s_components(done):
        return connected_components(sameas_edges)

    def s_canonical(done):
        return (
            canonicalize_triples(done["triples"], done["components"])
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("evidence").alias("evidence"), F.max("score").alias("score"))
        )

    stages = [
        ("state", s_state),
        ("closure", s_closure),
        ("candidates", s_candidates),
        ("corrections", s_corrections),
        ("triples", s_triples),
        ("components", s_components),
        ("canonical_triples", s_canonical),
    ]
    return run_resumable(wh, run_id, stages)
