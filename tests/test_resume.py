"""Resumability (north rule): rerun after a kill == single run; audit
table carries per-partition lineage + metrics."""

from __future__ import annotations

import shutil

import pytest

from corhist_spark.pipeline import run_full_pipeline
from corhist_spark.storage import Warehouse, run_resumable


def _run(spark, corpus, sdf, root, run_id="r1"):
    return run_full_pipeline(
        spark,
        root,
        sdf["documents"],
        sdf["edits"],
        sdf["revisions"],
        sdf["sameas_edges"],
        corpus["constraints"],
        run_id=run_id,
    )


def _snapshot(out):
    snap = {}
    for name, df in out.items():
        cols = sorted(df.columns)
        rows = {tuple(repr(r[c]) for c in cols) for r in df.collect()}
        snap[name] = rows
    return snap


@pytest.fixture(scope="module")
def warehouse_runs(spark, corpus, sdf, tmp_path_factory):
    a = str(tmp_path_factory.mktemp("wh_a"))
    b = str(tmp_path_factory.mktemp("wh_b"))
    full = _snapshot(_run(spark, corpus, sdf, a))

    # simulate a kill after the first three stages: run only a prefix
    wh = Warehouse(spark, b)
    from corhist_spark.kernels import correction_candidates, prepare_constraints
    from corhist_spark.canonicalize import interval_closure
    from corhist_spark.state import build_state

    def s_state(done):
        return build_state(sdf["edits"])

    def s_closure(done):
        return interval_closure(done["state"])

    run_resumable(wh, "partial", [("state", s_state), ("closure", s_closure)])
    # now the "restart": full pipeline over the same warehouse
    resumed = _snapshot(_run(spark, corpus, sdf, b, run_id="r2"))
    return a, full, resumed


def test_resume_equals_single_run(warehouse_runs):
    _, full, resumed = warehouse_runs
    assert set(full) == set(resumed)
    for name in full:
        assert full[name] == resumed[name], f"stage {name} differs after resume"


def test_rerun_is_idempotent(spark, corpus, sdf, warehouse_runs):
    a, full, _ = warehouse_runs
    again = _snapshot(_run(spark, corpus, sdf, a, run_id="r3"))
    assert again == full


def test_audit_has_per_partition_lineage(spark, warehouse_runs):
    a, full, _ = warehouse_runs
    audit = Warehouse(spark, a).audit()
    rows = audit.collect()
    stages = {r.stage for r in rows}
    assert {"state", "closure", "candidates", "corrections", "triples"} <= stages
    for r in rows:
        assert r.run_id and r.seconds >= 0 and r.rows >= 0
        assert r.partition_id is not None


def test_snapshot_delta_hand_checked(spark):
    """CDC diff: added/removed/changed classified exactly, unchanged
    rows absent (churn-sized output)."""
    from corhist_spark.storage import snapshot_delta

    cur = spark.createDataFrame(
        [(1, "same"), (2, "new text"), (3, "fresh doc")],
        "doc_id long, text string",
    )
    prev = spark.createDataFrame(
        [(1, "same"), (2, "old text"), (9, "gone doc")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["change"] for r in snapshot_delta(cur, prev).collect()}
    assert got == {2: "changed", 3: "added", 9: "removed"}  # 1 absent
