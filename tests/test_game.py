"""Game path tests, including a transcription of the reference's
hard-coded smoke test (`game/CorrectionLookup.java:86-102`): entity Q42
with a wrong P21 value on statement node Q42-error; mined rules must
propose the deletion, and edit synthesis must build a wbremoveclaims."""

from __future__ import annotations

from pyspark.sql import functions as F

from corhist_spark.edits_out import build_edits
from corhist_spark.game import build_possible_corrections, filter_applicable, select_tiles
from corhist_spark.mining import mine_basic_rules
from corhist_spark.schemas import CORRECTIONS, REVISIONS


def _rules(spark):
    """Mine a 'delete the violating P21 value' rule from 12 synthetic
    corrections (stand-in for the reference's *.ser rule files)."""
    rows = [
        dict(
            constraint_id="wds:P21-09D3E4D3",
            corr_rev=2 * i + 2,
            target_subj=f"Q{i}",
            target_pred="P21",
            target_obj=f"Q{7000 + i}",
            correction=[dict(subj=f"Q{i}", pred="P21", obj=f"Q{7000 + i}", op="del")],
        )
        for i in range(12)
    ]
    revs = spark.createDataFrame(
        [
            dict(rev_id=2 * i + 2, entity=f"Q{i}", parent_rev_id=2 * i + 1, author="u",
                 based_on_rev_id=None, ts=None)
            for i in range(12)
        ],
        schema=REVISIONS,
    )
    corr = spark.createDataFrame(rows, schema=CORRECTIONS)
    rules, _ = mine_basic_rules(corr, revs, min_support=5, min_confidence=0.5)
    return rules


def _q42_world(spark):
    """The smoke-test snapshot: p:-edge entity->statement, ps:-edge
    statement->value, wdt: direct edge."""
    snapshot = spark.createDataFrame(
        [
            ("Q42", "p:P21", "Q42-error"),
            ("Q42-error", "ps:P21", "Q360210"),
            ("Q42", "P21", "Q360210"),
        ],
        "subj string, pred string, obj string",
    )
    violations = spark.createDataFrame(
        [("v1", "Q42", "P21", "Q42-error", "wds:P21-09D3E4D3")],
        "violation_id string, entity string, property string, statement_id string, constraint_id string",
    )
    return snapshot, violations


def test_q42_smoke(spark):
    rules = _rules(spark)
    snapshot, violations = _q42_world(spark)
    preds = build_possible_corrections(rules, violations, snapshot).collect()
    assert len(preds) == 1
    got = [(s.subj, s.pred, s.obj, s.op) for s in preds[0].predicted]
    assert got == [("Q42", "P21", "Q360210", "del")]


def test_applicability_and_tiles(spark):
    rules = _rules(spark)
    snapshot, violations = _q42_world(spark)
    # second violation whose claim was already removed -> inapplicable
    v2 = violations.union(
        spark.createDataFrame(
            [("v2", "Q43", "P21", "Q43-error", "wds:P21-09D3E4D3")],
            violations.schema,
        )
    )
    snap2 = snapshot.union(
        spark.createDataFrame(
            [("Q43-error", "ps:P21", "Q360299")],  # ps edge exists but no direct claim
            snapshot.schema,
        )
    )
    preds = build_possible_corrections(rules, v2, snap2)
    assert preds.filter(F.col("predicted").isNotNull()).count() == 2
    applicable = filter_applicable(preds, snap2)
    ids = [r.violation_id for r in applicable.collect()]
    assert ids == ["v1"]  # Q43's deletion target is already gone
    tiles = select_tiles(preds, snap2, count=5).collect()
    assert len(tiles) == 1


def test_oversample_before_applicability_filter(spark):
    """`ConstraintCorrectionsGame.java:52-66` order: the 2x random
    fetch happens BEFORE the applicability check — with 4 of 10 queued
    tiles inapplicable, a request for 4 still fills all 4 (the 2x=8
    sample always contains >= 4 applicable ones)."""
    rules = _rules(spark)
    snap_rows, viol_rows = [], []
    for i in range(10):
        e, stmt, val = f"Q{100 + i}", f"Q{100 + i}-s", f"Q{9000 + i}"
        snap_rows += [(e, "p:P21", stmt), (stmt, "ps:P21", val)]
        if i < 6:  # only the first 6 still carry the direct claim
            snap_rows.append((e, "P21", val))
        viol_rows.append((f"v{i}", e, "P21", stmt, "wds:P21-09D3E4D3"))
    snapshot = spark.createDataFrame(snap_rows, "subj string, pred string, obj string")
    violations = spark.createDataFrame(
        viol_rows,
        "violation_id string, entity string, property string, statement_id string, constraint_id string",
    )
    preds = build_possible_corrections(rules, violations, snapshot)
    tiles = select_tiles(preds, snapshot, count=4).collect()
    assert len(tiles) == 4
    applicable_ids = {f"v{i}" for i in range(6)}
    assert {t.violation_id for t in tiles} <= applicable_ids


def test_edit_synthesis_from_game_prediction(spark):
    rules = _rules(spark)
    snapshot, violations = _q42_world(spark)
    preds = build_possible_corrections(rules, violations, snapshot)
    as_corrections = preds.select(
        F.col("constraint_id"),
        F.lit(0).cast("long").alias("corr_rev"),
        F.col("entity").alias("target_subj"),
        F.col("property").alias("target_pred"),
        F.col("target_obj"),
        F.col("predicted").alias("correction"),
    )
    edit = build_edits(as_corrections).collect()[0].edit
    assert edit.action == "wbremoveclaims"
    assert edit.params["claim"].startswith("Q42$")  # md5 fallback, no snapshot

    # with the statement-node snapshot, the REAL GUID is resolved via
    # the p:/ps: walk with '-' -> '$' munging (WikidataEditBuilder:134-142)
    from corhist_spark.edits_out import statement_nodes_from_snapshot

    nodes = statement_nodes_from_snapshot(snapshot)
    edit2 = build_edits(as_corrections, statement_nodes=nodes).collect()[0].edit
    assert edit2.action == "wbremoveclaims"
    assert edit2.params["claim"] == "Q42$error"

    # ambiguous match (two statement nodes carry the same triple) ->
    # the exactly-one guard drops the edit (WikidataEditBuilder:78-88)
    ambiguous = snapshot.union(
        spark.createDataFrame(
            [("Q42", "p:P21", "Q42-dup"), ("Q42-dup", "ps:P21", "Q360210")],
            snapshot.schema,
        )
    )
    edit3 = build_edits(
        as_corrections, statement_nodes=statement_nodes_from_snapshot(ambiguous)
    ).collect()[0].edit
    assert edit3 is None
