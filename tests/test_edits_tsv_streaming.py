"""Edit synthesis dispatch, TSV round-trip, streaming rule application
and the violation-queue state machine."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from corhist_spark.edits_out import build_edits
from corhist_spark.schemas import CORRECTIONS
from corhist_spark.tsv import corrections_from_tsv, corrections_to_tsv


def _corr(spark, rows):
    return spark.createDataFrame(rows, schema=CORRECTIONS)


def _c(cid, rev, ts, tp, to, stmts):
    return dict(
        constraint_id=cid,
        corr_rev=rev,
        target_subj=ts,
        target_pred=tp,
        target_obj=to,
        correction=[dict(subj=s, pred=p, obj=o, op=op) for (s, p, o, op) in stmts],
    )


def test_edit_dispatch(spark):
    df = _corr(
        spark,
        [
            _c("c", 1, "Q1", "P1", "V1", [("Q1", "P1", "V1", "del")]),
            _c("c", 2, "Q2", "P1", "V1", [("Q2", "P1", "Q9", "add")]),
            _c("c", 3, "Q3", "P1", "V1", [("Q3", "P1", "V1", "del"), ("Q3", "P1", "V2", "add")]),
            # unsupported: 2 dels
            _c("c", 4, "Q4", "P1", "V1", [("Q4", "P1", "V1", "del"), ("Q4", "P2", "V2", "del")]),
            # unsupported: 3 statements
            _c("c", 5, "Q5", "P1", "V1", [("Q5", "P1", "V1", "del"), ("Q5", "P1", "V2", "add"), ("Q5", "P3", "V3", "add")]),
        ],
    )
    out = {r.corr_rev: r.edit for r in build_edits(df).collect()}
    assert out[1].action == "wbremoveclaims" and out[1].params["claim"].startswith("Q1$")
    assert out[2].action == "wbcreateclaim" and out[2].params["entity"] == "Q2"
    assert json.loads(out[2].params["value"]) == {
        "type": "wikibase-entityid",
        "value": {"id": "Q9"},
    }
    assert out[3].action == "wbsetclaimvalue" and out[3].params["claim"].startswith("Q3$")
    assert out[4] is None and out[5] is None


def test_tsv_roundtrip(spark):
    rows = [
        _c("c-single-P10", 42, "Q1", "P10", "V\twith\ttabs", [("Q1", "P10", "a\nb", "del")]),
        _c("c2", 7, "Q2", "P1", "v", [("Q2", "P1", "v", "del"), ("Q2", "P1", "w", "add")]),
    ]
    df = _corr(spark, rows)
    lines = corrections_to_tsv(df)
    back = corrections_from_tsv(lines)
    want = {
        (r["constraint_id"], r["corr_rev"], r["target_subj"], r["target_pred"], r["target_obj"],
         frozenset((s["subj"], s["pred"], s["obj"], s["op"]) for s in r["correction"]))
        for r in rows
    }
    got = {
        (r.constraint_id, r.corr_rev, r.target_subj, r.target_pred, r.target_obj,
         frozenset((s.subj, s.pred, s.obj, s.op) for s in r.correction))
        for r in back.collect()
    }
    assert got == want


def test_violation_queue_state_machine(spark):
    from corhist_spark.streaming import upsert_violation_queue

    def inc(rows):
        return spark.createDataFrame(
            rows,
            "entity_id string, property_id string, statement_id string, "
            "constraint_id string, constraint_type string, message string, edit_json string",
        )

    r1 = inc([("Q1", "P1", "s1", "c1", "t", "m", "{}")])
    q1 = upsert_violation_queue(None, r1)
    assert [(r.statement_id, r.state) for r in q1.collect()] == [("s1", "p")]

    # approve s1, mark a second row obsolete, then re-see both
    q2 = q1.withColumn("state", F.lit("a")).unionByName(
        inc([("Q2", "P2", "s2", "c2", "t", "m", "{}")]).withColumn("state", F.lit("o"))
    )
    r2 = inc([
        ("Q1", "P1", "s1", "c1", "t", "m", "{}"),
        ("Q2", "P2", "s2", "c2", "t", "m", "{}"),
        ("Q3", "P3", "s3", "c3", "t", "m", "{}"),
    ])
    q3 = {r.statement_id: r.state for r in upsert_violation_queue(q2, r2).collect()}
    # approved stays approved; obsolete flips to proposed; new inserted
    assert q3 == {"s1": "a", "s2": "p", "s3": "p"}


def test_streaming_rule_application(spark, tmp_path):
    """availableNow file stream through foreachBatch == batch result."""
    from corhist_spark.mining import mine
    from corhist_spark.state import build_state
    from corhist_spark.storage import Warehouse
    from corhist_spark.streaming import stream_apply_rules
    from tests.test_mining import _mk

    corr, revs, edits = _mk(spark, n_del=18, n_add=12, with_mark=True)
    state = build_state(edits).localCheckpoint()
    rules = mine(corr, revs, state).localCheckpoint()

    src = str(tmp_path / "src")
    corr.write.parquet(src)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream = spark.readStream.schema(corr.schema).parquet(src)
    q = stream_apply_rules(
        stream, rules, revs, state, wh, checkpoint_dir=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    preds = spark.read.parquet(str(tmp_path / "wh" / "stream_predictions"))
    # batch path predicted for all 30 rows (base rule matches everything)
    assert preds.count() == 30
