"""Golden message strings for the 3 edit kinds
(`game/EditDescriber.java:39-72`, offline value rendering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from corhist_spark.describe import WDS_NAMESPACE, describe_edits
from corhist_spark.edits_out import build_edits, statement_nodes_from_snapshot
from corhist_spark.schemas import CORRECTIONS


def _corr(spark, stmts):
    rows = [
        dict(
            constraint_id="c1",
            corr_rev=1,
            target_subj="Q42",
            target_pred="P21",
            target_obj="Q360210",
            correction=stmts,
        )
    ]
    return spark.createDataFrame(rows, schema=CORRECTIONS)


def _snapshot(spark):
    return spark.createDataFrame(
        [
            ("Q42", "p:P21", "Q42-error"),
            ("Q42-error", "ps:P21", "Q360210"),
        ],
        "subj string, pred string, obj string",
    )


def test_create_message(spark):
    corr = _corr(spark, [dict(subj="Q42", pred="P21", obj="Q6581072", op="add")])
    out = describe_edits(build_edits(corr)).collect()[0]
    assert out.message == "Add statement (Q42, P21, Q6581072)"


def test_remove_message_with_resolved_statement(spark):
    corr = _corr(spark, [dict(subj="Q42", pred="P21", obj="Q360210", op="del")])
    nodes = statement_nodes_from_snapshot(_snapshot(spark))
    edits = build_edits(corr, statement_nodes=nodes)
    out = describe_edits(edits, statement_nodes=nodes).collect()[0]
    assert out.message == (
        f"Remove <a href='{WDS_NAMESPACE}Q42$error'>statement</a> (Q42, P21, Q360210)"
    )


def test_replace_message_and_unresolved_drops(spark):
    corr = _corr(
        spark,
        [
            dict(subj="Q42", pred="P21", obj="Q360210", op="del"),
            dict(subj="Q42", pred="P21", obj="Q6581072", op="add"),
        ],
    )
    nodes = statement_nodes_from_snapshot(_snapshot(spark))
    edits = build_edits(corr, statement_nodes=nodes)
    out = describe_edits(edits, statement_nodes=nodes).collect()[0]
    assert out.message == (
        f"Edit <a href='{WDS_NAMESPACE}Q42$error'>statement</a> (Q42, P21, Q360210)"
        ". Setting value to: Q6581072"
    )
    # unresolvable GUID -> NULL message (tile dropped, buildTile:84-87)
    out2 = describe_edits(edits, statement_nodes=nodes.filter(F.lit(False))).collect()[0]
    assert out2.message is None


def test_string_value_rendering(spark):
    corr = _corr(spark, [dict(subj="Q42", pred="P21", obj="not-an-id", op="add")])
    out = describe_edits(build_edits(corr)).collect()[0]
    assert out.message == "Add statement (Q42, P21, not-an-id)"
