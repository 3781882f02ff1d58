"""Miner + evaluator unit tests on hand-computable micro-fixtures
(support/confidence math of `Miner.java:21-22,47-79`, refinement of
`:123-144`, evaluation conventions of `Evaluator.java:52`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corhist_spark.evaluate import (
    apply_rules,
    deletion_baseline,
    evaluation_metrics,
)
from corhist_spark.mining import mine, mine_basic_rules
from corhist_spark.schemas import CORRECTIONS, EDITS, REVISIONS
from corhist_spark.state import build_state

MARK = "Q777"


def _mk(spark, n_del=18, n_add=12, with_mark=True):
    """n_del corrections fixed by deletion (subjects carry a P9->MARK
    triple at g when with_mark), n_add fixed by adding P8."""
    corrections, revisions, edits = [], [], []
    rev = 0
    for i in range(n_del + n_add):
        s, o = f"Q{i}", f"V{i}"
        is_del = i < n_del
        rev += 1
        setup_rev = rev
        revisions.append(
            dict(rev_id=rev, entity=s, parent_rev_id=None, author="u", based_on_rev_id=None, ts=None)
        )
        if with_mark and is_del:
            edits.append(dict(rev_id=rev, op="add", subj=s, pred="P9", obj=MARK, obj_kind="iri"))
        rev += 1
        revisions.append(
            dict(rev_id=rev, entity=s, parent_rev_id=setup_rev, author="u", based_on_rev_id=None, ts=None)
        )
        corr = (
            [dict(subj=s, pred="P1", obj=o, op="del")]
            if is_del
            else [dict(subj=s, pred="P8", obj="Qfix", op="add")]
        )
        corrections.append(
            dict(
                constraint_id="c1",
                corr_rev=rev,
                target_subj=s,
                target_pred="P1",
                target_obj=o,
                correction=corr,
            )
        )
    return (
        spark.createDataFrame(corrections, schema=CORRECTIONS),
        spark.createDataFrame(revisions, schema=REVISIONS),
        spark.createDataFrame(edits, schema=EDITS),
    )


def test_basic_rule_support_confidence(spark):
    corr, revs, _ = _mk(spark, n_del=20, n_add=0, with_mark=False)
    rules, _b = mine_basic_rules(corr, revs)
    got = rules.collect()
    # only the generalized-object pattern survives (each constant-object
    # group has support 1 < MIN_SUPPORT)
    assert len(got) == 1
    r = got[0]
    assert r.violation_obj is None
    assert r.support == 20 and abs(r.confidence - 1.0) < 1e-9
    assert [(h.subj, h.pred, h.obj, h.op) for h in r.head] == [("?s", "P1", "?o", "del")]


def test_mixed_confidence_thresholds(spark):
    corr, revs, _ = _mk(spark, n_del=15, n_add=10, with_mark=False)
    rules, _b = mine_basic_rules(corr, revs)
    got = {tuple((h.subj, h.pred, h.obj, h.op) for h in r.head): r for r in rules.collect()}
    # del-rule: 15/25 = 0.6 passes; add-rule: 10/25 = 0.4 fails MIN_CONF
    assert len(got) == 1
    r = got[(("?s", "P1", "?o", "del"),)]
    assert r.support == 15 and abs(r.confidence - 0.6) < 1e-9


def test_refinement_improves_confidence(spark):
    corr, revs, edits = _mk(spark, n_del=18, n_add=12, with_mark=True)
    state = build_state(edits)
    rules = mine(corr, revs, state)
    rows = rules.collect()
    base = [r for r in rows if not r.context]
    refined = [r for r in rows if r.context]
    assert len(base) == 1 and abs(base[0].confidence - 0.6) < 1e-9
    # the (?s, P9, MARK) and (?s, P9, ?v) atoms both lift conf to 1.0
    atoms = {(r.context[0].var, r.context[0].pred, r.context[0].obj) for r in refined}
    assert ("?s", "P9", MARK) in atoms and ("?s", "P9", "?v") in atoms
    for r in refined:
        assert r.support == 18 and abs(r.confidence - 1.0) < 1e-9


def test_apply_and_metrics(spark):
    corr, revs, edits = _mk(spark, n_del=18, n_add=12, with_mark=True)
    state = build_state(edits)
    rules = mine(corr, revs, state)
    applied = apply_rules(rules, corr, revs, state)
    m = evaluation_metrics(applied).collect()[0]
    # every test row matches the base del-rule (refined context only
    # holds for marked subjects, predicting the same del head) ->
    # found=30, good=18
    assert m.total == 30 and m.found == 30 and m.good == 18
    assert abs(m.precision - 0.6) < 1e-9 and abs(m.recall - 1.0) < 1e-9


def test_no_rules_precision_one(spark):
    corr, revs, edits = _mk(spark, n_del=3, n_add=2, with_mark=False)
    state = build_state(edits)
    rules, _ = mine_basic_rules(corr, revs)  # all under MIN_SUPPORT
    assert rules.count() == 0
    applied = apply_rules(rules, corr, revs, state)
    m = evaluation_metrics(applied).collect()[0]
    # P = 1 when nothing predicted (`Evaluator.java:52`)
    assert m.found == 0 and m.precision == 1.0 and m.recall == 0.0


def test_deletion_baseline(spark):
    corr, _revs, _ = _mk(spark, n_del=18, n_add=12, with_mark=False)
    b = deletion_baseline(corr).collect()[0]
    assert b.total == 30 and abs(b.precision - 0.6) < 1e-9 and b.recall == 1.0
