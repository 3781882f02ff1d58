"""Threshold-sweep tuning (`TuningMiner.java:40-55`) and aggregated
stats (`scripts/aggregated_stats.py`) unit tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from corhist_spark.evaluate import aggregate_stats, apply_rules, evaluation_metrics, tune
from corhist_spark.mining import mine
from corhist_spark.state import build_state
from tests.test_mining import _mk


def test_tune_filters_low_confidence_when_f1_improves(spark):
    """18 del-corrections + 12 add-corrections: the base del rule has
    conf 0.6 (wrong on 12), the refined rules conf 1.0.  Sweeping to
    threshold 0.65 drops the base rule; refined rules then only fire on
    the 18 marked rows -> P=1, R=0.6, F1=0.75 beats 0.6/1.0's 0.75...
    exact outcome is data-driven; the invariant tested: tune never
    returns a worse-F1 rule set than the unfiltered one."""
    corr, revs, edits = _mk(spark, n_del=18, n_add=12, with_mark=True)
    state = build_state(edits).localCheckpoint()
    rules = mine(corr, revs, state).localCheckpoint()

    def f1_of(rs):
        m = evaluation_metrics(apply_rules(rs, corr, revs, state)).collect()[0]
        p, r = m.precision, m.recall
        return 0.0 if p + r == 0 else 2 * p * r / (p + r)

    base_f1 = f1_of(rules)
    tuned = tune(rules, corr, revs, state, seed=3)
    assert f1_of(tuned) >= base_f1 - 1e-9
    # tuned set only contains rules from the original set
    orig = {r.rule_id for r in rules.collect()}
    assert {r.rule_id for r in tuned.collect()} <= orig


def test_tune_mines_on_train_split(spark):
    """`TuningMiner.java:41`: with enough data, the base rule set is
    mined on the rand<0.10 TRAIN partition, not the full corrections
    set — the sweep then evaluates on data the rules were not mined
    from."""
    corr, revs, edits = _mk(spark, n_del=90, n_add=60, with_mark=True)
    state = build_state(edits).localCheckpoint()
    seen = {}

    def mine_cb(train):
        seen["n"] = train.count()
        return mine(train, revs, state).localCheckpoint()

    tuned = tune(None, corr, revs, state, seed=3, mine=mine_cb)
    total = corr.count()
    assert total == 150 and 0 < seen["n"] < 0.35 * total  # small split mined
    assert tuned.count() > 0  # rules came from the callback


def test_aggregate_stats_weighted_vs_unweighted(spark):
    stats = spark.createDataFrame(
        [
            ("c1", 10, 1.0, 0.5),
            ("c2", 90, 0.5, 1.0),
            ("c3", 100, float("nan"), 0.2),  # NaN filtered like the script
        ],
        "constraint_id string, total long, precision double, recall double",
    )
    cons = pd.DataFrame(
        [
            {"constraint_id": "c1", "type": "T1"},
            {"constraint_id": "c2", "type": "T1"},
            {"constraint_id": "c3", "type": "T1"},
        ]
    )
    row = aggregate_stats(stats, cons).collect()[0]
    assert row.type == "T1" and row.n == 100
    assert abs(row.w_precision - (10 * 1.0 + 90 * 0.5) / 100) < 1e-9
    assert abs(row.avg_precision - 0.75) < 1e-9
    assert abs(row.w_recall - (10 * 0.5 + 90 * 1.0) / 100) < 1e-9
