"""End-to-end parity: the Spark correction pipeline vs the pure-Python
oracle (literal reference semantics) on the seeded synthetic corpus.
BASELINE.json gate: P/R >= 0.95 on the emitted corrections."""

from __future__ import annotations

import pytest

from corhist_spark import oracle
from corhist_spark.pipeline import run_correction_pipeline


def _spark_corrections(spark, corpus, sdf):
    df = run_correction_pipeline(
        spark, sdf["edits"], sdf["revisions"], corpus["constraints"]
    )
    out = set()
    for r in df.collect():
        out.add(
            (
                r.constraint_id,
                r.corr_rev,
                r.target_subj,
                r.target_pred,
                r.target_obj,
                frozenset((s.subj, s.pred, s.obj, s.op) for s in r.correction),
            )
        )
    return out


def _oracle_corrections(corpus):
    h = oracle.History(
        corpus["revisions"].to_dict("records"), corpus["edits"].to_dict("records")
    )
    out = set()
    for c in corpus["constraints"].to_dict("records"):
        for corr in oracle.find_corrections(h, c):
            out.add(
                (
                    corr.constraint_id,
                    corr.corr_rev,
                    corr.target_subj,
                    corr.target_pred,
                    corr.target_obj,
                    corr.correction,
                )
            )
    return out


@pytest.fixture(scope="module")
def both(spark, corpus, sdf):
    return _spark_corrections(spark, corpus, sdf), _oracle_corrections(corpus)


def test_oracle_finds_planted_corrections(both):
    _, gold = both
    assert len(gold) > 50, f"oracle found only {len(gold)} corrections"
    types = {c[0].split("-")[1] for c in gold}
    # every planted constraint family should yield corrections
    assert {"single", "unique", "inverse", "sym", "oneof", "format"} <= types, types


def test_parity_pr_at_least_095(both):
    got, gold = both
    assert gold, "empty gold standard"
    tp = len(got & gold)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(gold)
    assert precision >= 0.95, (
        f"precision {precision:.3f} ({len(got)} predicted, {tp} correct); "
        f"sample false positives: {sorted(got - gold)[:3]}"
    )
    assert recall >= 0.95, (
        f"recall {recall:.3f} ({len(gold)} gold, {tp} found); "
        f"sample misses: {sorted(gold - got)[:3]}"
    )
