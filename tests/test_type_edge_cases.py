"""Type-kernel edge case: empty class parameter degenerates to
`NOT EXISTS { carrier rel/P279* ?o2 }` — any typing edge is evidence
(`AbstractQueriesBuilder.convertValues` returns an empty filter)."""

from __future__ import annotations

import pandas as pd

from corhist_spark import oracle
from corhist_spark.pipeline import run_correction_pipeline
from corhist_spark.schemas import EDITS, REVISIONS


def test_empty_class_param_kernel_matches_oracle(spark):
    revisions, edits = [], []
    # Q1 is typed (has any P31), Q2 is not; both lose a P15 value
    for i, (ent, typed) in enumerate([("Q1", True), ("Q2", False)]):
        base = 10 * i
        revisions.append(dict(rev_id=base + 1, entity=ent, parent_rev_id=None,
                              author="u", based_on_rev_id=None, ts=None))
        edits.append(dict(rev_id=base + 1, op="add", subj=ent, pred="P15",
                          obj="Qv", obj_kind="iri"))
        if typed:
            edits.append(dict(rev_id=base + 1, op="add", subj=ent, pred="P31",
                              obj="Qc", obj_kind="iri"))
        revisions.append(dict(rev_id=base + 2, entity=ent, parent_rev_id=base + 1,
                              author="u", based_on_rev_id=None, ts=None))
        edits.append(dict(rev_id=base + 2, op="del", subj=ent, pred="P15",
                          obj="Qv", obj_kind="iri"))
    cons = pd.DataFrame(
        [{"constraint_id": "cT", "property": "P15", "type": "Q21503250", "params": {}}]
    )
    e_df = spark.createDataFrame(edits, schema=EDITS)
    r_df = spark.createDataFrame(revisions, schema=REVISIONS)
    got = {
        (r.target_subj, r.target_obj, r.corr_rev)
        for r in run_correction_pipeline(spark, e_df, r_df, cons).collect()
    }
    # only untyped Q2's deletion is a correction; typed Q1 has evidence
    assert got == {("Q2", "Qv", 12)}
    # the Python oracle agrees
    h = oracle.History(revisions, edits)
    want = {
        (c.target_subj, c.target_obj, c.corr_rev)
        for c in oracle.find_corrections(h, cons.to_dict("records")[0])
    }
    assert want == got


def test_unregistered_constraint_type_yields_empty(spark):
    """A constraint table whose types are ALL unrecognized QIDs (real
    WDQS dumps carry dozens of types beyond the ten implemented) must
    produce an empty corrections frame, not crash; mixed tables skip
    the unknown rows."""
    import pandas as pd

    from corhist_spark.history import derived_edits, derived_revisions
    from corhist_spark.pipeline import run_correction_pipeline

    edits = derived_edits(spark, "/root/testdata/sf0.001")
    revs = derived_revisions(edits)
    unknown_only = pd.DataFrame(
        [{"constraint_id": "c-x", "property": "P1", "type": "Q99999999", "params": {}}]
    )
    out = run_correction_pipeline(spark, edits, revs, unknown_only)
    assert out.count() == 0
    assert "correction" in out.columns

    mixed = pd.DataFrame(
        [
            {"constraint_id": "c-x", "property": "P1", "type": "Q99999999", "params": {}},
            {"constraint_id": "c-oneof-P2", "property": "P2", "type": "Q21510859",
             "params": {"P2305": ["V0"]}},
        ]
    )
    out2 = run_correction_pipeline(spark, edits, revs, mixed)
    assert out2.filter(out2.constraint_id == "c-x").count() == 0
    assert out2.filter(out2.constraint_id == "c-oneof-P2").count() > 0
