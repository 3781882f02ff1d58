"""Per-constraint modulo sampling guard (the reference's volume guard,
`AbstractQueriesBuilder.java:56-60` + `ConstraintViolationCorrectionLookup
.java:237-245`), wired into the type/valueType/item/targetClaim kernels.

The filter is a top-level conjunct on each branch's candidate rows and
every candidate row keeps its diff revision as corr_rev, so sampling
with div == d must equal the UNSAMPLED candidate set filtered to
corr_rev % d == 0 — an exact planted oracle, no double implementation.
"""

from __future__ import annotations

import pandas as pd
import pytest

from corhist_spark.history import derived_edits, derived_revisions
from corhist_spark.kernels import correction_candidates, prepare_constraints
from corhist_spark.schemas import MAX_REV
from corhist_spark.state import build_state

SF_DIR = "/root/testdata/sf0.001"

CONSTRAINTS = [
    # item: P1 requires P2 on the subject (del + add branches)
    {"constraint_id": "c-item-P1", "property": "P1", "type": "Q21503247",
     "params": {"P2306": ["P2"]}},
    # targetClaim: P1 objects must hold P2 (del + add branches)
    {"constraint_id": "c-tclaim-P1", "property": "P1", "type": "Q21510864",
     "params": {"P2306": ["P2"]}},
    # type: P1 subjects must be instances reaching C1 — the flat
    # history has no P31 typing edges, so every P1 deletion is a
    # candidate (deletion branch only); the guard must still sample it
    {"constraint_id": "c-type-P1", "property": "P1", "type": "Q21503250",
     "params": {"P2308": ["C1"], "P2309": ["Q21503252"]}},
    # single-value on P0: an UNSAMPLED kernel riding in the same plan —
    # its rows must be untouched by the guard
    {"constraint_id": "c-single-P0", "property": "P0", "type": "Q19474404",
     "params": {}},
]


@pytest.fixture(scope="module")
def hist(spark):
    edits = derived_edits(spark, SF_DIR).localCheckpoint()
    revisions = derived_revisions(edits).localCheckpoint()
    state = build_state(edits).localCheckpoint()
    closure = spark.createDataFrame(
        [], "cls string, anc string, from_rev long, to_rev long"
    )
    cons = prepare_constraints(spark, pd.DataFrame(CONSTRAINTS))
    return edits, revisions, state, closure, cons


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_sampling_guard_fires_and_matches_planted_oracle(spark, hist):
    edits, revisions, state, closure, cons = hist
    from pyspark.sql import functions as F

    n_p1 = state.filter((F.col("to_rev") == MAX_REV) & (F.col("pred") == "P1")).count()
    threshold = max(1, n_p1 // 3)
    div = n_p1 // threshold
    assert div >= 2, "fixture too small to plant a firing guard"

    unsampled = correction_candidates(edits, revisions, state, closure, cons)
    sampled = correction_candidates(
        edits, revisions, state, closure, cons, sampling_threshold=threshold
    )

    sampled_kernels = F.col("constraint_id").isin(
        "c-item-P1", "c-tclaim-P1", "c-type-P1"
    )
    want = _rows(
        unsampled.filter(
            (~sampled_kernels) | (F.col("corr_rev") % div == 0)
        )
    )
    got = _rows(sampled)
    assert got == want
    # the guard genuinely dropped candidate rows from the sampled
    # kernels and left the single-value kernel untouched
    assert sampled.filter(sampled_kernels).count() < unsampled.filter(sampled_kernels).count()
    assert _rows(sampled.filter(~sampled_kernels)) == _rows(
        unsampled.filter(~sampled_kernels)
    )


def test_default_threshold_is_identity_at_test_scale(spark, hist):
    edits, revisions, state, closure, cons = hist
    a = _rows(correction_candidates(edits, revisions, state, closure, cons))
    b = _rows(
        correction_candidates(
            edits, revisions, state, closure, cons, sampling_threshold=10**9
        )
    )
    assert a == b
