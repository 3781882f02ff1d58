"""State reconstruction unit tests: hand-computed validity intervals
covering the corner cases of SURVEY.md §7.3.4 (re-add after delete,
orphan delete, duplicate add, multi-valued (s,p))."""

from __future__ import annotations

from corhist_spark.schemas import EDITS, MAX_REV
from corhist_spark.state import build_state, current_state, state_at


def _edits(spark, rows):
    return spark.createDataFrame(
        [dict(rev_id=r, op=op, subj=s, pred=p, obj=o, obj_kind="iri") for (r, op, s, p, o) in rows],
        schema=EDITS,
    )


def test_intervals_basic(spark):
    e = _edits(
        spark,
        [
            (1, "add", "Q1", "P1", "a"),
            (3, "del", "Q1", "P1", "a"),
            (5, "add", "Q1", "P1", "a"),  # re-add after delete
            (2, "add", "Q1", "P1", "b"),  # multi-valued, never deleted
        ],
    )
    iv = {
        (r.subj, r.pred, r.obj, r.from_rev, r.to_rev)
        for r in build_state(e).collect()
    }
    assert iv == {
        ("Q1", "P1", "a", 1, 3),
        ("Q1", "P1", "a", 5, MAX_REV),
        ("Q1", "P1", "b", 2, MAX_REV),
    }


def test_intervals_dirty_stream(spark):
    e = _edits(
        spark,
        [
            (1, "del", "Q2", "P1", "x"),  # orphan delete: ignored
            (2, "add", "Q2", "P1", "x"),
            (3, "add", "Q2", "P1", "x"),  # duplicate add collapsed
            (4, "del", "Q2", "P1", "x"),
            (5, "del", "Q2", "P1", "x"),  # duplicate delete collapsed
        ],
    )
    iv = {(r.from_rev, r.to_rev) for r in build_state(e).collect()}
    assert iv == {(2, 4)}


def test_state_at_and_current(spark):
    e = _edits(
        spark,
        [
            (1, "add", "Q3", "P1", "a"),
            (4, "del", "Q3", "P1", "a"),
            (4, "add", "Q3", "P1", "b"),
        ],
    )
    st = build_state(e)
    # visible right after rev 1..3: a; after 4: b only
    assert {r.obj for r in state_at(st, 1).collect()} == {"a"}
    assert {r.obj for r in state_at(st, 3).collect()} == {"a"}
    assert {r.obj for r in state_at(st, 4).collect()} == {"b"}
    assert {r.obj for r in current_state(st).collect()} == {"b"}
