"""Property-style checks (SURVEY §5.4): randomized edit streams vs a
pure-Python last-op-wins replay; canonical correction arrays; rule
invariants over the fixture corpus."""

from __future__ import annotations

import random

from corhist_spark.schemas import EDITS, MAX_REV
from corhist_spark.state import build_state


def _replay_visible(events, g):
    """Python oracle: triple visible at g iff last op with rev<=g is add."""
    last = {}
    for rev, op, t in sorted(events):
        if rev <= g:
            last[t] = op
    return {t for t, op in last.items() if op == "add"}


def test_state_matches_replay_on_random_streams(spark):
    rng = random.Random(1234)
    rows, events = [], []
    rev = 0
    triples = [(f"Q{i % 7}", f"P{i % 3}", f"V{i % 5}") for i in range(20)]
    for _ in range(400):
        rev += 1
        t = rng.choice(triples)
        op = rng.choice(["add", "del", "add"])  # bias adds, allow dirt
        rows.append(dict(rev_id=rev, op=op, subj=t[0], pred=t[1], obj=t[2], obj_kind="iri"))
        events.append((rev, op, t))
    df = spark.createDataFrame(rows, schema=EDITS)
    iv = [((r.subj, r.pred, r.obj), r.from_rev, r.to_rev) for r in build_state(df).collect()]

    def visible_iv(g):
        return {t for t, f, to in iv if f <= g < to}

    for g in [0, 1, 5, 57, 123, 250, 399, 400, MAX_REV - 1]:
        assert visible_iv(g) == _replay_visible(events, g), f"mismatch at g={g}"


def test_interval_wellformedness(spark):
    rng = random.Random(99)
    rows = []
    for rev in range(1, 300):
        rows.append(
            dict(
                rev_id=rev,
                op=rng.choice(["add", "del"]),
                subj=f"Q{rev % 5}",
                pred="P1",
                obj=f"V{rev % 4}",
                obj_kind="iri",
            )
        )
    iv = build_state(spark.createDataFrame(rows, schema=EDITS)).collect()
    seen = {}
    for r in iv:
        assert r.from_rev < r.to_rev
        key = (r.subj, r.pred, r.obj)
        seen.setdefault(key, []).append((r.from_rev, r.to_rev))
    for key, spans in seen.items():
        spans.sort()
        for (f1, t1), (f2, _t2) in zip(spans, spans[1:]):
            assert t1 <= f2, f"overlapping intervals for {key}: {spans}"


def test_rule_invariants_on_fixture(spark, sdf, corpus):
    from corhist_spark.mining import mine
    from corhist_spark.pipeline import run_correction_pipeline
    from corhist_spark.state import build_state as bs

    state = bs(sdf["edits"]).localCheckpoint()
    corr = run_correction_pipeline(
        spark, sdf["edits"], sdf["revisions"], corpus["constraints"], state=state
    ).localCheckpoint()
    rules = mine(corr, sdf["revisions"], state, min_support=2, min_confidence=0.1)
    rows = rules.collect()
    assert rows
    for r in rows:
        assert 0.0 < r.confidence <= 1.0
        assert r.support >= 2
        # canonical head ordering (set semantics, `Evaluator.java:38`)
        heads = [(h.subj, h.pred, h.obj, h.op) for h in r.head]
        assert heads == sorted(heads)
    # corrections arrays are canonically sorted too
    for r in corr.collect():
        stmts = [(s.subj, s.pred, s.obj, s.op) for s in r.correction]
        assert stmts == sorted(stmts)


def test_connected_components_match_union_find(spark):
    """Randomized graphs (cycles, stars, chains, disjoint pieces) vs a
    pure-Python union-find with min-label components."""
    from corhist_spark.canonicalize import connected_components

    rng = random.Random(2026)
    for trial in range(5):
        n = rng.randint(4, 14)
        nodes = [f"Q{i}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(1, 2 * n))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            edges = [(nodes[0], nodes[1])]

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp = {}
        for x in parent:
            comp.setdefault(find(x), []).append(x)
        want = {}
        for members in comp.values():
            lo = min(members)
            for m in members:
                want[m] = lo

        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: r.component for r in connected_components(df).collect()}
        assert got == want, f"trial {trial}: {got} != {want}"
