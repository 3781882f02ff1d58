"""Miner parity: the Spark basic-rule miner vs an independent pure-
Python transcription of `Miner.possibleBasicRules` (`Miner.java:47-117`)
over the oracle corrections of the fixture corpus."""

from __future__ import annotations

from collections import Counter

import pytest

from corhist_spark import oracle
from corhist_spark.mining import mine_basic_rules
from corhist_spark.schemas import CORRECTIONS


def _python_basic_rules(corrections, parent_of, min_support, min_conf):
    body, full = Counter(), Counter()
    for c in corrections:
        g = parent_of.get(c.corr_rev)
        for variant in ("gen", "const"):
            vobj = None if variant == "gen" else c.target_obj

            def tok(term):
                if term == c.target_subj:
                    return "?s"
                if variant == "gen" and term == c.target_obj:
                    return "?o"
                return term

            head = tuple(
                sorted({(tok(s), p, tok(o), op) for (s, p, o, op) in c.correction})
            )
            body[(c.constraint_id, vobj)] += 1
            full[(c.constraint_id, vobj, head)] += 1
            _ = g  # g participates in bindings, not in the grouping key
    out = {}
    for (cid, vobj, head), sup in full.items():
        conf = sup / body[(cid, vobj)]
        if sup >= min_support and conf >= min_conf:
            out[(cid, vobj, head)] = (sup, round(conf, 9))
    return out


@pytest.fixture(scope="module")
def gold_corrections(corpus):
    h = oracle.History(
        corpus["revisions"].to_dict("records"), corpus["edits"].to_dict("records")
    )
    out = []
    for c in corpus["constraints"].to_dict("records"):
        out.extend(oracle.find_corrections(h, c))
    return h, out


def test_basic_rules_match_python_miner(spark, corpus, gold_corrections):
    h, corrections = gold_corrections
    parent_of = {r: h.parent(r) for r in h.rev}
    rows = [
        dict(
            constraint_id=c.constraint_id,
            corr_rev=c.corr_rev,
            target_subj=c.target_subj,
            target_pred=c.target_pred,
            target_obj=c.target_obj,
            correction=[dict(subj=s, pred=p, obj=o, op=op) for (s, p, o, op) in sorted(c.correction)],
        )
        for c in corrections
    ]
    cdf = spark.createDataFrame(rows, schema=CORRECTIONS)
    from corhist_spark.fixtures import to_spark

    revs = to_spark(spark, {"revisions": corpus["revisions"]})["revisions"]

    for min_s, min_c in [(2, 0.1), (3, 0.5), (10, 0.5)]:
        rules, _ = mine_basic_rules(cdf, revs, min_support=min_s, min_confidence=min_c)
        got = {
            (
                r.constraint_id,
                r.violation_obj,
                tuple((hh.subj, hh.pred, hh.obj, hh.op) for hh in r.head),
            ): (r.support, round(r.confidence, 9))
            for r in rules.collect()
        }
        want = _python_basic_rules(corrections, parent_of, min_s, min_c)
        assert got == want, (
            f"thresholds ({min_s},{min_c}): {len(got)} spark vs {len(want)} oracle; "
            f"diff sample: {list((set(got) ^ set(want)))[:3]}"
        )


def test_refined_rules_match_python_miner(spark):
    """Depth-1 refinement parity: Spark refine_rules vs an independent
    Python transcription of `Miner.refineWithGraph` (`Miner.java:123-144`
    + `ConstraintRule.java:51-57`): candidate atoms from the outgoing
    triples of every value a variable binds to, flatMap-counted
    support/body over the rule's bindings, thresholds + the
    IMPROVEMENT_STEP confidence gate."""
    from collections import defaultdict

    from corhist_spark.fixtures import generate_corpus, to_spark
    from corhist_spark.mining import mine
    from corhist_spark.state import build_state

    corpus = generate_corpus(seed=3, scale=16)
    h = oracle.History(
        corpus["revisions"].to_dict("records"), corpus["edits"].to_dict("records")
    )
    corrections = []
    for c in corpus["constraints"].to_dict("records"):
        corrections.extend(oracle.find_corrections(h, c))

    # --- Python oracle -----------------------------------------------------
    outgoing = defaultdict(set)  # triples EVER in state (have an add event)
    for (s, p, o), evs in h.events.items():
        if any(op == "add" for _, op in evs):
            outgoing[s].add((p, o))
    body_b, full_b = defaultdict(list), defaultdict(list)
    for c in corrections:
        g = h.parent(c.corr_rev)
        for variant in ("gen", "const"):
            vobj = None if variant == "gen" else c.target_obj

            def tok(t):
                if t == c.target_subj:
                    return "?s"
                if variant == "gen" and t == c.target_obj:
                    return "?o"
                return t

            head = tuple(sorted({(tok(s), p, tok(o), op) for (s, p, o, op) in c.correction}))
            o = c.target_obj if variant == "gen" else None
            body_b[(c.constraint_id, vobj)].append((c.target_subj, o, g))
            full_b[(c.constraint_id, vobj, head)].append((c.target_subj, o, g))

    min_s, min_c, step = 2, 0.1, 0.05
    want = {}
    for (cid, vobj, head), fb in full_b.items():
        bb = body_b[(cid, vobj)]
        sup, conf = len(fb), len(fb) / len(bb)
        if sup < min_s or conf < min_c:
            continue
        atoms = set()
        for (s, o, g) in fb:
            for var, val in (("?s", s), ("?o", o)):
                if val is None:
                    continue
                for (p2, o2) in outgoing.get(val, ()):
                    atoms.add((var, p2, o2))
                    atoms.add((var, p2, "?v"))
        for (var, p2, o2) in atoms:

            def m(bl):
                t = 0
                for (s, o, g) in bl:
                    if g is None:
                        continue
                    val = s if var == "?s" else o
                    if val is None:
                        continue
                    objs = h.objects(val, p2, g)
                    t += len(objs) if o2 == "?v" else (1 if o2 in objs else 0)
                return t

            ns, nb = m(fb), m(bb)
            if nb == 0:
                continue
            c2 = ns / nb
            if ns >= min_s and c2 >= min_c and c2 > conf + step:
                want[(cid, vobj, head, (var, p2, o2))] = (ns, round(c2, 9))
    assert len(want) >= 3  # non-vacuous at this scale/seed

    # --- Spark -------------------------------------------------------------
    rows = [
        dict(
            constraint_id=c.constraint_id,
            corr_rev=c.corr_rev,
            target_subj=c.target_subj,
            target_pred=c.target_pred,
            target_obj=c.target_obj,
            correction=[dict(subj=s, pred=p, obj=o, op=op) for (s, p, o, op) in sorted(c.correction)],
        )
        for c in corrections
    ]
    cdf = spark.createDataFrame(rows, schema=CORRECTIONS)
    sdf = to_spark(spark, {"revisions": corpus["revisions"], "edits": corpus["edits"]})
    state = build_state(sdf["edits"]).localCheckpoint()
    rules = mine(cdf, sdf["revisions"], state, min_support=min_s, min_confidence=min_c)
    got = {
        (
            r.constraint_id,
            r.violation_obj,
            tuple((hh.subj, hh.pred, hh.obj, hh.op) for hh in r.head),
            (r.context[0].var, r.context[0].pred, r.context[0].obj),
        ): (r.support, round(r.confidence, 9))
        for r in rules.collect()
        if r.context
    }
    assert got == want, (
        f"{len(got)} spark vs {len(want)} oracle; "
        f"diff sample: {list(set(got) ^ set(want))[:3]}"
    )
