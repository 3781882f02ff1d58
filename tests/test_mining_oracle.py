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
