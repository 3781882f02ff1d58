"""Value serialization (6 kinds), rules text export, rule subsumption."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from corhist_spark.rule_ops import is_more_precise, rules_to_text
from corhist_spark.values import parse_entity_id, serialize_value


def test_serialize_six_value_kinds(spark):
    rows = [
        ("Q42", "iri"),
        ("hello", "string"),
        ("Douglas@en", "langString"),
        ("+2001-01-15T00:00:00Z|11|Q1985727", "dateTime"),
        ("48.85|2.35|0.01|Q2", "coords"),
        ("+42.5|Q11573", "quantity"),
    ]
    df = spark.createDataFrame(rows, "obj string, obj_kind string")
    out = {
        r.obj_kind: json.loads(r.js)
        for r in df.select("obj_kind", serialize_value(F.col("obj"), F.col("obj_kind")).alias("js")).collect()
    }
    assert out["iri"] == {"id": "Q42"}
    assert out["string"] == {"value": "hello"}
    assert out["langString"] == {"language": "en", "text": "Douglas"}
    assert out["dateTime"]["time"] == "+2001-01-15T00:00:00Z"
    assert out["dateTime"]["precision"] == 11
    assert out["dateTime"]["calendarmodel"] == "Q1985727"
    assert out["coords"] == {"latitude": 48.85, "longitude": 2.35, "precision": 0.01, "globe": "Q2"}
    assert out["quantity"] == {"amount": "+42.5", "unit": "Q11573"}


def test_parse_entity_id(spark):
    df = spark.createDataFrame(
        [("http://www.wikidata.org/entity/Q42",), ("P31",), ("nope",)], "s string"
    )
    got = [r.e for r in df.select(parse_entity_id(F.col("s")).alias("e")).collect()]
    assert got == ["Q42", "P31", ""]


def _rule(cid="c1", vobj=None, head=None, context=None):
    return dict(
        constraint_id=cid,
        violation_obj=vobj,
        head=head or [("?s", "P1", "?o", "del")],
        context=context or [],
    )


def test_rule_subsumption():
    gen = _rule()
    const = _rule(vobj="V1", head=[("?s", "P1", "V1", "del")])
    # constant-object rule is more precise than the generalized one
    # ONLY if heads match under the substitution — here heads differ
    assert not is_more_precise(const, gen)
    same_head_const = _rule(vobj="V1", head=[("?s", "P1", "?o", "del")])
    assert is_more_precise(same_head_const, gen)
    assert not is_more_precise(gen, same_head_const)
    # context atom makes a rule more precise than its base
    refined = _rule(context=[("?s", "P9", "MARK")])
    base_with_ctx_var = _rule(context=[("?s", "P9", "?v")])
    assert is_more_precise(refined, base_with_ctx_var)
    assert not is_more_precise(base_with_ctx_var, refined)
    # different constraints never subsume
    assert not is_more_precise(_rule(cid="c2"), gen)


def test_rules_text_export(spark):
    from pyspark.sql.types import StructType

    rules = spark.createDataFrame(
        [
            (
                "r1",
                "c1",
                None,
                [("?s", "P1", "?o", "del")],
                [],
                12,
                0.75,
            )
        ],
        "rule_id string, constraint_id string, violation_obj string, "
        "head array<struct<subj:string,pred:string,obj:string,op:string>>, "
        "context array<struct<var:string,pred:string,obj:string>>, "
        "support long, confidence double",
    )
    line = rules_to_text(rules).collect()[0].value
    assert line == "?s c1 ?o ?g\t\t=>\t?s P1 ?o del\t0.75\t12"


def test_format_regex_validated_by_jvm(spark):
    """Acceptance must match the engine that executes the regex
    (java.util.regex, like FormatQueriesBuilder.convertRegexParameter):
    Java-only syntax is kept, Python-only syntax falls back."""
    import pandas as pd
    from pyspark.sql import functions as F
    from corhist_spark.kernels import prepare_constraints

    cons = pd.DataFrame(
        [
            {"constraint_id": "c1", "property": "P4", "type": "Q21502404",
             "params": {"P1793": ["V[01]*+"]}},      # possessive quantifier: Java-only
            {"constraint_id": "c2", "property": "P4", "type": "Q21502404",
             "params": {"P1793": ["(?P<n>V)"]}},     # named group: Python-only
            {"constraint_id": "c3", "property": "P4", "type": "Q21502404",
             "params": {"P1793": ["[invalid"]}},     # invalid everywhere
        ]
    )
    got = {r.constraint_id: r.regex_anchored for r in prepare_constraints(spark, cons).collect()}
    assert got["c1"] == "^V[01]*+$"
    assert got["c2"] == "^.*$"
    assert got["c3"] == "^.*$"
    # the accepted Java-only pattern must actually run JVM-side
    row = spark.range(1).select(
        F.regexp_like(F.lit("V010"), F.lit(got["c1"])).alias("m"),
        F.regexp_like(F.lit("X"), F.lit(got["c1"])).alias("n"),
    ).collect()[0]
    assert row.m is True and row.n is False


def test_top_rules_text(spark):
    from corhist_spark.rule_ops import top_rules_text

    rules = spark.createDataFrame(
        [
            ("r%02d" % i, "c1", None, [("?s", "P1", "?o", "del")], [], 10 + i, 0.5 + i / 100)
            for i in range(15)
        ],
        "rule_id string, constraint_id string, violation_obj string, "
        "head array<struct<subj:string,pred:string,obj:string,op:string>>, "
        "context array<struct<var:string,pred:string,obj:string>>, "
        "support long, confidence double",
    )
    lines = [r.value for r in top_rules_text(rules, k=10).collect()]
    assert len(lines) == 10
    # best-confidence rule first, exported through rules_to_text
    assert lines[0].endswith("\t0.64\t24")
    assert lines[-1].endswith("\t0.55\t15")


def test_queue_stats_and_approval_summary(spark):
    from corhist_spark.game import approval_summary, queue_stats

    log = spark.createDataFrame(
        [
            ("T1", "a", "u1"), ("T1", "a", "u2"), ("T1", "r", "u1"),
            ("T1", "p", None), ("T2", "o", "u3"),
        ],
        "constraint_type string, state string, user_id string",
    )
    stats = queue_stats(log)
    rows = {(r.constraint_type, r.state, r.user_id): r.n for r in stats.collect()}
    assert rows[("T1", "a", "u1")] == 1 and rows[("T1", "a", "*")] == 2
    assert rows[("T1", "p", "*")] == 1  # NULL user counted in '*' only
    assert ("T1", "p", None) not in rows
    summ = {r.constraint_type: r for r in approval_summary(stats).collect()}
    assert summ["T1"].all_n == 4 and summ["T1"].approved == 2 and summ["T1"].rejected == 1
    assert abs(summ["T1"].ratio - 0.67) < 1e-9
    assert summ["T2"].ratio is None


def test_rules_with_subsumption_planted_pair(spark):
    """A vo-bound rule with a same-head generalized twin is strictly
    subsumed; the twin, and an unrelated rule, are not — pins the
    positive branch the fixture-scale registry row never exercises
    (48 mined rules, 0 subsumed)."""
    from corhist_spark.rule_ops import rules_with_subsumption

    head = [("?s", "P1", "V1", "del")]
    rows = [
        ("r-specific", "c1", "V9", head, None, 12, 0.9),
        ("r-general", "c1", None, head, None, 20, 0.8),
        ("r-other", "c2", "V9", head, None, 12, 0.9),
    ]
    rules = spark.createDataFrame(
        rows,
        "rule_id string, constraint_id string, violation_obj string, "
        "head array<struct<subj:string,pred:string,obj:string,op:string>>, "
        "context array<struct<var:string,pred:string,obj:string>>, "
        "support long, confidence double",
    )
    got = {r["rule_id"]: r["is_subsumed"] for r in rules_with_subsumption(rules).collect()}
    assert got == {"r-specific": True, "r-general": False, "r-other": False}
