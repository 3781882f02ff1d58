"""Rule-level utilities: text export and subsumption.

- ``rules_to_text``: the tab-joined pattern export of
  `corhist/.../mining/Main.java:129-140,251-279` (subject predicate
  object [graph] per pattern, confidence + support columns).
- ``is_more_precise``: `mining/ConstraintRuleInclusion.java:15-56` —
  rule a subsumes b iff a's violation pattern specializes b's under a
  consistent constant-for-variable substitution, every context atom of
  a specializes some atom of b, and heads are equal.  Rule sets are
  driver-small, so this is plain Python over collected rows (the
  reference never runs it in the main flow either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rules_to_text(rules: DataFrame) -> DataFrame:
    """One tab-separated line per rule: head patterns, violation
    pattern, context atoms, confidence, support."""
    head_txt = F.concat_ws(
        " ",
        F.transform(
            "head",
            lambda h: F.concat_ws(" ", h["subj"], h["pred"], h["obj"], h["op"]),
        ),
    )
    ctx_txt = F.concat_ws(
        " ",
        F.transform(
            "context",
            lambda c: F.concat_ws(" ", c["var"], c["pred"], c["obj"], F.lit("?g")),
        ),
    )
    viol_txt = F.concat_ws(
        " ", F.lit("?s"), F.col("constraint_id"), F.coalesce("violation_obj", F.lit("?o")), F.lit("?g")
    )
    line = F.concat_ws(
        "\t",
        viol_txt,
        ctx_txt,
        F.lit("=>"),
        head_txt,
        F.col("confidence").cast("string"),
        F.col("support").cast("string"),
    )
    return rules.select(line.alias("value"))


def top_rules_text(rules: DataFrame, k: int = 10) -> DataFrame:
    """`scripts/top_rules.py:8-9`: the k best rules by (confidence,
    support) descending (rule_id as the deterministic tiebreak), as
    rules_to_text lines."""
    return rules_to_text(
        rules.orderBy(F.desc("confidence"), F.desc("support"), F.asc("rule_id")).limit(k)
    )


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _term_more_precise(a: str, b: str, bindings: dict) -> bool:
    """`isVarSelectionMorePrecise`: constants must match; a constant in
    ``a`` may instantiate a variable of ``b`` once (consistently)."""
    if not _is_var(a):
        if not _is_var(b):
            return a == b
        if b in bindings:
            return bindings[b] == a
        bindings[b] = a
        return True
    return a == b


def _pattern_more_precise(a: tuple, b: tuple, bindings: dict) -> bool:
    return all(_term_more_precise(x, y, bindings) for x, y in zip(a, b))


def is_more_precise(rule_a: dict, rule_b: dict) -> bool:
    """rule dicts: constraint_id, violation_obj (None = '?o'), head
    (list of (subj, pred, obj, op)), context (list of (var, pred, obj))."""
    if rule_a["constraint_id"] != rule_b["constraint_id"]:
        return False
    bindings: dict = {}
    va = ("?s", rule_a["constraint_id"], rule_a["violation_obj"] or "?o")
    vb = ("?s", rule_b["constraint_id"], rule_b["violation_obj"] or "?o")
    if not _pattern_more_precise(va, vb, bindings):
        return False
    for ca in rule_a.get("context") or []:
        if not any(
            _pattern_more_precise(tuple(ca), tuple(cb), dict(bindings))
            for cb in rule_b.get("context") or []
        ):
            return False
    return sorted(rule_a["head"]) == sorted(rule_b["head"])


def subsumed_rule_ids(rules: DataFrame) -> list[str]:
    """Rule ids strictly subsumed by a different rule (driver-side
    pairwise check, rule sets are small)."""
    rows = [
        dict(
            rule_id=r.rule_id,
            constraint_id=r.constraint_id,
            violation_obj=r.violation_obj,
            head=[(h.subj, h.pred, h.obj, h.op) for h in r.head],
            context=[(c.var, c.pred, c.obj) for c in (r.context or [])],
        )
        for r in rules.collect()
    ]
    out = []
    for a in rows:
        for b in rows:
            if a["rule_id"] != b["rule_id"] and is_more_precise(a, b) and not is_more_precise(b, a):
                out.append(a["rule_id"])
                break
    return out


def rules_with_subsumption(rules: DataFrame) -> DataFrame:
    """Rule table annotated with the strict-subsumption flag
    (`.../Rule.java` isMorePrecise semantics via
    ``subsumed_rule_ids`` — the driver-small pairwise check, as the
    reference runs it): (rule_id, constraint_id, violation_obj,
    support, is_subsumed).  A subsumed rule is one a strictly more
    general twin exists for (same canonical head, same constraint,
    its bound violation value generalized away) — the pruning pass
    before rules ship to the live game queue."""
    sub = set(subsumed_rule_ids(rules))
    return rules.select(
        "rule_id", "constraint_id", "violation_obj", "support"
    ).withColumn(
        "is_subsumed",
        F.col("rule_id").isin(sorted(sub)) if sub else F.lit(False),
    )
