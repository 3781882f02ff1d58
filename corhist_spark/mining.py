"""Rule mining as grouped pattern aggregation.

Transcribes `corhist/.../mining/Miner.java`:

- ``possibleBasicRules`` (`:47-97`): per correction emit TWO violation
  patterns — object generalized to ``?o`` and object kept constant —
  with bindings (s, o, g) / (s, g), g = globalState(previousRevision
  (corrRev)).  Correction statements generalize each term to ``?s`` /
  ``?o`` when it equals the corresponding bound value (`:99-117`,
  binding-name order s before o, as in ListBindingSet(SOG)).
- support = |full bindings|, stdConfidence = full/body
  (`ConstraintRule.java:51-57`), thresholds MIN_SUPPORT=10,
  MIN_STD_CONFIDENCE=0.5 (`:21-22`).
- ``refineWithGraph`` (`:123-144`): depth-1 context atoms (var, p, o, g)
  and (var, p, ?v, g) proposed from the outgoing triples of every value
  the var binds to; a refinement is kept only if thresholds hold AND
  confidence improves by more than IMPROVEMENT_STEP=0.05.  The original
  rule is always kept.

Everything is groupBy/join — the reference's per-constraint in-memory
HashMaps become two shuffles over all constraints at once.

Rule representation (`SURVEY.md §1.1` row 6): pattern variables are the
reserved tokens '?s' '?o' '?v' inside plain string columns; NULL
violation_obj means the generalized ``?o`` pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_SUPPORT = 10
MIN_STD_CONFIDENCE = 0.5
IMPROVEMENT_STEP = 0.05


def corrections_with_g(corrections: DataFrame, revisions: DataFrame) -> DataFrame:
    """Attach g = previousRevision(corr_rev) (`Miner.java:86`)."""
    prev = revisions.select(
        F.col("rev_id").alias("corr_rev"), F.col("parent_rev_id").alias("g")
    )
    return corrections.join(prev, "corr_rev", "left")


def _head_tokens(binding_has_o: bool):
    """Generalize one correction statement against the binding
    (`Miner.java:99-117`): term -> '?s' if it equals the bound s, else
    '?o' if it equals the bound o (only when o is bound), else itself.
    Predicate and op stay constant."""

    def tok(term):
        e = F.when(term == F.col("target_subj"), F.lit("?s"))
        if binding_has_o:
            e = e.when(term == F.col("target_obj"), F.lit("?o"))
        return e.otherwise(term)

    # array_distinct: the reference holds a Set<StatementPattern> —
    # two statements that generalize to the same pattern collapse
    return F.array_sort(
        F.array_distinct(
            F.transform(
                F.col("correction"),
                lambda st: F.struct(
                    tok(st["subj"]).alias("subj"),
                    st["pred"].alias("pred"),
                    tok(st["obj"]).alias("obj"),
                    st["op"].alias("op"),
                ),
            )
        )
    )


def basic_rule_bindings(corrections_g: DataFrame) -> DataFrame:
    """One row per (correction, violation-pattern variant):
    (constraint_id, violation_obj nullable, head, s, o, g).
    ``head`` is the canonically sorted generalized correction pattern."""
    gen = corrections_g.select(
        "constraint_id",
        F.lit(None).cast("string").alias("violation_obj"),
        _head_tokens(True).alias("head"),
        F.col("target_subj").alias("s"),
        F.col("target_obj").alias("o"),
        "g",
    )
    const = corrections_g.select(
        "constraint_id",
        F.col("target_obj").alias("violation_obj"),
        _head_tokens(False).alias("head"),
        F.col("target_subj").alias("s"),
        F.lit(None).cast("string").alias("o"),
        "g",
    )
    return gen.unionByName(const)


def mine_basic_rules(
    corrections: DataFrame,
    revisions: DataFrame,
    min_support: int = MIN_SUPPORT,
    min_confidence: float = MIN_STD_CONFIDENCE,
):
    """-> (rules DF, bindings DF).

    rules: (rule_id, constraint_id, violation_obj, head, context(empty),
    support, confidence, body_n); bindings keep one (constraint_id,
    violation_obj, head, s, o, g) row per (correction, variant) for the
    refinement round.
    """
    # localCheckpoint cuts the (potentially very deep) upstream lineage
    # of the corrections pipeline — the refinement round self-joins this
    # frame several times and would otherwise re-analyze the whole tree
    b = basic_rule_bindings(corrections_with_g(corrections, revisions)).localCheckpoint()

    body = b.groupBy("constraint_id", "violation_obj").agg(F.count(F.lit(1)).alias("body_n"))
    full = b.groupBy("constraint_id", "violation_obj", "head").agg(
        F.count(F.lit(1)).alias("support")
    )
    body_r = body.select(
        F.col("constraint_id").alias("b_cid"),
        F.col("violation_obj").alias("b_vobj"),
        "body_n",
    )
    rules = (
        # null-safe join: violation_obj NULL (the generalized ?o
        # pattern) is a real group key
        full.join(
            body_r,
            (full["constraint_id"] == body_r["b_cid"])
            & full["violation_obj"].eqNullSafe(body_r["b_vobj"]),
        )
        .drop("b_cid", "b_vobj")
        .withColumn("confidence", F.col("support") / F.col("body_n"))
        .filter((F.col("support") >= min_support) & (F.col("confidence") >= min_confidence))
        .withColumn(
            "rule_id",
            F.sha2(
                F.concat_ws(
                    "\x1f",
                    "constraint_id",
                    F.coalesce("violation_obj", F.lit("?o")),
                    F.to_json("head"),
                ),
                256,
            ),
        )
        .withColumn("context", F.array().cast("array<struct<var:string,pred:string,obj:string>>"))
        .select("rule_id", "constraint_id", "violation_obj", "head", "context", "support", "confidence", "body_n")
    ).localCheckpoint()
    return rules, b


def refine_rules(
    rules: DataFrame,
    bindings: DataFrame,
    state: DataFrame,
    min_support: int = MIN_SUPPORT,
    min_confidence: float = MIN_STD_CONFIDENCE,
    improvement: float = IMPROVEMENT_STEP,
) -> DataFrame:
    """Depth-1 refinement (`Miner.java:123-144`).  Returns base rules
    plus surviving refined rules (context = one atom)."""
    st = state.select(
        F.col("subj").alias("st_subj"),
        F.col("pred").alias("st_pred"),
        F.col("obj").alias("st_obj"),
        F.col("from_rev").alias("st_from"),
        F.col("to_rev").alias("st_to"),
    )

    rule_keys = rules.select("rule_id", "constraint_id", "violation_obj", "confidence", "body_n", "support")

    # full bindings of a rule: binding rows whose (constraint_id,
    # violation_obj, head) match; body bindings: match on (constraint_id,
    # violation_obj) only.
    r = rules.select("rule_id", "constraint_id", "violation_obj", "head", "confidence")
    # join on a fixed-width head digest instead of the serialized JSON:
    # both sides still hash the canonical head once, but the shuffle
    # key is 64 bytes rather than the whole statement array
    head_key = lambda c: F.sha2(F.to_json(c), 256)  # noqa: E731
    fullb = bindings.alias("b").join(
        r.alias("r"),
        (F.col("b.constraint_id") == F.col("r.constraint_id"))
        & F.col("b.violation_obj").eqNullSafe(F.col("r.violation_obj"))
        & (head_key(F.col("b.head")) == head_key(F.col("r.head"))),
    ).select("rule_id", "s", "o", "g")
    bodyb = bindings.alias("b").join(
        r.select("rule_id", "constraint_id", "violation_obj").alias("r"),
        (F.col("b.constraint_id") == F.col("r.constraint_id"))
        & F.col("b.violation_obj").eqNullSafe(F.col("r.violation_obj")),
    ).select("rule_id", "s", "o", "g")

    # candidate atoms: for each var, each value it binds to, the value's
    # outgoing triples -> (var, pred, obj) and (var, pred, '?v')
    var_vals = (
        fullb.select("rule_id", F.lit("?s").alias("var"), F.col("s").alias("val"))
        .union(fullb.filter(F.col("o").isNotNull()).select("rule_id", F.lit("?o"), F.col("o")))
        .distinct()
    )
    atoms_const = (
        var_vals.join(st, F.col("val") == F.col("st_subj"))
        .select("rule_id", "var", F.col("st_pred").alias("a_pred"), F.col("st_obj").alias("a_obj"))
        .distinct()
    )
    atoms = atoms_const.unionByName(
        atoms_const.select("rule_id", "var", "a_pred", F.lit("?v").alias("a_obj")).distinct()
    )

    def count_matches(bdf: DataFrame, label: str) -> DataFrame:
        """Sum over bindings of the number of state matches of the atom
        at the binding's g (flatMap semantics — one row per match)."""
        j = bdf.join(atoms, "rule_id")
        val = F.when(F.col("var") == "?s", F.col("s")).otherwise(F.col("o"))
        m = j.join(
            st,
            (F.col("st_subj") == val)
            & (F.col("st_pred") == F.col("a_pred"))
            & ((F.col("a_obj") == "?v") | (F.col("st_obj") == F.col("a_obj")))
            & (F.col("st_from") <= F.col("g"))
            & (F.col("g") < F.col("st_to")),
        )
        return m.groupBy("rule_id", "var", "a_pred", "a_obj").agg(
            F.count(F.lit(1)).alias(label)
        )

    new_full = count_matches(fullb, "new_support")
    new_body = count_matches(bodyb, "new_body")
    refined = (
        new_full.join(new_body, ["rule_id", "var", "a_pred", "a_obj"])
        .join(rule_keys.select("rule_id", "constraint_id", "violation_obj", F.col("confidence").alias("base_conf")), "rule_id")
        .withColumn("confidence", F.col("new_support") / F.col("new_body"))
        .filter(
            (F.col("new_support") >= min_support)
            & (F.col("confidence") >= min_confidence)
            & (F.col("confidence") > F.col("base_conf") + improvement)
        )
    )
    base_heads = rules.select("rule_id", "head")
    refined_rules = (
        refined.join(base_heads, "rule_id")
        .select(
            F.concat_ws("#", "rule_id", "var", "a_pred", "a_obj").alias("rule_id"),
            "constraint_id",
            "violation_obj",
            "head",
            F.array(
                F.struct(
                    F.col("var").alias("var"),
                    F.col("a_pred").alias("pred"),
                    F.col("a_obj").alias("obj"),
                )
            ).alias("context"),
            F.col("new_support").alias("support"),
            "confidence",
        )
    )
    base = rules.select(
        "rule_id", "constraint_id", "violation_obj", "head", "context", "support", "confidence"
    )
    return base.unionByName(refined_rules)


def mine(
    corrections: DataFrame,
    revisions: DataFrame,
    state: DataFrame,
    min_support: int = MIN_SUPPORT,
    min_confidence: float = MIN_STD_CONFIDENCE,
) -> DataFrame:
    """Full mining pass: basic rules + depth-1 refinement."""
    rules, bindings = mine_basic_rules(corrections, revisions, min_support, min_confidence)
    return refine_rules(rules, bindings, state, min_support, min_confidence)
