"""Salted-join equivalence on the fixture's hot-entity cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from corhist_spark.fixtures import HOT_ENTITY
from corhist_spark.skew import hot_keys, salted_join


def test_hot_key_detected(spark, sdf):
    adds = sdf["edits"].filter(F.col("op") == "add")
    hot = {r.obj for r in hot_keys(adds, "obj", threshold_share=0.05).collect()}
    assert HOT_ENTITY in hot  # the planted Q5-analog cluster


def test_lsh_bucket_cap_bounds_degenerate_bucket(spark):
    """Banding hygiene: a planted degenerate bucket (100 identical
    docs -> every band hot) must produce ZERO candidate pairs under the
    cap, while a genuine small near-dup pair survives."""
    from corhist_spark.textops import lsh_candidates, minhash_signatures

    boiler = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [(f"hot{i:03d}", boiler) for i in range(100)]
    rows += [("near_a", "unique sparkling zebra quartz venture " * 4),
             ("near_b", "unique sparkling zebra quartz venture " * 4 + "tail")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = lsh_candidates(minhash_signatures(docs), max_bucket=64)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert ("near_a", "near_b") in got
    assert all(not a.startswith("hot") and not b.startswith("hot") for a, b in got)
    # uncapped, the degenerate bucket alone is C(100,2) = 4950 pairs
    uncapped = lsh_candidates(minhash_signatures(docs), max_bucket=1 << 30)
    assert uncapped.count() >= 4950


def test_unique_kernel_salting_result_neutral(spark):
    """kernels._unique under a planted hot value (one (pred, obj) held
    by 120 subjects): the salted value-group self-join must emit exactly
    the unsalted rows — the guard redistributes, never drops."""
    from corhist_spark import kernels as K
    from corhist_spark import schemas as S

    n = 120
    # every subject holds (P9, HOT) from rev 1; subject i deletes it at
    # rev 1000+i (so parent g sees all other holders still in state)
    edits = spark.createDataFrame(
        [(1, "add", f"Q{i}", "P9", "HOT", "iri") for i in range(n)]
        + [(1000 + i, "del", f"Q{i}", "P9", "HOT", "iri") for i in range(n)],
        "rev_id long, op string, subj string, pred string, obj string, obj_kind string",
    )
    from corhist_spark.history import derived_revisions
    from corhist_spark.state import build_state

    revisions = derived_revisions(edits)
    state = build_state(edits)
    cons_pdf = __import__("pandas").DataFrame(
        [{"constraint_id": "c-u", "property": "P9", "type": S.TYPE_UNIQUE, "params": {}}]
    )
    cons = K.prepare_constraints(spark, cons_pdf)

    def run(n_salts):
        dels = K._diff_with_meta(edits, revisions, "del", need_prev=True)
        rows = K._unique(
            dels, K._st(state), K._sameas_adds(edits), F.broadcast(cons), n_salts=n_salts
        )
        return {tuple(r) for r in rows.collect()}

    salted, unsalted = run(8), run(1)
    assert salted == unsalted and len(salted) > 0


def test_salted_join_equals_plain_join(spark, sdf):
    adds = sdf["edits"].filter(F.col("op") == "add").select("subj", "pred", "obj")
    dim = spark.createDataFrame(
        [(HOT_ENTITY, "hot"), ("Q5000", "cold"), ("Q900", "class")],
        "obj string, label string",
    )
    plain = {(r.subj, r.pred, r.obj, r.label) for r in adds.join(dim, "obj").collect()}
    salted = {
        (r.subj, r.pred, r.obj, r.label)
        for r in salted_join(adds, dim, "obj", n_salts=4).collect()
    }
    assert salted == plain and plain


def test_skew_profile_recommends_salts_for_hot_keys(spark):
    from corhist_spark.skew import skew_profile

    rows = [("hot",)] * 2500 + [("warm",)] * 500 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = {r["key"]: r for r in skew_profile(df, "k", target_per_task=1000).collect()}
    assert got["hot"]["freq"] == 2500 and got["hot"]["recommended_salts"] == 3
    assert got["warm"]["recommended_salts"] == 1
    assert got["hot"]["n_keys"] == 3 and got["hot"]["n_rows"] == 3010
    assert got["hot"]["share"] == round(2500 / 3010, 6)

    df2 = skew_profile(df, "k")
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_partition_advisor_integer_ceil(spark):
    from corhist_spark.skew import partition_advisor

    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 100), (3, "z" * 50)],
        "doc_id long, text string",
    )
    row = partition_advisor(docs, target_bytes=100).collect()[0]
    assert (row["n_rows"], row["n_bytes"]) == (3, 250)
    assert row["recommended_partitions"] == 3  # ceil(250/100)
    assert row["rows_per_partition"] == 1
