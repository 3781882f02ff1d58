"""Physical-plan audits (SURVEY §4): predicate pushdown reaches the
parquet scan, column pruning holds, broadcast joins are chosen for the
constraint table, and whole-stage codegen covers the hot paths."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def plan_of(spark):
    def get(df):
        return df._jdf.queryExecution().executedPlan().toString()

    return get


def test_filter_pushdown_to_parquet(spark, plan_of, tmp_path):
    p = str(tmp_path / "li")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").write.parquet(p)
    df = spark.read.parquet(p).filter("l_quantity > 40").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan, plan
    # column pruning: the scan schema only carries the two columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan, plan


def test_kernel_uses_broadcast_join(spark, sdf, corpus, plan_of):
    from corhist_spark.canonicalize import interval_closure
    from corhist_spark.kernels import correction_candidates, prepare_constraints
    from corhist_spark.state import build_state

    state = build_state(sdf["edits"])
    closure = interval_closure(state)
    cons = prepare_constraints(spark, corpus["constraints"])
    rows = correction_candidates(sdf["edits"], sdf["revisions"], state, closure, cons)
    plan = plan_of(rows)
    # AQE shows the initial plan pre-execution; broadcast choice for the
    # constraint table must already be locked in
    assert "BroadcastHashJoin" in plan


def test_textops_stay_jvm_side(spark, plan_of):
    """Dedup/minhash plans contain no Python evaluation nodes."""
    from corhist_spark.textops import minhash_signatures, simhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (minhash_signatures(docs), simhash(docs)):
        plan = plan_of(df)
        assert "Python" not in plan, plan


def test_flagship_plan_has_no_cartesian(spark, plan_of):
    import __spark_entry__ as e

    plan = plan_of(e.q_single_value_corrections(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_and_capped_lsh_stay_jvm_side(spark, plan_of):
    """The ANN family (bucketed near-dups, capped LSH candidates) is
    pure column expressions + hash joins: no Python nodes, no
    cartesian."""
    from corhist_spark.similarity import embedding_near_dups
    from corhist_spark.textops import lsh_candidates, minhash_signatures

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (embedding_near_dups(emb), lsh_candidates(minhash_signatures(docs))):
        plan = plan_of(df)
        assert "Python" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ivf_plan_shape(spark, plan_of):
    """knn_ivf: the ONLY nested-loop is the coarse assignment against
    the broadcast sqrt(N)-row centroid table (IVF's corpus x centroids
    step by definition); the probe->inverted-list search itself is a
    hash join, and nothing runs in Python."""
    from corhist_spark.similarity import knn_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_of(knn_ivf(emb))
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the centroid assignment is the one allowed BroadcastNestedLoopJoin
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_dedup_survivors_stays_jvm_side(spark, plan_of):
    import __spark_entry__ as e

    plan = plan_of(e.q_dedup_survivors(spark, "/root/testdata/sf0.001"))
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_extraction_uses_arrow_udf(spark, sdf, plan_of):
    """The only Python in the extraction plan is the Arrow-batched
    pandas UDF (ArrowEvalPython), never row-at-a-time BatchEvalPython."""
    from corhist_spark.extract import extract_triples

    plan = plan_of(extract_triples(sdf["documents"]))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# r6 (VERDICT r5 ask 5): structural audits of the heavy graph fixpoints.
# These operators do their work in EAGER localCheckpoint loops, so the
# final frame's plan proves nothing about the rounds; instead every
# pre-checkpoint plan of the loop is captured by intercepting
# DataFrame.localCheckpoint and audited — a cartesian product, a
# row-at-a-time Python node, or a runaway action count in ANY round
# fails structurally, without depending on wall-time noise.
# ---------------------------------------------------------------------------


def _loop_plans(fn):
    """Run fn() with DataFrame.localCheckpoint intercepted; return the
    executed-plan string of every frame the loop materializes."""
    # Spark 4 classic: instances are classic.dataframe.DataFrame, which
    # shadows the pyspark.sql.DataFrame facade — patch the class whose
    # method actually dispatches
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older layout
        from pyspark.sql import DataFrame

    plans = []
    orig = DataFrame.localCheckpoint

    def patched(self, *a, **k):
        plans.append(self._jdf.queryExecution().executedPlan().toString())
        return orig(self, *a, **k)

    DataFrame.localCheckpoint = patched
    try:
        fn()
    finally:
        DataFrame.localCheckpoint = orig
    return plans


def _assert_loop_shape(plans, max_actions, allow_bnlj=0):
    assert plans, "loop materialized nothing"
    assert len(plans) <= max_actions, (
        f"fixpoint scheduled {len(plans)} checkpoint actions (cap {max_actions}) — "
        "a shrinking-active-set early exit regressed"
    )
    for p in plans:
        assert "CartesianProduct" not in p, p
        assert "Python" not in p, p
        if not allow_bnlj:
            assert "BroadcastNestedLoopJoin" not in p, p


@pytest.mark.parametrize(
    "qname,max_actions",
    [
        # caps = generous bounds over the observed sf0.001 action counts;
        # they catch order-of-magnitude regressions (e.g. a lost early
        # exit or a checkpoint added inside an inner loop), not noise
        ("boruvka_mst", 40),
        ("scc_components", 60),
        ("luby_mis", 40),
        ("distance_distribution", 12),
        ("k_truss", 40),
    ],
)
def test_fixpoint_loop_plans(spark, qname, max_actions):
    import __spark_entry__ as e

    q = e.queries()[qname]
    plans = _loop_plans(lambda: q(spark, "/root/testdata/sf0.001"))
    _assert_loop_shape(plans, max_actions)
