"""Iterative graph operators Catalyst can't express in one plan:
connected components (sameAs/redirect canonicalization) and the
P279 subclass transitive closure (`wdt:P279*` paths used by the
type/valueType kernels, `corhist/.../dataset/queries/TypeQueriesBuilder.java:37,44`).

Both are driver-orchestrated DataFrame loops with per-round
localCheckpoint to cut lineage — the standard Spark pattern for
fixpoint iteration at scale (each round is one shuffle keyed by the
join column; rounds are logarithmic for CC, bounded by hierarchy depth
for the closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import SUBCLASS_OF


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Min-label propagation over undirected edges(src, dst) ->
    (node, component) where component is the lexicographic min member.

    Large-star/small-star style simplification: we propagate the
    current best label across edges until no label changes.  Each round
    is a groupBy shuffle on node; convergence in O(log n) rounds for
    path graphs worst-case O(diameter).
    """
    # materialize the symmetrized edge set ONCE: every round joins
    # against sym, and without the lineage cut the full upstream plan
    # (e.g. the LSH + Jaccard dedup chain feeding dedup_survivors)
    # would re-execute per round
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("node"), F.col("dst").alias("label"))
        .union(sym.select(F.col("src").alias("node"), F.col("src").alias("label")))
        .groupBy("node")
        .agg(F.min("label").alias("component"))
    ).localCheckpoint()

    for _ in range(max_iter):
        # push each node's label to its neighbors, keep the min seen
        prop = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("component").alias("label"))
            .union(labels.select("node", F.col("component").alias("label")))
            .groupBy("node")
            .agg(F.min("label").alias("component"))
        )
        # also collapse label -> its own component (pointer jumping):
        # relabel through the label's current component.  The previous
        # component rides along in the SAME checkpointed frame so the
        # convergence check below is a scan of already-materialized
        # rows instead of a second shuffle-join job per iteration (the
        # fixpoint runs 2 actions/round -> 1 action + 1 cheap scan)
        jumped = (
            prop.alias("a")
            .join(labels.alias("b"), F.col("a.component") == F.col("b.node"), "left")
            .join(
                labels.select(
                    F.col("node").alias("p_node"), F.col("component").alias("prev")
                ),
                F.col("a.node") == F.col("p_node"),
            )
            .select(
                F.col("a.node").alias("node"),
                F.least(F.col("a.component"), F.coalesce(F.col("b.component"), F.col("a.component"))).alias("component"),
                F.col("prev"),
            )
        ).localCheckpoint()
        changed = not jumped.filter(F.col("component") != F.col("prev")).isEmpty()
        labels = jumped.select("node", "component")
        if not changed:
            break
    return labels


def canonicalize_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Remap subj/obj of triples(subj, pred, obj, ...) through the
    component table.  components is broadcast when small; at 100 TB the
    mapping is a shuffle join keyed on the id column."""
    comp = F.broadcast(components)
    out = (
        triples.join(comp.withColumnRenamed("node", "subj").withColumnRenamed("component", "subj_canon"), "subj", "left")
        .join(comp.withColumnRenamed("node", "obj").withColumnRenamed("component", "obj_canon"), "obj", "left")
        .withColumn("subj", F.coalesce("subj_canon", "subj"))
        .withColumn("obj", F.coalesce("obj_canon", "obj"))
        .drop("subj_canon", "obj_canon")
    )
    return out


def static_closure(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Transitive closure of edges(cls, parent) -> (cls, anc) by path
    doubling: each round composes the closure with itself, so a
    depth-d hierarchy converges in ceil(log2(d)) + 1 rounds instead of
    d (the reference's `P279*` is evaluated by its store; our loop is
    the distributed equivalent).  Non-reflexive; callers add the
    reflexive case with a direct membership check.  Safe under cycles
    (exact-row dedupe + fixpoint count)."""
    closure = edges.select("cls", F.col("parent").alias("anc")).distinct().localCheckpoint()
    size = closure.count()
    for _ in range(max_iter):
        right = closure.select(F.col("cls").alias("r_cls"), F.col("anc").alias("r_anc"))
        new = (
            closure.join(right, F.col("anc") == F.col("r_cls"))
            .select("cls", F.col("r_anc").alias("anc"))
        )
        grown = closure.union(new).distinct().localCheckpoint()
        new_size = grown.count()
        if new_size == size:
            break
        closure, size = grown, new_size
    return closure


def interval_closure(state: DataFrame, max_iter: int = 20) -> DataFrame:
    """Time-travelling P279 closure over the interval-form state table:
    (cls, anc, from_rev, to_rev) such that ``cls P279* anc`` (one or
    more hops) holds in globalState(g) for every from_rev <= g < to_rev.

    Each hop intersects validity intervals; rows with empty
    intersections are dropped by the join range predicate.  The P279
    edge set is tiny relative to the corpus (class hierarchy), so this
    loop is cheap even at full scale.
    """
    edges = state.filter(F.col("pred") == SUBCLASS_OF).select(
        F.col("subj").alias("cls"), F.col("obj").alias("anc"), "from_rev", "to_rev"
    )
    closure = edges.distinct().localCheckpoint()
    edges_r = edges.select(
        F.col("cls").alias("e_cls"),
        F.col("anc").alias("e_anc"),
        F.col("from_rev").alias("e_from"),
        F.col("to_rev").alias("e_to"),
    )
    frontier = closure
    for _ in range(max_iter):
        nxt = (
            frontier.join(
                edges_r,
                (F.col("anc") == F.col("e_cls"))
                & (F.col("from_rev") < F.col("e_to"))
                & (F.col("e_from") < F.col("to_rev")),
            )
            .select(
                "cls",
                F.col("e_anc").alias("anc"),
                F.greatest(F.col("from_rev"), F.col("e_from")).alias("from_rev"),
                F.least(F.col("to_rev"), F.col("e_to")).alias("to_rev"),
            )
            .distinct()
            .join(closure, ["cls", "anc", "from_rev", "to_rev"], "left_anti")
        ).localCheckpoint()
        if nxt.isEmpty():
            break
        closure = closure.union(nxt).localCheckpoint()
        frontier = nxt
    return closure
