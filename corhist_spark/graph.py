"""Whole-graph analytics over the canonicalized KG: per-node triangle
counts / clustering coefficients and fixed-iteration PageRank.

The reference mines rules from the revision history but never profiles
the GRAPH it builds; once a pipeline materializes canonical triples at
10^12-document scale, graph-shape statistics (local clustering, node
centrality) are the standard next consumers — these are the
kg_construct graft-mandate counterparts of the ANN/dedup family, built
on public algorithms:

- Triangle counting uses the degree-orientation technique (Suri &
  Vassilvitskii, "Counting Triangles and the Curse of the Last
  Reducer", WWW 2011): orient every undirected edge from its
  lower-(degree, id) endpoint to the higher one, enumerate wedges only
  from each node's OUT-neighbors, and close them against the oriented
  edge set.  Out-degree under this orientation is O(sqrt(m)) even for
  hub nodes, so wedge volume is bounded by sum(d_out^2) <= m^1.5 —
  the skew-proof bound that makes the plan survive power-law degree
  distributions (a hub with degree 10^6 contributes wedges only
  through its low-degree neighbors).  Every step is an equi-join /
  aggregate shuffled on node keys; no broadcast, no cartesian.

- PageRank (Brin & Page 1998) runs a fixed number of synchronous
  power-iteration rounds with uniform teleport and dangling-mass
  redistribution.  The adjacency (src, dst, out_degree) is derived
  once and localCheckpoint-ed so the upstream plan never re-executes;
  each round is exactly one shuffle join (ranks x adjacency on src)
  plus one groupBy(dst) partial-aggregated sum.  At cluster scale the
  adjacency would be a bucketed table on src so every round's join is
  co-located; rank frames are checkpointed per round to cut lineage
  (same fixpoint pattern as canonicalize.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_ITERS = 8
PR_DAMPING = 0.85


def triangle_counts(edges: DataFrame, canon: DataFrame | None = None) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over an undirected edge list ``edges(src, dst)`` (duplicates,
    reversed duplicates and self-loops are cleaned here).

    Returns (node, degree, n_triangles, clustering) where clustering =
    2*T / (deg*(deg-1)) rounded to 6 decimals (0.0 for degree < 2).

    Each triangle {x, y, z} (ranked x < y < z by (degree, node)) is
    found exactly once: as the wedge (y, z) out of x closed by the
    oriented edge y -> z — no pair-ordering dedup needed because the
    oriented edge set contains each edge in one direction only.
    """
    canon = canon if canon is not None else _undirected(edges).localCheckpoint()
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient each edge from the lower-(degree, node) endpoint to the
    # higher — two node-keyed equi-joins against the degree table
    with_deg = (
        canon.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
    )
    lower_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint()
    # wedges out of each node's out-neighborhood (bounded by the
    # orientation), closed against the oriented edge set
    o1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    o2 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    wedges = o1.join(o2, "x").filter(F.col("y") != F.col("z"))
    tris = wedges.join(
        oriented,
        (F.col("y") == F.col("u")) & (F.col("z") == F.col("v")),
        "left_semi",
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def pagerank(
    edges: DataFrame, n_iters: int = PR_ITERS, damping: float = PR_DAMPING
) -> DataFrame:
    """Fixed-``n_iters`` synchronous PageRank over a directed edge list
    ``edges(src, dst)`` (duplicates/self-loops cleaned here; a
    self-loop is a legitimate sink-avoiding edge in some formulations
    but we drop it to match the classic definition).

    Returns (node, rank_norm) with rank_norm = rank * n_nodes rounded
    to 6 decimals (1.0 = the uniform-rank baseline) — normalizing
    before rounding keeps ~6 significant digits regardless of graph
    size, and the cross-engine float contract (sums whose addition
    order differs between engines agree to ~1e-12, far inside the
    rounding grid) matches the repo-wide precedent (cosines, NLLs).

    Dangling mass (rank sitting on nodes with no out-edges) is
    redistributed uniformly each round, so total rank is conserved and
    sums to 1 every iteration.  The per-round dangling scalar rides
    the round's OWN plan as a broadcast single-row aggregate over the
    previous (checkpointed, node-sized) rank frame — one job per
    round, no driver round-trip between rounds.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    # adjacency with out-degree attached, derived once; at cluster
    # scale this is the bucketed-by-src table every round re-reads
    adj = e.join(outdeg, "src").localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(n_iters):
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        contribs = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(F.col("dst"), (F.col("rank") / F.col("odeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dang))  # single-row totals frame
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node", F.round(F.col("rank") * F.lit(float(n)), 6).alias("rank_norm")
    )


LPA_ITERS = 4


def label_propagation(
    edges: DataFrame, n_iters: int = LPA_ITERS, canon: DataFrame | None = None
) -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert & Kumara 2007)
    over the undirected graph of ``edges(src, dst)``, run a fixed
    ``n_iters`` rounds -> (node, label): cheap community detection
    for KG shape profiling (densely interlinked entity clusters keep
    converging onto one label).

    Deterministic by construction, unlike the paper's asynchronous
    random-sweep variant: labels start as the node's own id, every
    round each node takes the most frequent label among its
    neighbors, and frequency ties break toward the SMALLEST label —
    integer/string comparisons only, no floats anywhere, so the
    DuckDB transcription is exact.

    Scale shape: each round is ONE node-keyed equi-join (labels onto
    the reversed adjacency) + one partial-aggregated count + one
    per-node window over <= degree distinct labels; at cluster scale
    the adjacency is bucketed on the join side so every round
    co-locates, and label frames are checkpointed per round to cut
    lineage (the pagerank/closure fixpoint pattern)."""
    canon = canon if canon is not None else _undirected(edges)
    und = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    labels = und.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(n_iters):
        neigh = und.join(labels, und["v"] == labels["node"]).select(
            und["u"].alias("node"), "label"
        )
        labels = (
            neigh.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels


WALK_STEPS = 4


def random_walks(
    edges: DataFrame, n_steps: int = WALK_STEPS, canon: DataFrame | None = None
) -> DataFrame:
    """DeepWalk-style walk corpus over the undirected graph of
    ``edges(src, dst)`` — one ``n_steps``-step walk started at EVERY
    node -> (walk, step, node) rows, step 0..n_steps: the corpus a
    graph-embedding trainer (DeepWalk, Perozzi et al. 2014 /
    node2vec, Grover & Leskovec 2016 — both public) consumes, and the
    kg_construct bridge from the materialized graph back into
    training-data generation.

    The classic samplers draw the next hop from an RNG; here the next
    hop from v at step t is the neighbor u minimizing the
    deterministic 52-bit md5 hash of "walk:t:u" (ties by u) — the
    same hash-in-place-of-RNG choice as stratified sampling, making
    walks reproducible across engines, runs and partitionings, and
    the whole corpus DuckDB-transcribable.  Each walk mixes the walk
    id and step into the hash, so different walks take different
    turns at the same node.

    Scale shape: step t is ONE node-keyed equi-join (frontier x
    adjacency, candidate volume = sum of frontier degrees <= 2m) plus
    a per-walk argmin window over <= degree candidates — linear per
    step, n_steps a small constant; the frontier is checkpointed per
    step like every other fixpoint loop."""
    canon = canon if canon is not None else _undirected(edges)
    und = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    frontier = und.select(F.col("u").alias("walk")).distinct().withColumn(
        "node", F.col("walk")
    )
    out = frontier.withColumn("step", F.lit(0))
    # next-hop argmin as a MIN over struct(h, v) — identical pick to
    # the old row_number window's (h ASC, v ASC), both fields non-null,
    # but partially aggregated map-side instead of a per-walk sort
    for t in range(1, n_steps + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["u"])
            .withColumn(
                "h",
                F.expr(
                    f"CAST(conv(substr(md5(concat(walk, ':', '{t}', ':', v)), 1, 13),"
                    " 16, 10) AS BIGINT)"
                ),
            )
            .groupBy("walk")
            .agg(F.min(F.struct("h", "v")).alias("_best"))
            .select("walk", F.col("_best.v").alias("node"))
            .localCheckpoint()
        )
        out = out.unionByName(nxt.withColumn("step", F.lit(t)))
        frontier = nxt
    return out.select("walk", "step", "node")


def predicate_pmi(state: DataFrame) -> DataFrame:
    """Pointwise mutual information between predicate PAIRS over the
    subjects that carry both — the KG schema-shape statistic that
    surfaces strongly coupled properties (e.g. birth-date ~ birth-
    place) for constraint/rule mining: (pred_a, pred_b, n_both, pmi)
    with pred_a < pred_b, presence-based (distinct subject-predicate),
    pmi = ln(n_both * n_subjects / (n_a * n_b)) rounded to 6 decimals
    — the ratio is formed as ONE double division of two EXACT BIGINT
    products, so both engines feed ln the identical double.

    Scale shape: one distinct over (subj, pred), then a subject-keyed
    self-join whose per-subject output is bounded by the predicate
    vocabulary (a KG has thousands of properties, not billions), then
    a pair-keyed count — the only corpus-sized shuffles are the
    distinct and the subject join; marginals and the subject total
    are property-vocabulary-sized and broadcast."""
    sp = state.select("subj", "pred").distinct().localCheckpoint()
    n = sp.select(F.countDistinct("subj").alias("n_subjects"))
    marg = sp.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pred"))
    a = sp.select("subj", F.col("pred").alias("pred_a"))
    bb = sp.select("subj", F.col("pred").alias("pred_b"))
    pairs = (
        a.join(bb, "subj")
        .filter(F.col("pred_a") < F.col("pred_b"))
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("pred").alias("pred_a"), F.col("n_pred").alias("n_a"))),
            "pred_a",
        )
        .join(
            F.broadcast(marg.select(F.col("pred").alias("pred_b"), F.col("n_pred").alias("n_b"))),
            "pred_b",
        )
        .crossJoin(F.broadcast(n))  # single-row totals frame
        .select(
            "pred_a",
            "pred_b",
            "n_both",
            F.round(
                F.log(
                    (F.col("n_both") * F.col("n_subjects")).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )

KCORE_K = 3
KCORE_ROUNDS = 6


def _undirected(edges: DataFrame) -> DataFrame:
    """Canonical undirected distinct edge list (a < b, self-loops and
    duplicates dropped) — the shared preamble of every undirected
    analytic here."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def k_core(
    edges: DataFrame,
    k: int = KCORE_K,
    n_rounds: int = KCORE_ROUNDS,
    canon: DataFrame | None = None,
) -> DataFrame:
    """k-core of the undirected graph of ``edges(src, dst)`` by
    ``n_rounds`` synchronous peeling rounds (Matula & Beck 1983; the
    distributed formulation is the standard Pregel-style peel): each
    round recomputes degrees over the SURVIVING edge set and drops
    every node with degree < k together with its incident edges.
    Returns (node, core_degree) — the surviving nodes with their
    within-core degree; at fixpoint every core_degree >= k and the
    node set is exactly the k-core.

    A fixed round count keeps the computation a deterministic function
    of the input on both engines (the LPA/Lloyd unrolled-transcription
    contract); at cluster scale the loop instead runs until a round
    removes nothing (one cheap count per round), which the fixed bound
    upper-approximates on the fixture graphs — peeling converges in
    O(peel depth) rounds, small for the ~constant-degree KG graphs
    profiled here.

    Scale shape: one node-keyed partial-aggregated degree count + two
    semi-joins of the edge set against the (node-sized) survivor list
    per round — no broadcast of anything corpus-sized, edge frames
    checkpointed per round to cut lineage.  Survivor lists are
    node-sized and usually broadcast-able; Catalyst/AQE picks that up
    at runtime without the plan pinning it."""
    e = canon if canon is not None else _undirected(edges).localCheckpoint()
    for _ in range(n_rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        keep = deg.filter(F.col("c") >= k).select("node")
        e = (
            e.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


BFS_ROUNDS = 4


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = BFS_ROUNDS,
    canon: DataFrame | None = None,
) -> DataFrame:
    """Multi-source breadth-first distances over the undirected graph
    of ``edges(src, dst)`` from the ``seeds(node)`` set, bounded at
    ``n_rounds`` hops -> (node, dist): dist = exact shortest-path hop
    count for every node within n_rounds of a seed, seeds at 0; nodes
    farther than n_rounds are absent.  The bounded-radius reachability
    profile a KG curator reads off the seed entities (e.g. "how much
    of the graph sits within 4 hops of the typed backbone") — and the
    neighborhood-sampling primitive of GraphSAGE-style trainers
    (Hamilton et al. 2017, public).

    Integer-only (hop counters, min-distance by construction: a node
    enters the distance table the first round it is reachable and is
    anti-joined away afterwards), so the DuckDB unrolled
    transcription is exact.

    Scale shape: round t is ONE node-keyed equi-join (frontier x
    adjacency — candidate volume = sum of frontier degrees) + a
    distinct + an anti-join against the visited set; frontiers are
    checkpointed per round, and the visited set grows monotonically
    to at most the node table.  No broadcast of anything
    corpus-sized; at cluster scale the adjacency is bucketed on u so
    every round's probe co-locates."""
    canon = canon if canon is not None else _undirected(edges)
    und = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    dist = (
        seeds.select("node")
        .distinct()
        .join(nodes, "node", "left_semi")
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    for t in range(1, n_rounds + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .localCheckpoint()
        )
        dist = dist.unionByName(nxt.withColumn("dist", F.lit(t)))
        frontier = nxt
    return dist


HITS_ITERS = 8


def hits(edges: DataFrame, n_iters: int = HITS_ITERS) -> DataFrame:
    """Fixed-``n_iters`` synchronous HITS (Kleinberg 1999) over the
    directed edge list ``edges(src, dst)`` -> (node, auth_norm,
    hub_norm): the hub/authority split that PageRank's single score
    collapses — in a KG, authorities are the entities many sources
    point AT (canonical targets), hubs the entities that point at
    many authorities (aggregator/listing nodes).

    Each round updates authority(v) = sum of hub over in-edges then
    hub(u) = sum of the NEW authority over out-edges (the classic
    update order), normalizing each vector to SUM 1 (the L1 variant —
    same fixpoint direction as the usual L2, but the normalizer is a
    plain sum, which keeps the whole computation inside the repo's
    cross-engine float contract: order-dependent addition noise is
    ~1e-15 relative, and results are published as value * n_nodes
    rounded to 6 decimals, the pagerank precedent).  Nodes with no
    in-edges carry authority exactly 0 (likewise hubs), so the
    normalizing totals are strictly positive on any nonempty graph.

    Scale shape: per round, two node-keyed equi-joins against the
    checkpointed adjacency + two partial-aggregated sums + two
    single-row broadcast totals — no corpus-sized broadcast, score
    frames checkpointed per round (the pagerank/LPA fixpoint
    pattern); at cluster scale the adjacency is bucketed once on each
    join key."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty/self-loop-only input: empty result, like the sibling
        # graph operators (not a driver-side ZeroDivisionError)
        return nodes.select(
            "node",
            F.lit(0.0).alias("auth_norm"),
            F.lit(0.0).alias("hub_norm"),
        )
    hub = nodes.withColumn("hub", F.lit(1.0 / n)).localCheckpoint()
    auth = None
    for _ in range(n_iters):
        a_raw = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        a_tot = a_raw.agg(F.sum("s").alias("t"))
        auth = (
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .crossJoin(F.broadcast(a_tot))  # single-row totals frame
            .select(
                "node",
                (F.coalesce(F.col("s"), F.lit(0.0)) / F.col("t")).alias("auth"),
            )
            # NOT checkpointed: auth is consumed once inside this
            # round's hub checkpoint (and once more by the final join
            # for the last round) — an eager materialization per half-
            # round just doubles the action count; hub's checkpoint
            # below cuts the lineage every round, so plans stay shallow
        )
        h_raw = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
        )
        h_tot = h_raw.agg(F.sum("s").alias("t"))
        hub = (
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .crossJoin(F.broadcast(h_tot))  # single-row totals frame
            .select(
                "node",
                (F.coalesce(F.col("s"), F.lit(0.0)) / F.col("t")).alias("hub"),
            )
            .localCheckpoint()
        )
    return (
        auth.join(hub, "node")
        .select(
            "node",
            F.round(F.col("auth") * F.lit(float(n)), 6).alias("auth_norm"),
            F.round(F.col("hub") * F.lit(float(n)), 6).alias("hub_norm"),
        )
    )


NJ_HUB_CAP = 64
NJ_MIN_PCT = 10


def neighbor_jaccard(
    edges: DataFrame,
    hub_cap: int = NJ_HUB_CAP,
    min_pct: int = NJ_MIN_PCT,
    canon: DataFrame | None = None,
) -> DataFrame:
    """Structural entity similarity: node pairs whose NEIGHBOR SETS
    overlap -> (node_a, node_b, common, jaccard) for pairs with
    jaccard >= min_pct percent, node_a < node_b.  This is the
    entity-resolution candidate generator by link structure
    (co-citation similarity — two KG entities pointing at the same
    things are merge candidates even without a sameAs edge), i.e. a
    set-similarity join over adjacency lists.

    Skew control is explicit, not hoped-for: nodes with degree >
    hub_cap are removed FIRST (stop-node removal, the standard move
    in co-occurrence mining — a hub like P31/Q5 is structurally
    similar to everything and its wedge volume is degree^2), so the
    per-node wedge fan-out is bounded by hub_cap and total wedge
    volume by m * hub_cap.  The jaccard is then exact on the filtered
    graph: common and the degrees are integers, the threshold compare
    is integer (common * 100 >= min_pct * (da + db - common)), and
    only the reported jaccard itself is a rounded division — both
    engines decide membership identically.

    Scale shape: wedge enumeration is one self-equi-join of the
    hub-filtered adjacency on the wedge CENTER (shuffled on a
    node key, per-center output <= hub_cap^2) + a pair-keyed count;
    degree tables are node-sized side inputs."""
    canon = canon if canon is not None else _undirected(edges)
    und = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    keep = deg.filter(F.col("d") <= hub_cap).select(F.col("u").alias("node"))
    fund = (
        und.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
        .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
        .select("u", "v")
        # reused 3x (degrees + both wedge sides); checkpoint before the
        # self-join and rename the right side (Spark 4.1 AttributeMap
        # guard, see canonicalize.py)
        .localCheckpoint()
    )
    fdeg = fund.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # attach each endpoint's (filtered) degree to the adjacency BEFORE
    # the wedge self-join: the degree is a node-sized attribute, and
    # carrying it as an int through the wedge rows replaces two
    # pair-keyed shuffle joins of the (much larger) pair frame with one
    # node-keyed join of the adjacency (guide §2.3 — shuffle fewer
    # bytes by keying small attributes onto rows before the fan-out).
    # Degrees are identical values, so membership and the rounded
    # jaccard are bit-identical.
    fd = fund.join(
        fdeg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
    )
    right = fd.select(
        F.col("u").alias("u2"), F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    wedges = (
        fd.join(right, (F.col("u") == F.col("u2")) & (F.col("v") < F.col("y")))
        .groupBy(F.col("v").alias("x"), "y")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.max("dv").alias("dx"),  # constant within the (x, y) group
            F.max("dy").alias("dy"),
        )
    )
    return (
        wedges
        .filter(
            F.col("common") * 100
            >= min_pct * (F.col("dx") + F.col("dy") - F.col("common"))
        )
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "common",
            F.round(
                F.col("common")
                / (F.col("dx") + F.col("dy") - F.col("common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


AA_HUB_CAP = 64
AA_MIN_COMMON = 3


def adamic_adar(
    edges: DataFrame,
    hub_cap: int = AA_HUB_CAP,
    min_common: int = AA_MIN_COMMON,
    canon: DataFrame | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003; the standard
    common-neighbor score, Liben-Nowell & Kleinberg 2007) over the
    undirected graph of ``edges(src, dst)``: NON-adjacent node pairs
    sharing >= min_common neighbors -> (node_a, node_b, common,
    aa_score) with node_a < node_b and
    aa_score = sum over common neighbors z of 1 / ln(degree(z)),
    rounded to 6 decimals.

    In a KG these are the missing-link candidates (two entities
    citing the same neighborhood but not yet connected) — the
    complement of neighbor_jaccard's merge candidates: jaccard finds
    SAME-entity pairs, Adamic-Adar finds RELATED-entity pairs, with
    rare shared neighbors weighted up (1/ln d) and hubs weighted
    down.

    Skew control mirrors neighbor_jaccard: degree > hub_cap nodes are
    removed FIRST, bounding per-center wedge fan-out by hub_cap and
    total wedge volume by m * hub_cap; every common neighbor then has
    (filtered) degree >= 2, so ln(degree) >= ln 2 and the division is
    always defined.  Membership (min_common, non-adjacency) is
    decided in integers / anti-joins; only the published score is
    float (sums of 1/ln(int) agree across engines to ~1e-15 relative,
    far inside the 6-decimal grid — the pagerank contract).

    Scale shape: one self-equi-join of the hub-filtered adjacency on
    the wedge center + a pair-keyed aggregation + one anti-join
    against the (canonical) edge set; degree tables are node-sized
    side inputs."""
    # checkpointed once: feeds the adjacency AND the final anti-join
    # (otherwise the anti-join side re-runs the upstream edge scan)
    canon = canon if canon is not None else _undirected(edges).localCheckpoint()
    und = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    keep = deg.filter(F.col("d") <= hub_cap).select(F.col("u").alias("node"))
    fund = (
        und.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
        .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
        .select("u", "v")
        # reused 3x (degrees + both wedge sides); checkpoint before the
        # self-join and rename the right side (Spark 4.1 AttributeMap
        # guard, see canonicalize.py)
        .localCheckpoint()
    )
    fdeg = fund.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # attach the wedge CENTER's degree to the adjacency before the
    # self-join (node-keyed join of the adjacency) instead of joining
    # fdeg onto the much larger wedge frame afterwards — one shuffle of
    # the biggest frame saved, identical d values (guide §2.3)
    fd = fund.join(fdeg, "u")
    right = fund.select(F.col("u").alias("u2"), F.col("v").alias("y"))
    wedges = fd.join(
        right, (F.col("u") == F.col("u2")) & (F.col("v") < F.col("y"))
    ).select(F.col("v").alias("x"), "y", "d")
    scored = (
        wedges
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("d").cast("double"))).alias("aa_raw"),
        )
        .filter(F.col("common") >= min_common)
    )
    # drop pairs already connected: canonical edges are stored a < b and
    # wedge pairs are emitted x < y, so one equi-anti-join suffices
    existing = canon.select(F.col("a").alias("x"), F.col("b").alias("y"))
    return (
        scored.join(existing, ["x", "y"], "left_anti")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            "common",
            F.round("aa_raw", 6).alias("aa_score"),
        )
    )


LP_HOLDOUT_MOD = 8


def linkpred_eval(
    edges: DataFrame,
    holdout_mod: int = LP_HOLDOUT_MOD,
    hub_cap: int = AA_HUB_CAP,
    min_common: int = 1,
    canon: DataFrame | None = None,
) -> DataFrame:
    """Link-prediction evaluation harness (the standard protocol of
    Liben-Nowell & Kleinberg 2007): deterministically hold out
    ~1/holdout_mod of the canonical edges (md5 'lp:'-salted hash —
    the repo's hash-in-place-of-RNG train/test split, same convention
    as evaluate.py's entity-keyed splits), score Adamic-Adar on the
    REMAINING graph, and report how much of the holdout the candidate
    set recovers -> one row (n_holdout, n_predicted, n_recovered,
    recall, mean_recovered_score).

    recall = recovered/holdout is the candidate-coverage metric; a
    ranking metric (hits@k) would need a global sort of the
    predictions, which this harness deliberately avoids — membership
    is anti-join/semi-join only, floats appear only in the two
    published rounded ratios (ONE division of exact BIGINTs each,
    plus the mean of already-rounded scores).

    Scale shape: the split is a map-side filter; scoring inherits
    adamic_adar's m * hub_cap wedge bound; the final metrics are one
    semi-join + single-row aggregates."""
    canon = canon if canon is not None else _undirected(edges).localCheckpoint()
    is_held = (
        F.expr(
            "CAST(conv(substr(md5(concat('lp:', a, '|', b)), 1, 13), 16, 10) AS BIGINT)"
        )
        % holdout_mod
        == 0
    )
    train = canon.filter(~is_held)
    holdout = canon.filter(is_held).localCheckpoint()
    preds = adamic_adar(
        train.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        hub_cap=hub_cap,
        min_common=min_common,
    ).localCheckpoint()
    recovered = holdout.join(
        preds.select(F.col("node_a").alias("a"), F.col("node_b").alias("b"), "aa_score"),
        ["a", "b"],
    )
    n_h = holdout.agg(F.count(F.lit(1)).alias("n_holdout"))
    n_p = preds.agg(F.count(F.lit(1)).alias("n_predicted"))
    n_r = recovered.agg(
        F.count(F.lit(1)).alias("n_recovered"),
        F.coalesce(F.round(F.avg("aa_score"), 6), F.lit(0.0)).alias(
            "mean_recovered_score"
        ),
    )
    return (
        n_h.crossJoin(F.broadcast(n_p))  # single-row totals frames
        .crossJoin(F.broadcast(n_r))
        .select(
            "n_holdout",
            "n_predicted",
            "n_recovered",
            F.when(
                F.col("n_holdout") > 0,
                F.round(
                    F.col("n_recovered") / F.col("n_holdout").cast("double"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            "mean_recovered_score",
        )
    )


def graph_profile(edges: DataFrame, canon: DataFrame | None = None) -> DataFrame:
    """One-row shape profile of the undirected graph of
    ``edges(src, dst)``: (n_nodes, n_edges, max_degree, avg_degree,
    assortativity) — the summary a KG curator reads before deciding
    hub caps, salt counts and partition strategies.

    Degree assortativity is Newman's 2002 coefficient, computed as
    the Pearson correlation of endpoint degrees over the BOTH-
    orientation edge list: with exact BIGINT aggregates n = 2|E|,
    s1 = sum(da), s2 = sum(da*db), s3 = sum(da^2), it is
    (n*s2 - s1^2) / (n*s3 - s1^2) — by symmetry sum(da) = sum(db)
    and sum(da^2) = sum(db^2), so the four integer sums determine it
    exactly and both engines feed the final division identical
    doubles (the predicate_pmi contract; products bounded by
    2|E| * max_deg^2, BIGINT-safe far past the sf1 tier — the
    division itself is done in DOUBLE).  avg_degree = 2|E|/|V|
    rounded to 6.  Degenerate regular graphs (zero degree variance)
    publish assortativity 0.0 on both engines via the integer
    denominator-zero guard.

    Scale shape: one degree aggregation + one node-keyed join of the
    edge list against the degree table (twice, once per endpoint) +
    single-row aggregates; nothing corpus-sized is broadcast or
    sorted."""
    canon = canon if canon is not None else _undirected(edges).localCheckpoint()
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("d").alias("max_degree"),
    )
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    both = canon.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        canon.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    paired = both.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("da")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("db")), "v")
    sums = paired.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("da").alias("s1"),
        F.sum(F.col("da") * F.col("db")).alias("s2"),
        F.sum(F.col("da") * F.col("da")).alias("s3"),
    )
    return (
        nodes.crossJoin(F.broadcast(n_edges))  # single-row totals frames
        .crossJoin(F.broadcast(sums))
        .select(
            "n_nodes",
            "n_edges",
            "max_degree",
            F.round(2.0 * F.col("n_edges") / F.col("n_nodes").cast("double"), 6).alias(
                "avg_degree"
            ),
            F.when(
                F.col("n") * F.col("s3") - F.col("s1") * F.col("s1") != 0,
                F.round(
                    (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                        "double"
                    )
                    / (F.col("n") * F.col("s3") - F.col("s1") * F.col("s1")).cast(
                        "double"
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("assortativity"),
        )
    )


SKIPGRAM_WINDOW = 2


def skipgram_pairs(walks: DataFrame, window: int = SKIPGRAM_WINDOW) -> DataFrame:
    """Skip-gram training pairs from a walk corpus (the second half of
    the DeepWalk recipe, Perozzi et al. 2014: walks -> (center,
    context) pairs within a window -> embedding trainer):
    ``walks(walk, step, node)`` -> (center, context, n_pairs), where a
    pair is two positions of the SAME walk with 1 <= |step delta| <=
    window (both directions, so the matrix is symmetric in total
    count).

    Scale shape: one walk-keyed self-equi-join (per-walk output
    bounded by steps * 2*window — a small constant per walk) + one
    pair-keyed partial-aggregated count.  Rename-before-self-join per
    the repo's Spark 4.1 AttributeMap guard."""
    w = walks.select("walk", "step", "node").localCheckpoint()
    right = w.select(
        F.col("walk").alias("walk2"),
        F.col("step").alias("step2"),
        F.col("node").alias("context"),
    )
    return (
        w.join(right, F.col("walk") == F.col("walk2"))
        .filter(
            (F.abs(F.col("step") - F.col("step2")) >= 1)
            & (F.abs(F.col("step") - F.col("step2")) <= window)
        )
        .groupBy(F.col("node").alias("center"), "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Per-node directed reciprocity — the share of a node's distinct
    out-edges whose reverse edge also exists (Newman's link
    reciprocity, node-resolved): (node, out_deg, n_recip,
    recip_ratio).  In a KG this is the symmetric-relation density
    a constraint miner reads before proposing symmetric/inverse
    constraints (the corhist kernels' territory).

    Scale shape: one distinct over the edge list, one self equi-join
    on the reversed key pair (hash-partitioned both sides, no
    broadcast of anything corpus-sized), one node-keyed map-side-
    combined aggregate."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    flagged = e.join(rev, ["src", "dst"], "left_semi").select(
        "src", F.lit(1).alias("is_recip")
    )
    per_node = (
        e.select("src")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .join(
            flagged.groupBy("src").agg(F.sum("is_recip").alias("n_recip")),
            "src",
            "left",
        )
    )
    return per_node.select(
        F.col("src").alias("node"),
        "out_deg",
        F.coalesce("n_recip", F.lit(0)).cast("bigint").alias("n_recip"),
        F.round(
            F.coalesce("n_recip", F.lit(0)) / F.col("out_deg").cast("double"), 6
        ).alias("recip_ratio"),
    )


def temporal_linkpred(
    train_edges: DataFrame,
    future_edges: DataFrame,
    hub_cap: int = AA_HUB_CAP,
    min_common: int = 1,
) -> DataFrame:
    """Time-aware link-prediction evaluation — the honest protocol
    for an EVOLVING graph (predict edges that actually formed later,
    not a random holdout; Liben-Nowell & Kleinberg's original
    formulation): train on the edges existing at time T, test on the
    canonical edges present in ``future_edges`` but absent from the
    train snapshot, score Adamic-Adar on train.  One row:
    (n_new, n_predicted, n_recovered, recall, mean_recovered_score)
    — same metric contract as ``linkpred_eval`` (join-only
    membership, no global ranking sort).

    Scale shape: two canonical distincts, one anti-join for the new-
    edge set, and adamic_adar's m * hub_cap wedge bound on train."""
    def canon(e):
        return (
            e.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    train = canon(train_edges).localCheckpoint()
    new = (
        canon(future_edges).join(train, ["a", "b"], "left_anti").localCheckpoint()
    )
    preds = adamic_adar(
        train.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        hub_cap=hub_cap,
        min_common=min_common,
    ).localCheckpoint()
    recovered = new.join(
        preds.select(
            F.col("node_a").alias("a"), F.col("node_b").alias("b"), "aa_score"
        ),
        ["a", "b"],
    )
    n_n = new.agg(F.count(F.lit(1)).alias("n_new"))
    n_p = preds.agg(F.count(F.lit(1)).alias("n_predicted"))
    n_r = recovered.agg(
        F.count(F.lit(1)).alias("n_recovered"),
        F.coalesce(F.round(F.avg("aa_score"), 6), F.lit(0.0)).alias(
            "mean_recovered_score"
        ),
    )
    return (
        n_n.crossJoin(F.broadcast(n_p))  # single-row totals frames
        .crossJoin(F.broadcast(n_r))
        .select(
            "n_new",
            "n_predicted",
            "n_recovered",
            F.when(
                F.col("n_new") > 0,
                F.round(F.col("n_recovered") / F.col("n_new").cast("double"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            "mean_recovered_score",
        )
    )


HB_BUCKETS = 16
HB_ALPHA16 = 0.673  # Flajolet's alpha for m = 16


def hyperball_2hop(edges: DataFrame, canon: DataFrame | None = None) -> DataFrame:
    """HyperBall / ANF (Boldi, Rosa & Vigna 2011; Palmer et al.'s
    approximate neighborhood function): per-node estimates of the
    1-hop and 2-hop ball sizes via mergeable HLL registers — THE
    large-graph way to ask "how big is each node's neighborhood"
    without enumerating 2-hop pairs (which is sum-of-squared-degrees,
    quadratic on hubs).  Output: (node, ball1_est, ball2_est) as
    BIGINT estimates (16-register HLL, sigma ~26% — the coarse-but-
    mergeable regime ANF runs at; Flajolet's linear-counting
    correction applies below 2.5m).

    Scale shape: the 1-hop register table is built from the edge
    list itself (2m + n member rows, one (node, bucket) max-combine);
    the 2-hop merge joins each edge against its endpoint's <= 16
    register rows — row volume <= 2m * 16, LINEAR in edges by
    construction, hubs included.  Register arithmetic is the repo's
    exact-integer rho (53 - bit_length) and the 2^-reg sums are
    dyadic rationals — exact in double on both engines."""
    canon = canon if canon is not None else _undirected(edges).localCheckpoint()
    und = canon.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        canon.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    nodes = und.select("u").distinct()
    # per-node register row of the node ITSELF (the ball-0 member)
    nregs = nodes.select(
        F.col("u").alias("x"),
        F.expr(
            "CAST(conv(substr(md5(concat('hb:', u)), 1, 1), 16, 10) AS INT)"
        ).alias("bucket"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(concat('hb:', u)), 2, 13), 16, 10) AS BIGINT) = 0"
            " THEN 53 ELSE CAST(53 - length(conv("
            "CAST(conv(substr(md5(concat('hb:', u)), 2, 13), 16, 10) AS BIGINT)"
            ", 10, 2)) AS INT) END"
        ).alias("rho"),
    ).localCheckpoint()
    mem1 = und.unionAll(nodes.select("u", F.col("u").alias("v")))
    r1 = (
        mem1.join(nregs, mem1["v"] == nregs["x"])
        .groupBy("u", "bucket")
        .agg(F.max("rho").alias("reg"))
        .localCheckpoint()
    )
    r2 = (
        und.join(
            r1.select(F.col("u").alias("v"), "bucket", "reg"), "v"
        )
        .select("u", "bucket", "reg")
        .unionAll(r1.select("u", "bucket", "reg"))
        .groupBy("u", "bucket")
        .agg(F.max("reg").alias("reg"))
    )

    def estimate(regs: DataFrame, out: str) -> DataFrame:
        m = HB_BUCKETS
        agg = regs.groupBy("u").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        s = F.col("s_present") + (F.lit(m) - F.col("n_present"))
        zeros = (F.lit(m) - F.col("n_present")).cast("int")
        raw = F.lit(HB_ALPHA16 * m * m) / s
        est = F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        ).otherwise(raw)
        return agg.select("u", F.round(est, 0).cast("bigint").alias(out))

    return (
        estimate(r1, "ball1_est")
        .join(estimate(r2, "ball2_est"), "u")
        .select(F.col("u").alias("node"), "ball1_est", "ball2_est")
    )


def degree_histogram(edges: DataFrame, canon: DataFrame | None = None) -> DataFrame:
    """Log2-binned degree histogram of the undirected graph — the
    power-law shape check a capacity planner reads next to
    ``graph_profile`` (a heavy tail here is the trigger for the
    repo's hub caps and salting): (log2_bin, n_nodes, min_degree,
    max_degree) where log2_bin = floor(log2(degree)) computed as
    bit_length - 1 — pure integer arithmetic, no float log.

    Scale shape: one degree aggregate + one constant-sized (≤ 64
    bins) aggregate."""
    canon = canon if canon is not None else _undirected(edges)
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        deg.select(
            F.expr("CAST(length(conv(d, 10, 2)) - 1 AS INT)").alias("log2_bin"),
            "d",
        )
        .groupBy("log2_bin")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_degree"),
            F.max("d").alias("max_degree"),
        )
    )


DRIFT_TOP_K = 16


def degree_drift(
    old_edges: DataFrame, new_edges: DataFrame, top_k: int = DRIFT_TOP_K
) -> DataFrame:
    """Temporal degree-drift report — the fastest-growing entities
    between two graph snapshots (the hub-watch list: a node whose
    degree is exploding is tomorrow's salting problem and today's
    trending entity): top-``top_k`` nodes by degree growth
    (growth desc, node asc), with old/new degree and growth.

    Scale shape: two degree aggregates + one node-keyed outer join +
    a distributed top-k (TakeOrderedAndProject)."""
    def deg(e):
        canon = _undirected(e)
        return (
            canon.select(F.col("a").alias("node"))
            .unionAll(canon.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    old = deg(old_edges).select("node", F.col("d").alias("d_old"))
    new = deg(new_edges).select("node", F.col("d").alias("d_new"))
    return (
        new.join(old, "node", "left")
        .select(
            "node",
            F.coalesce("d_old", F.lit(0)).cast("bigint").alias("d_old"),
            F.col("d_new").cast("bigint").alias("d_new"),
            (F.col("d_new") - F.coalesce("d_old", F.lit(0)))
            .cast("bigint")
            .alias("growth"),
        )
        .orderBy(F.col("growth").desc(), "node")
        .limit(top_k)
    )


SAMPLE_FANOUT = 8


def neighbor_sample(edges: DataFrame, fanout: int = SAMPLE_FANOUT) -> DataFrame:
    """GraphSAGE-style fixed-fanout neighbor sampling plan (Hamilton
    et al., NeurIPS 2017) -> (src, dst, slot in 1..fanout): per
    source node, keep ``fanout`` distinct out-neighbors chosen by a
    deterministic md5 rank (the hash-in-place-of-RNG convention), so
    the GNN minibatch plan is reproducible across engines, runs and
    partitionings — the sampled-adjacency export a GNN trainer
    consumes instead of the full power-law adjacency.

    Scale shape: one edge dedup + ONE src-keyed window over at most
    the node's degree rows, cut to ``fanout`` — per-node work is
    bounded by degree, output by fanout * |V|; no hub ever expands
    beyond its own adjacency."""
    from pyspark.sql import Window

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn(
            "h",
            F.expr(
                "CAST(conv(substr(md5(concat(src, ':', dst, ':ns')), 1, 13),"
                " 16, 10) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("h").asc(), F.col("dst").asc())
    return (
        e.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= fanout)
        .select("src", "dst", "slot")
    )


def triad_census(edges: DataFrame) -> DataFrame:
    """Directed triad census over ``edges(src, dst)`` -> ONE row
    (n_triangles, n_cyclic, n_feedforward): how many undirected
    triangles carry a directed 3-cycle and how many carry a
    transitive (feed-forward) ordering — the motif profile
    distinguishing hierarchy-like from flow-like KG neighborhoods
    (Milo et al., Science 2002).  Every 3-set with at least one
    direction per pair is cyclic or transitive (the 3-tournament
    property); bidirectional pairs can make a triangle both.

    Enumeration is the degree-oriented wedge scheme of
    triangle_counts (volume bounded by sum(d_out^2) <= m^1.5 even on
    power-law graphs); the per-pair direction flags ride the SAME
    canonical pair table, so classification adds only three
    pair-keyed joins on the triangle list."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    dirs = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("fab_i"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("fba_i"),
        )
        .groupBy("a", "b")
        .agg(F.max("fab_i").alias("f_ab"), F.max("fba_i").alias("f_ba"))
        .localCheckpoint()  # reused 4x (degrees, orientation, closing, flags)
    )
    canon = dirs.select("a", "b")
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    with_deg = canon.join(
        deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
    lower_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint()
    o1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    o2 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    wedges = o1.join(o2, "x").filter(F.col("y") < F.col("z"))
    tris = wedges.join(
        oriented.select(
            F.least("u", "v").alias("y"), F.greatest("u", "v").alias("z")
        ),
        ["y", "z"],
        "left_semi",
    )
    # canonical sorted naming (n1 < n2 < n3), then the three direction
    # rows
    t = tris.select(
        F.array_sort(F.array("x", "y", "z")).alias("s")
    ).select(
        F.col("s")[0].alias("n1"), F.col("s")[1].alias("n2"), F.col("s")[2].alias("n3")
    )
    d12 = dirs.select(
        F.col("a").alias("n1"), F.col("b").alias("n2"),
        F.col("f_ab").alias("f12"), F.col("f_ba").alias("b12"),
    )
    d23 = dirs.select(
        F.col("a").alias("n2"), F.col("b").alias("n3"),
        F.col("f_ab").alias("f23"), F.col("f_ba").alias("b23"),
    )
    d13 = dirs.select(
        F.col("a").alias("n1"), F.col("b").alias("n3"),
        F.col("f_ab").alias("f13"), F.col("f_ba").alias("b13"),
    )
    flags = t.join(d12, ["n1", "n2"]).join(d23, ["n2", "n3"]).join(
        d13, ["n1", "n3"]
    )
    one = lambda c: F.col(c) == 1  # noqa: E731
    cyc = (one("f12") & one("f23") & one("b13")) | (
        one("b12") & one("b23") & one("f13")
    )
    ffw = (
        (one("f12") & one("f23") & one("f13"))
        | (one("f13") & one("b23") & one("f12"))
        | (one("b12") & one("f13") & one("f23"))
        | (one("f23") & one("b13") & one("b12"))
        | (one("b13") & one("f12") & one("b23"))
        | (one("b23") & one("b12") & one("b13"))
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_triangles"),
        F.sum(cyc.cast("int")).cast("bigint").alias("n_cyclic"),
        F.sum(ffw.cast("int")).cast("bigint").alias("n_feedforward"),
    )


def community_modularity(
    edges: DataFrame, labels: DataFrame, canon: DataFrame | None = None
) -> DataFrame:
    """Newman modularity decomposition of a community assignment
    ``labels(node, label)`` over the undirected graph of
    ``edges(src, dst)`` — one row per community:
    (label, n_nodes, degree_sum, intra_edges, q_contrib), where
    q_contrib = L_c/m - (D_c/2m)^2 is the community's exact term in
    Q = sum_c q_contrib (Newman & Girvan 2004).  Composed with
    label_propagation this scores HOW GOOD the detected communities
    are — the missing judge next to the detector.

    Exactness: both numerator pieces stay integer (4*m*L_c - D_c^2
    over 4*m^2) until ONE final double division rounded to 6 decimals,
    so engines cannot drift; communities with zero intra edges keep a
    row (left join) with a negative contribution.

    Scale shape: the canonical edge set is joined to the label table
    once per endpoint (node-keyed equi-joins), degrees are one
    map-side-combined aggregate, and every result frame is
    community-sized; the single-row m frame rides a broadcast.

    ``canon`` optionally supplies the canonical undirected edge frame
    (a, b with a < b, distinct, materialized) so a caller scoring
    SEVERAL assignments of the same graph pays its eager build once —
    it is exactly the frame built here when omitted."""
    if canon is None:
        canon = (
            edges.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
    m = canon.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("label_a"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("label_b"))
    intra = (
        canon.join(la, "a")
        .join(lb, "b")
        .filter(F.col("label_a") == F.col("label_b"))
        .groupBy(F.col("label_a").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    und = canon.select(F.col("a").alias("node")).unionAll(
        canon.select(F.col("b").alias("node"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    dl = (
        deg.join(labels, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("degree_sum"),
        )
    )
    return (
        dl.join(intra, "label", "left")
        .crossJoin(F.broadcast(m))  # single-row totals frame
        .select(
            "label",
            "n_nodes",
            "degree_sum",
            F.coalesce(F.col("intra_edges"), F.lit(0)).cast("bigint").alias(
                "intra_edges"
            ),
            F.round(
                (
                    4 * F.col("m") * F.coalesce(F.col("intra_edges"), F.lit(0))
                    - F.col("degree_sum") * F.col("degree_sum")
                ).cast("double")
                / (4.0 * F.col("m") * F.col("m")),
                6,
            ).alias("q_contrib"),
        )
    )


# Hill-estimator order-statistic depths (top-k tail samples)
HILL_KS = (16, 32, 64)


def hill_tail_index(
    edges: DataFrame, ks: tuple = HILL_KS, canon: DataFrame | None = None
) -> DataFrame:
    """Hill estimator of the degree-distribution tail index over the
    undirected graph of ``edges(src, dst)`` — one row per tail depth
    k: (k, d_k, n_tail, alpha_ppm).  alpha_hat = k / sum_{i<=k}
    ln(d_(i) / d_(k)) on the k largest degrees (Hill 1975) — the
    heavy-tail exponent that decides whether skew mitigation (salting,
    hot-key splits) is mandatory or cosmetic for THIS graph; the
    multi-k row set is the standard Hill-plot stability check.

    Exactness: the top-k degree MULTISET is tie-order-independent, so
    no node tiebreak is needed; each log ratio is fixed-pointed to
    integer micro-nats BEFORE summation (the micro-unit pattern — no
    float summation-order hazard), alpha_ppm = (k * 1e12) DIV
    sum_ln_micro, NULL at depths where the tail is degenerate
    (d_k = d_1, sum = 0) or the graph has fewer than k nodes.

    Scale shape: degrees are one map-side-combined aggregate; the
    top-k slice NEVER globally sorts nodes — the exact degree cutoff
    comes from a descending running total over the DEGREE-VALUE
    histogram (value-keyed agg + a window over distinct degree
    values, the count-bucket pattern), and only the >= cutoff rows
    (kmax plus ties at the boundary) enter the single ranking window.
    Everything after is k-row arithmetic."""
    canon = canon if canon is not None else _undirected(edges)
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    kmax = max(ks)
    # exact top-kmax cutoff from the degree-value histogram: cum(d) =
    # #nodes with degree >= d; cutoff = max d with cum >= kmax (min
    # degree when the graph has fewer than kmax nodes)
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n_d"))
    wh = Window.orderBy(F.desc("d")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cum", F.sum("n_d").over(wh))
    cutoff = cum.agg(
        F.coalesce(
            F.max(F.when(F.col("cum") >= kmax, F.col("d"))), F.min("d")
        ).alias("cutoff")
    )
    w = Window.orderBy(F.desc("d"), F.asc("node"))
    top = (
        deg.join(F.broadcast(cutoff), F.col("d") >= F.col("cutoff"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= kmax)
        .select("rk", "d")
        .localCheckpoint()
    )
    parts = []
    for k in ks:
        dk = top.filter(F.col("rk") == k).select(F.col("d").alias("d_k"))
        tail = top.filter(F.col("rk") <= k)
        parts.append(
            tail.crossJoin(F.broadcast(dk))  # single-row d_k frame
            .select(
                F.expr(
                    "CAST(round(ln(CAST(d AS DOUBLE) / d_k) * 1000000)"
                    " AS BIGINT)"
                ).alias("ln_micro"),
                "d_k",
            )
            .groupBy("d_k")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_tail"),
                F.sum("ln_micro").cast("bigint").alias("s"),
            )
            .select(
                F.lit(k).cast("bigint").alias("k"),
                "d_k",
                "n_tail",
                F.expr(f"CASE WHEN s > 0 THEN ({k} * 1000000000000) DIV s END")
                .alias("alpha_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

# personalized-PageRank settings: seed count (the cost knob — state is
# bounded by the seeds' k-hop neighborhoods), fixed round count, and
# the damping as an integer percent (the rank state is FIXED-POINT
# picounits, so the whole fixpoint is exact integer arithmetic and
# engine-independent — no float rounding grid to straddle)
PPR_ITERS = 4
PPR_SEEDS = 4
PPR_DAMPING_PCT = 85
PPR_UNIT = 10**12


def ppr_scores(
    edges: DataFrame,
    n_iters: int = PPR_ITERS,
    n_seeds: int = PPR_SEEDS,
    damping_pct: int = PPR_DAMPING_PCT,
) -> DataFrame:
    """Personalized PageRank from the top-``n_seeds`` out-degree hub
    entities (ties by node id) — the entity-to-entity relatedness
    feature an entity-linking stage ranks candidates with (PPR over
    the KG neighborhood is the classic EL relatedness signal, e.g.
    Pershina et al. NAACL 2015).  Per seed, ``n_iters`` synchronous
    rounds with restart probability (100 - damping_pct)% at the seed
    and the per-seed dangling mass returned TO THE SEED (the standard
    single-node teleport set).  Rank state is FIXED-POINT picounits
    (PPR_UNIT = 1e12) with floored integer division at every edge
    contribution — per-seed mass is 1e12 minus a deterministic floor
    leakage bounded by the addend count per round, and the fixpoint
    is EXACT integer arithmetic in both engines (the repo's
    fixed-point-before-summation convention; a float formulation
    measurably straddled the rounding grid between Spark and DuckDB
    at sf0.1).  Returns (seed, node, rank_pico) with rank_pico > 0.

    Scale shape: the state is SPARSE — (seed, node) rows exist only
    for already-reached nodes, so round-k state is bounded by the
    seeds' k-hop neighborhoods, never |seeds| x |V|; each round is one
    src-keyed equi-join + one (seed, node) partial aggregate (restart
    rows ride the same aggregate), the per-seed dangling scalar is a
    seed-count-sized frame, and rounds localCheckpoint like pagerank
    (lineage cut per round)."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    seeds = (
        outdeg.orderBy(F.desc("odeg"), F.asc("src"))
        .limit(n_seeds)
        .select(F.col("src").alias("seed"))
        .localCheckpoint()
    )
    adj = e.join(outdeg, "src").localCheckpoint()
    ranks = seeds.select(
        "seed",
        F.col("seed").alias("node"),
        F.lit(PPR_UNIT).cast("bigint").alias("rank"),
    ).localCheckpoint()
    dp, rp = damping_pct, 100 - damping_pct
    for _ in range(n_iters):
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .groupBy("seed")
            .agg(F.sum("rank").cast("bigint").alias("dang"))
        )
        contribs = adj.join(ranks, adj["src"] == ranks["node"]).select(
            "seed",
            F.col("dst").alias("node"),
            F.expr(f"({dp} * rank) DIV (100 * odeg)").alias("r"),
        )
        restart = seeds.join(dang, "seed", "left").select(
            "seed",
            F.col("seed").alias("node"),
            (
                F.lit((rp * PPR_UNIT) // 100).cast("bigint")
                + F.expr(f"({dp} * coalesce(dang, CAST(0 AS BIGINT))) DIV 100")
            ).alias("r"),
        )
        ranks = (
            contribs.unionByName(restart)
            .groupBy("seed", "node")
            .agg(F.sum("r").cast("bigint").alias("rank"))
            # floored-to-zero rows carry no mass; dropping them each
            # round keeps the state genuinely k-hop-sparse
            .filter(F.col("rank") > 0)
            .localCheckpoint()
        )
    return ranks.select("seed", "node", F.col("rank").alias("rank_pico"))


# partition-audit settings: the three standard edge-placement
# strategies at P = PART_ROWS * PART_COLS partitions (1D by src, 1D by
# dst, 2D grid vertex-cut a la PowerGraph/GraphX EdgePartition2D)
PART_ROWS = 2
PART_COLS = 4
_HASH52_SRC = "CAST(conv(substr(md5(concat('part:', src)), 1, 13), 16, 10) AS BIGINT)"
_HASH52_DST = "CAST(conv(substr(md5(concat('part:', dst)), 1, 13), 16, 10) AS BIGINT)"


def partition_audit(edges: DataFrame) -> DataFrame:
    """Edge-partitioning strategy audit (the placement decision a
    100-TB graph job makes BEFORE shuffling a trillion edges): for 1D
    hash-by-src, 1D hash-by-dst and the 2D grid vertex-cut
    (PowerGraph, Gonzalez et al. OSDI 2012; GraphX EdgePartition2D),
    the measured edge-load skew and vertex replication factor on THIS
    graph.  Output one row per strategy: (strategy, n_parts, n_edges,
    max_edges, skew_ppm, repl_ppm) where skew_ppm = 1e6 * max_edges *
    n_parts / n_edges (1e6 = perfectly balanced) and repl_ppm = 1e6 *
    avg distinct partitions per vertex (the 2D grid bounds it by
    rows + cols; 1D by degree).  Exact integer arithmetic.

    Scale shape: per strategy one map pass assigns the partition,
    edge loads aggregate to n_parts rows, and the replication factor
    is one distinct (vertex, part) count — map-side combinable; no
    per-vertex state beyond the aggregate."""
    p_total = PART_ROWS * PART_COLS
    hs = f"({_HASH52_SRC} % {p_total})"
    hd = f"({_HASH52_DST} % {p_total})"
    h2 = (
        f"(({_HASH52_SRC} % {PART_ROWS}) * {PART_COLS}"
        f" + ({_HASH52_DST} % {PART_COLS}))"
    )
    e = edges.select("src", "dst").distinct().localCheckpoint()
    outs = []
    for strategy, part_expr in (("1d_src", hs), ("1d_dst", hd), ("2d_grid", h2)):
        d = e.select("src", "dst", F.expr(part_expr).alias("part"))
        loads = d.groupBy("part").agg(F.count(F.lit(1)).alias("n_e"))
        tot = loads.agg(
            F.sum("n_e").cast("bigint").alias("n_edges"),
            F.max("n_e").cast("bigint").alias("max_edges"),
        )
        vparts = (
            d.select(F.col("src").alias("v"), "part")
            .unionAll(d.select(F.col("dst").alias("v"), "part"))
            .distinct()
        )
        repl = vparts.groupBy().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vp"),
            F.countDistinct("v").cast("bigint").alias("n_v"),
        )
        outs.append(
            tot.crossJoin(repl).select(  # two single-row frames
                F.lit(strategy).alias("strategy"),
                F.lit(p_total).alias("n_parts"),
                "n_edges",
                "max_edges",
                F.expr(f"(1000000 * max_edges * {p_total}) DIV n_edges").alias(
                    "skew_ppm"
                ),
                F.expr("(1000000 * n_vp) DIV n_v").alias("repl_ppm"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


DD_MAX_K = 4
DD_EFF_PCT = 90


def distance_distribution(
    edges: DataFrame, max_k: int = DD_MAX_K, canon: DataFrame | None = None
) -> DataFrame:
    """HyperBall distance distribution + effective diameter (Boldi,
    Rosa & Vigna 2011 — how web-graph diameters are actually
    measured): the global neighborhood function N(k) = sum over nodes
    of the k-ball HLL estimates for k = 1..``max_k``, the per-k share
    of N(max_k) in ppm, and the effective-diameter flag (first k with
    N(k) >= DD_EFF_PCT% of N(max_k), integer-compared).  Output:
    (k, n_pairs_est, frac_of_max_ppm, is_eff_diameter).

    Scale shape: exactly ``hyperball_2hop``'s register algebra
    iterated — each round joins the edge list against the previous
    round's <= 16 register rows per node (volume <= 2m * 16, LINEAR
    in edges, hubs included) and max-combines; the global N(k) sums
    the per-node BIGINT estimates, so the output is max_k rows."""
    canon = canon if canon is not None else _undirected(edges).localCheckpoint()
    und = canon.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        canon.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    nodes = und.select("u").distinct()
    nregs = nodes.select(
        F.col("u").alias("x"),
        F.expr(
            "CAST(conv(substr(md5(concat('hb:', u)), 1, 1), 16, 10) AS INT)"
        ).alias("bucket"),
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(concat('hb:', u)), 2, 13), 16, 10) AS BIGINT) = 0"
            " THEN 53 ELSE CAST(53 - length(conv("
            "CAST(conv(substr(md5(concat('hb:', u)), 2, 13), 16, 10) AS BIGINT)"
            ", 10, 2)) AS INT) END"
        ).alias("rho"),
    ).localCheckpoint()
    mem1 = und.unionAll(nodes.select("u", F.col("u").alias("v")))
    regs = (
        mem1.join(nregs, mem1["v"] == nregs["x"])
        .groupBy("u", "bucket")
        .agg(F.max("rho").alias("reg"))
        .localCheckpoint()
    )

    def ball_total(r: DataFrame) -> DataFrame:
        m = HB_BUCKETS
        agg = r.groupBy("u").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        s = F.col("s_present") + (F.lit(m) - F.col("n_present"))
        zeros = (F.lit(m) - F.col("n_present")).cast("int")
        raw = F.lit(HB_ALPHA16 * m * m) / s
        est = F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        ).otherwise(raw)
        return agg.select(
            F.round(est, 0).cast("bigint").alias("ball")
        ).agg(F.sum("ball").cast("bigint").alias("n_pairs_est"))

    totals = []
    for k in range(1, max_k + 1):
        if k > 1:
            regs = (
                und.join(
                    regs.select(F.col("u").alias("v"), "bucket", "reg"), "v"
                )
                .select("u", "bucket", "reg")
                .unionAll(regs.select("u", "bucket", "reg"))
                .groupBy("u", "bucket")
                .agg(F.max("reg").alias("reg"))
                .localCheckpoint()
            )
        totals.append(
            ball_total(regs).select(
                F.lit(k).alias("k"), "n_pairs_est"
            )
        )
    res = totals[0]
    for t in totals[1:]:
        res = res.unionByName(t)
    mx = res.filter(F.col("k") == max_k).select(
        F.col("n_pairs_est").alias("n_max")
    )
    return (
        res.crossJoin(F.broadcast(mx))  # single-row max-k frame
        .select(
            "k",
            "n_pairs_est",
            F.expr("(1000000 * n_pairs_est) DIV n_max").alias("frac_of_max_ppm"),
            F.expr(
                f"100 * n_pairs_est >= {DD_EFF_PCT} * n_max"
            ).alias("reaches_eff"),
        )
        .withColumn(
            "is_eff_diameter",
            F.col("reaches_eff")
            & (
                F.col("k")
                == F.min(F.when(F.col("reaches_eff"), F.col("k"))).over(
                    Window.partitionBy()
                )
            ),
        )
        .drop("reaches_eff")
    )


SCC_INNER = 8
SCC_OUTER = 2
SCC_TRIM = 4


def scc_components(
    edges: DataFrame,
    n_outer: int = SCC_OUTER,
    n_inner: int = SCC_INNER,
    n_trim: int = SCC_TRIM,
) -> DataFrame:
    """Strongly connected components of the DIRECTED graph of
    ``edges(src, dst)`` by trim + forward-backward min-label coloring
    — the standard distributed SCC recipe (trimming from Hong et
    al.'s method, FW-BW from Fleischer/Hendrickson/Pinar, min-label
    pivots in place of random ones for determinism).  Per outer
    round: ``n_trim`` trim passes peel vertices with no in-edge or no
    out-edge in the ACTIVE subgraph (each is provably a singleton
    SCC — any SCC of size >= 2 keeps in+out edges among its own
    members, which stay active together); then the min node label is
    propagated ``n_inner`` hops along edges (f = min label reaching
    v) and along reversed edges (b = min label v reaches).  f = b = x
    proves v reaches x and x reaches v within the bound, so v is IN
    x's SCC — bounded propagation never merges wrong vertices, it
    can only leave vertices unresolved (and an SCC with diameter >
    n_inner can come out split; same fixed-bound contract as
    k_core/bfs, pinned exact vs an in-memory Tarjan on the fixture
    graphs in tests).

    Returns (node, scc_id, resolved): scc_id = min member label for
    resolved vertices (own label for trimmed singletons), own label
    with resolved = false for vertices the bounds did not settle.

    Scale shape: trim passes are two distinct endpoint projections +
    semi/anti-joins (node-sized frames); each coloring hop is two
    node-keyed equi-joins (adjacency x label frame, partial-agg min
    per endpoint).  No broadcast of anything corpus-sized; label and
    edge frames are checkpointed per step and the active subgraph
    shrinks monotonically."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    active = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    resolved = None

    def _accum(res, done):
        return done if res is None else res.unionByName(done)

    for _ in range(n_outer):
        # early exit: an empty active set stays empty through trims and
        # coloring — the remaining rounds would schedule ~20 no-op jobs
        # (trim/coloring checkpoints) for identical output
        if active.isEmpty():
            break
        for _ in range(n_trim):
            both = (
                e.select(F.col("dst").alias("node"))
                .distinct()
                .join(e.select(F.col("src").alias("node")).distinct(), "node")
            )
            singles = active.join(both, "node", "left_anti").select(
                "node",
                F.col("node").alias("scc_id"),
                F.lit(True).alias("resolved"),
            )
            resolved = _accum(resolved, singles)
            active = active.join(both, "node", "left_semi").localCheckpoint()
            e = (
                e.join(
                    active.select(F.col("node").alias("src")), "src", "left_semi"
                )
                .join(
                    active.select(F.col("node").alias("dst")), "dst", "left_semi"
                )
                .localCheckpoint()
            )
        if active.isEmpty():
            break
        lab = active.select(
            "node", F.col("node").alias("f"), F.col("node").alias("b")
        ).localCheckpoint()
        for _ in range(n_inner):
            mf = (
                e.join(lab.select(F.col("node").alias("src"), "f"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("f").alias("mf"))
            )
            mb = (
                e.join(lab.select(F.col("node").alias("dst"), "b"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.min("b").alias("mb"))
            )
            nxt = (
                lab.join(mf, "node", "left")
                .join(mb, "node", "left")
                .select(
                    "node",
                    F.least("f", F.coalesce("mf", "f")).alias("nf"),
                    F.least("b", F.coalesce("mb", "b")).alias("nb"),
                    F.col("f").alias("pf"),
                    F.col("b").alias("pb"),
                )
                .localCheckpoint()
            )
            # converged labels make every later hop a no-op — stop
            # early (the previous f/b ride in the same checkpointed
            # frame, so the check is a scan, not another join job)
            moved = not nxt.filter(
                (F.col("nf") != F.col("pf")) | (F.col("nb") != F.col("pb"))
            ).isEmpty()
            lab = nxt.select(
                "node", F.col("nf").alias("f"), F.col("nb").alias("b")
            )
            if not moved:
                break
        done = lab.filter(F.col("f") == F.col("b")).select(
            "node", F.col("f").alias("scc_id"), F.lit(True).alias("resolved")
        )
        resolved = _accum(resolved, done)
        active = (
            lab.filter(F.col("f") != F.col("b"))
            .select("node")
            .localCheckpoint()
        )
        e = (
            e.join(active.select(F.col("node").alias("src")), "src", "left_semi")
            .join(active.select(F.col("node").alias("dst")), "dst", "left_semi")
            .localCheckpoint()
        )
    leftover = active.select(
        "node", F.col("node").alias("scc_id"), F.lit(False).alias("resolved")
    )
    return resolved.unionByName(leftover)


MIS_ROUNDS = 6


def _mis_key(r: int):
    """Round-r Luby priority key: the repo-standard 13-hex md5 decode
    of 'mis:<node>#<r>' zero-padded to 16 digits, suffixed with the
    node id — a total order (the suffix breaks any hash collision), so
    'two adjacent winners' is impossible by strict-min antisymmetry."""
    h = F.expr(
        f"CAST(conv(substr(md5(concat('mis:', node, '#', '{r}')), 1, 13),"
        " 16, 10) AS BIGINT)"
    )
    return F.concat(
        F.lpad(h.cast("string"), 16, "0"), F.lit("|"), F.col("node")
    )


def luby_mis(
    edges: DataFrame, n_rounds: int = MIS_ROUNDS, canon: DataFrame | None = None
) -> DataFrame:
    """Maximal independent set by Luby's algorithm (Luby 1986) with
    deterministic per-round hash priorities: each round, every active
    node whose priority key is a strict minimum over its active
    neighborhood joins the MIS, its neighbors leave as dominated, and
    the round repeats on the shrunken subgraph.  Isolated active nodes
    (no surviving neighbor) join unconditionally.

    Returns (node, status, round): status 'in_mis' or 'dominated' with
    the deciding round, or 'undecided' (round NULL) for nodes still
    active after ``n_rounds`` — Luby halves the active set in
    expectation per round, so a fixed small bound decides virtually
    everything while keeping the computation a deterministic function
    of the input on both engines (the k-core/LPA unrolled contract);
    at cluster scale the loop runs until the active set is empty.

    The MIS is the classic conflict-free parallel scheduler: a set of
    pairwise-non-adjacent dedup merges or edit applications can commit
    in one wave without coordination.

    Scale shape per round: one node-keyed neighbor-min aggregate and
    two semi-joins of the active edge set against node-sized frames —
    never a broadcast of anything edge-sized; actives/edges
    checkpointed per round to cut lineage."""
    canon = canon if canon is not None else _undirected(edges)
    und = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    active = und.select(F.col("u").alias("node")).distinct().localCheckpoint()
    spark = edges.sparkSession
    decided = spark.createDataFrame(
        [], "node string, status string, round bigint"
    )
    for r in range(1, n_rounds + 1):
        # early exit: an empty active set decides nothing in any later
        # round — skip the remaining rounds' join/checkpoint jobs
        if active.isEmpty():
            break
        keys = active.withColumn("key", _mis_key(r))
        nbr_min = (
            und.join(
                keys.select(F.col("node").alias("v"), F.col("key").alias("kv")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("kv").alias("nbr_min"))
            .withColumnRenamed("u", "node")
        )
        winners = (
            keys.join(nbr_min, "node", "left")
            .filter(
                F.col("nbr_min").isNull() | (F.col("key") < F.col("nbr_min"))
            )
            .select("node")
            .localCheckpoint()
        )
        dominated = (
            und.join(
                winners.select(F.col("node").alias("u")), "u", "left_semi"
            )
            .select(F.col("v").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        decided = decided.unionByName(
            winners.select(
                "node",
                F.lit("in_mis").alias("status"),
                F.lit(r).cast("bigint").alias("round"),
            )
        ).unionByName(
            dominated.select(
                "node",
                F.lit("dominated").alias("status"),
                F.lit(r).cast("bigint").alias("round"),
            )
        )
        gone = winners.unionAll(dominated)
        active = (
            active.join(gone, "node", "left_anti").localCheckpoint()
        )
        und = (
            und.join(active.select(F.col("node").alias("u")), "u", "left_semi")
            .join(active.select(F.col("node").alias("v")), "v", "left_semi")
            .localCheckpoint()
        )
    return decided.unionByName(
        active.select(
            "node",
            F.lit("undecided").alias("status"),
            F.lit(None).cast("bigint").alias("round"),
        )
    )


MST_ROUNDS = 5
MST_W_MOD = 1_000_000


def boruvka_mst(edges: DataFrame, n_rounds: int = MST_ROUNDS) -> DataFrame:
    """Minimum spanning forest by Boruvka's algorithm (Boruvka 1926;
    the textbook distributed MST — each round every component selects
    its minimum-weight outgoing edge, selected edges join the forest,
    touched components merge).  Edge weights are the repo-standard
    13-hex md5 decode of 'w:<a>|<b>' mod 1e6; ties are impossible
    because the comparison key appends the endpoint pair, giving the
    strict total order Boruvka needs for cycle-freedom.

    Component merging inside a round is CONVERGENCE-exact (pointer
    doubling over the selected-edge pointer forest — the classic
    Boruvka contraction; see the in-loop comment for why the label
    VALUES it produces are interchangeable with min-member labels),
    so each outer round is a true Boruvka round; ``n_rounds`` bounds
    the outer rounds only —
    components at least halve per round, and the output (the forest
    edges selected so far, tagged with their round) is a deterministic
    function of the input on both engines whether or not the forest
    has spanned.  MST = single-linkage clustering: cutting the forest
    at a weight threshold yields exactly the SLINK dendrogram level,
    which is how a dedup pipeline turns pairwise similarities into
    clusters without an all-pairs pass.

    Scale shape per round: two node-keyed label joins of the edge set
    + one per-component min aggregate (component-sized) + the CC loop
    on the SELECTED-edge graph (one edge per component, so the merge
    graph is component-sized, shrinking geometrically).  The merge
    graph and the label table are re-rooted on a temp-parquet scan
    each round (`_stats_reset`): Spark's localCheckpoint PRESERVES
    the optimized plan's size-in-bytes statistic, and nesting the CC
    fixpoint inside the Boruvka loop compounds that carried product
    until its digit count grows exponentially and Catalyst spends
    minutes in BigInteger multiplication during planning (observed:
    22 s to plan a 5-edge merge at sf0.01).  Periodic storage
    checkpointing is the textbook pattern for iterative Spark jobs at
    scale anyway; here it doubles as the stats re-root."""
    import shutil
    import tempfile

    spark = edges.sparkSession
    tmp_dirs = []

    def _stats_reset(df: DataFrame, tag: str) -> DataFrame:
        path = tempfile.mkdtemp(prefix=f"mst_{tag}_")
        tmp_dirs.append(path)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    wexpr = F.expr(
        f"CAST(conv(substr(md5(concat('w:', a, '|', b)), 1, 13), 16, 10)"
        f" AS BIGINT) % {MST_W_MOD}"
    )
    e = canon.select(
        "a",
        "b",
        wexpr.alias("w"),
    ).withColumn(
        "key",
        F.concat(
            F.lpad(F.col("w").cast("string"), 7, "0"),
            F.lit("|"),
            F.col("a"),
            F.lit("|"),
            F.col("b"),
        ),
    ).localCheckpoint()
    labels = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    forest = spark.createDataFrame(
        [], "a string, b string, w bigint, round bigint"
    )
    for r in range(1, n_rounds + 1):
        lab = labels
        cross = (
            e.join(
                lab.select(F.col("node").alias("a"), F.col("comp").alias("ca")),
                "a",
            )
            .join(
                lab.select(F.col("node").alias("b"), F.col("comp").alias("cb")),
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint()
        )
        # per-component minimum outgoing edge, via the strict key order
        incident = cross.select(
            F.col("ca").alias("comp"), "key"
        ).unionAll(cross.select(F.col("cb").alias("comp"), "key"))
        min_keys_c = incident.groupBy("comp").agg(F.min("key").alias("key"))
        chosen = cross.join(
            min_keys_c.select("key").distinct(), "key", "left_semi"
        ).select("a", "b", "w", "key", "ca", "cb").localCheckpoint()
        if chosen.isEmpty():
            break
        forest = forest.unionByName(
            chosen.select(
                "a", "b", "w", F.lit(r).cast("bigint").alias("round")
            )
        )
        # merge touched components by POINTER DOUBLING instead of the
        # general CC loop (the classic Boruvka contraction): every
        # component points at the other endpoint of ITS min edge, and
        # under the strict total key order the pointer graph is a
        # functional forest whose only cycles are mutual-min 2-cycles
        # — collapse those to their smaller endpoint, then square the
        # pointer until fixpoint (<= log2(depth) rounds of ONE
        # self-join each, vs CC's 3-join iterations over the full
        # merge graph).  Downstream only the PARTITION matters (labels
        # feed equality filters and group-bys; the published forest
        # carries no labels), and the pointer forest's weak components
        # are exactly the chosen-edge graph's components, so the
        # result is identical whether labels are min-members (CC) or
        # cycle-roots (here).
        par = (
            min_keys_c.join(chosen.select("key", "ca", "cb"), "key")
            .select(
                "comp",
                F.when(F.col("comp") == F.col("ca"), F.col("cb"))
                .otherwise(F.col("ca"))
                .alias("p"),
            )
            .localCheckpoint()
        )
        while True:
            pp = par.select(F.col("comp").alias("c2"), F.col("p").alias("p2"))
            nxt = (
                par.join(pp, par["p"] == pp["c2"], "left")
                .select(
                    "comp",
                    F.when(F.col("p2") == F.col("comp"), F.least("comp", "p"))
                    .otherwise(F.coalesce("p2", "p"))
                    .alias("new_p"),
                    F.col("p").alias("prev"),
                )
                .localCheckpoint()
            )
            changed = not nxt.filter(F.col("new_p") != F.col("prev")).isEmpty()
            par = nxt.select("comp", F.col("new_p").alias("p"))
            if not changed:
                break
        merge_map = par.select(
            F.col("comp").alias("node"), F.col("p").alias("component")
        )
        labels = _stats_reset(
            labels.join(
                merge_map.select(
                    F.col("node").alias("comp"),
                    F.col("component").alias("new_comp"),
                ),
                "comp",
                "left",
            ).select(
                "node",
                F.coalesce("new_comp", "comp").alias("comp"),
            ),
            f"labels{r}",
        )
    # the forest unions eagerly-checkpointed (memory-backed) frames,
    # so the temp scans are dead weight once the loop ends
    forest = forest.localCheckpoint()
    for p in tmp_dirs:
        shutil.rmtree(p, ignore_errors=True)
    return forest


def assortativity(edges: DataFrame, canon: DataFrame | None = None) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over every directed orientation
    of the undirected edge set — positive means hubs attach to hubs
    (social-graph shape), negative means hub-and-spoke (web/KG
    shape).  The one-number mixing diagnostic that says which join
    skew strategy a graph workload needs.

    All sums are exact integers; the final normalization divides by
    an IEEE sqrt of exact integers (correctly rounded, engine-
    identical — the repo's documented float exception).  Output: one
    row (n_edges directed, r_micro).

    Scale shape: one node-keyed degree aggregate, two degree joins of
    the edge set, one single-row sum rollup."""
    canon = canon if canon is not None else _undirected(edges)
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    both = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    j = (
        both.join(deg.select(F.col("node").alias("u"), F.col("d").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("y")), "v")
    )
    s = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return s.select(
        F.col("m").alias("n_edges"),
        F.expr(
            "CAST(FLOOR(1000000.0 * (CAST(m AS DOUBLE) * sxy"
            " - CAST(sx AS DOUBLE) * sy)"
            " / (SQRT(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            " * SQRT(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))"
            " AS BIGINT)"
        ).alias("r_micro"),
    )


TRUSS_K = 4
TRUSS_ROUNDS = 4


def _edge_support(canon: DataFrame) -> DataFrame:
    """Per-edge triangle support over undirected canon(a, b): each
    triangle (found once via the degree orientation, as in
    triangle_counts) contributes 1 to each of its three edges."""
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    with_deg = canon.join(
        deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a"
    ).join(
        deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b"
    )
    lower_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint()
    o1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    o2 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    wedges = o1.join(o2, "x").filter(F.col("y") != F.col("z"))
    # the semi-join against the ORIENTED edge set dedups the wedge
    # pair orders: only one of (y,z)/(z,y) exists as an oriented edge
    tris = wedges.join(
        oriented,
        (F.col("y") == F.col("u")) & (F.col("z") == F.col("v")),
        "left_semi",
    )
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("x", "y").alias("a"),
                    F.greatest("x", "y").alias("b"),
                ),
                F.struct(
                    F.least("x", "z").alias("a"),
                    F.greatest("x", "z").alias("b"),
                ),
                F.struct(
                    F.least("y", "z").alias("a"),
                    F.greatest("y", "z").alias("b"),
                ),
            )
        ).alias("e")
    ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    sup = tri_edges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("support")
    )
    return canon.join(sup, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
    )


def k_truss(
    edges: DataFrame,
    k: int = TRUSS_K,
    n_rounds: int = TRUSS_ROUNDS,
    canon: DataFrame | None = None,
) -> DataFrame:
    """k-truss of the undirected graph (Cohen 2008): iteratively peel
    every edge supported by fewer than k-2 triangles in the SURVIVING
    subgraph — the edge-grain sibling of k-core and the standard
    cohesive-community primitive (a k-truss edge sits in a near-
    clique; spam/link farms light up, tree-ish noise vanishes).
    Bounded synchronous rounds, same contract as k_core/LPA: a fixed
    round count keeps the result a deterministic input function on
    both engines; at cluster scale the loop runs to fixpoint.

    Returns surviving (a, b, support) with support measured on the
    final subgraph.

    Scale shape per round: one triangle-support pass (degree-oriented
    wedge join — the same bounded plan as triangle_counts) + one
    edge filter; edge frames checkpointed per round."""
    canon = canon if canon is not None else _undirected(edges).localCheckpoint()
    cur = canon
    for _ in range(n_rounds):
        sup = _edge_support(cur).localCheckpoint()
        cur = sup.filter(F.col("support") >= k - 2).select("a", "b")
    return _edge_support(cur).filter(F.col("support") >= 0).select(
        "a", "b", "support"
    )
