"""Knowledge-fusion and KG-quality profiling over the materialized
triple store: predicate functionality profiling, temporal fact
stability, multi-source truth discovery and KG-embedding negative
sampling.

The reference mines corrections from the revision history of ONE
source (Wikidata); a pipeline constructing a KG at 10^12-document
scale fuses triples from MANY extractors/sources and must (a) profile
which predicates behave like single-value / unique-value constraints
before any constraint table exists (functionality profiling is how
constraint candidates are bootstrapped — cf. the reference's
hand-curated constraint fetch, `corhist/.../ConstraintsListUpdater`),
(b) resolve conflicting claims across sources (truth discovery), and
(c) emit the training corpus for KG-embedding models (negative
sampling).  All public algorithms:

- Functionality / inverse functionality per predicate is the classic
  schema-profiling statistic (e.g. PARIS, Suchanek et al. VLDB 2012).
- Truth discovery runs the Sums/HITS-style fixpoint (Pasternack &
  Roth, COLING 2010; Kleinberg 1999): source trust = normalized sum
  of its claims' beliefs, claim belief = normalized sum of its
  sources' trusts — identical machinery to graph.hits, on the
  bipartite source-claim graph.
- Negative sampling with the "filtered" protocol (Bordes et al. 2013,
  TransE): corrupt head/tail with a deterministic hash-picked entity,
  drop corruptions that collide with a true triple.

Scale shape: everything is equi-joins + partial aggregations on
triple/claim keys; vocabulary-sized side tables (predicates, entity
ids, value ids) broadcast; the fixpoint rounds checkpoint per round
(the pagerank/LPA pattern) and their totals ride single-row broadcast
frames.  No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# integer-percent functionality threshold for flagging a predicate as
# a single-value / unique-value constraint CANDIDATE (the compare is
# done in integers: n * 100 >= PCT * total)
FUNC_CANDIDATE_PCT = 95

TD_ITERS = 6
TD_SOURCE_MOD = 17  # derived-claims source id space (entry harness)


def predicate_functionality(cur: DataFrame) -> DataFrame:
    """Per-predicate functionality profile over the current triple set
    ``cur(subj, pred, obj)`` -> (pred, n_triples, n_subjects,
    n_objects, functionality, inverse_functionality,
    single_value_candidate, unique_value_candidate).

    functionality = #distinct subjects / #triples (1.0 = every subject
    carries at most one value — the predicate behaves like a
    single-value constraint); inverse_functionality likewise over
    objects (1.0 = a value identifies its subject — unique-value).
    The candidate flags compare in pure integers
    (n * 100 >= 95 * n_triples), so both engines decide identically;
    the published ratios are rounded to 6 decimals.

    Scale shape: ONE map-side-combined groupBy(pred) over the triple
    set (count + two count-distincts co-partitioned on pred); output
    is predicate-vocabulary-sized (thousands of rows at Wikidata
    scale, never corpus-sized)."""
    prof = cur.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
        F.countDistinct("obj").alias("n_objects"),
    )
    return prof.select(
        "pred",
        "n_triples",
        "n_subjects",
        "n_objects",
        F.round(F.col("n_subjects") / F.col("n_triples").cast("double"), 6).alias(
            "functionality"
        ),
        F.round(F.col("n_objects") / F.col("n_triples").cast("double"), 6).alias(
            "inverse_functionality"
        ),
        (F.col("n_subjects") * 100 >= F.lit(FUNC_CANDIDATE_PCT) * F.col("n_triples")).alias(
            "single_value_candidate"
        ),
        (F.col("n_objects") * 100 >= F.lit(FUNC_CANDIDATE_PCT) * F.col("n_triples")).alias(
            "unique_value_candidate"
        ),
    )


def fact_stability(state: DataFrame, max_rev: int) -> DataFrame:
    """Contested-fact profile over the reconstructed validity intervals
    ``state(subj, pred, obj, from_rev, to_rev)``: facts that were
    removed and re-added (>= 2 validity episodes) -> (subj, pred, obj,
    n_episodes, first_from, last_to, covered_revs, is_current).

    These are the edit-war statements — exactly the rows a correction
    miner (the reference's whole purpose) should weight carefully,
    because their deletions are CONTESTED rather than corrective.
    covered_revs sums the interval lengths (revision-count dwell time);
    is_current is whether the latest episode is still open
    (to_rev = max_rev sentinel); the open episode is EXCLUDED from
    covered_revs (its to_rev is the +infinity sentinel, not a
    duration).  Integer-only, so the DuckDB transcription is exact.

    Scale shape: one groupBy over (subj, pred, obj) on the interval
    table (already co-partitioned by the state builder's window) with
    map-side combine; the >= 2 episode filter keeps the output
    churn-sized, not corpus-sized."""
    return (
        state.groupBy("subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).alias("n_episodes"),
            F.min("from_rev").alias("first_from"),
            F.max("to_rev").alias("last_to"),
            F.sum(
                F.when(
                    F.col("to_rev") < F.lit(max_rev),
                    F.col("to_rev") - F.col("from_rev"),
                ).otherwise(F.lit(0))
            ).alias("covered_revs"),
        )
        .filter(F.col("n_episodes") >= 2)
        .withColumn("is_current", F.col("last_to") == F.lit(max_rev))
    )


def truth_discovery(claims: DataFrame, n_iters: int = TD_ITERS) -> DataFrame:
    """Multi-source conflict resolution over ``claims(source, subj,
    pred, obj)`` (distinct source-claim assertions): fixed-``n_iters``
    Sums fixpoint (Pasternack & Roth 2010 — HITS on the bipartite
    source/claim graph), then per (subj, pred) pick the
    highest-belief value -> (subj, pred, resolved_obj, belief_norm,
    n_candidates).

    belief_norm = claim belief * n_claims rounded to 6 decimals (1.0 =
    the uniform baseline — the pagerank/HITS float contract); the
    winner is ranked on the ROUNDED belief with ties broken toward
    the smallest obj, so both engines pick identical rows.  Sources
    start at uniform trust 1/n_sources; each half-round L1-normalizes,
    so totals stay 1 and the normalizing denominators are strictly
    positive on any nonempty claim set.

    Scale shape: per round, two claim-keyed equi-joins + two
    partial-aggregated sums + two single-row broadcast totals (the
    graph.hits shape exactly); trust/belief frames are checkpointed
    per round.  The final argmax is one window over the per-(subj,
    pred) candidate values (bounded by the value vocabulary)."""
    cl = claims.select("source", "subj", "pred", "obj").distinct().localCheckpoint()
    sources = cl.select("source").distinct().localCheckpoint()
    facts = cl.select("subj", "pred", "obj").distinct().localCheckpoint()
    n_sources = sources.count()
    n_facts = facts.count()
    if n_facts == 0:
        return facts.select(
            F.col("subj"),
            F.col("pred"),
            F.col("obj").alias("resolved_obj"),
            F.lit(0.0).alias("belief_norm"),
            F.lit(0).alias("n_candidates"),
        )
    trust = sources.withColumn("trust", F.lit(1.0 / n_sources)).localCheckpoint()
    belief = None
    for _ in range(n_iters):
        b_raw = (
            cl.join(trust, "source")
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("trust").alias("s"))
        )
        b_tot = b_raw.agg(F.sum("s").alias("t"))
        belief = (
            b_raw.crossJoin(F.broadcast(b_tot))  # single-row totals frame
            .select("subj", "pred", "obj", (F.col("s") / F.col("t")).alias("belief"))
            # NOT checkpointed: belief is consumed once inside this
            # round's trust checkpoint (and by the final argmax for the
            # last round) — the graph.hits half-round pattern; trust's
            # checkpoint below cuts the lineage every round
        )
        t_raw = (
            cl.join(belief, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(F.sum("belief").alias("s"))
        )
        t_tot = t_raw.agg(F.sum("s").alias("t"))
        trust = (
            t_raw.crossJoin(F.broadcast(t_tot))  # single-row totals frame
            .select("source", (F.col("s") / F.col("t")).alias("trust"))
            .localCheckpoint()
        )
    scored = belief.select(
        "subj",
        "pred",
        "obj",
        F.round(F.col("belief") * F.lit(float(n_facts)), 6).alias("belief_norm"),
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.desc("belief_norm"), F.asc("obj")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_candidates",
            F.count(F.lit(1)).over(Window.partitionBy("subj", "pred")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "subj",
            "pred",
            F.col("obj").alias("resolved_obj"),
            "belief_norm",
            "n_candidates",
        )
    )


# 52-bit md5 decode (the repo-standard hash-in-place-of-RNG), salted per
# corruption position so head and tail draws are independent
def _hash52(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 13), 16, 10) AS BIGINT)"


# expected vocabulary-bucket occupancy for the negative-sampling draw:
# the vocabulary is hashed into ceil(|V| / KGE_BUCKET) buckets, so a
# draw touches ~KGE_BUCKET candidates regardless of vocabulary size
KGE_BUCKET = 64


def _bucketed_draw(
    trip: DataFrame,
    vocab: DataFrame,
    vocab_col: str,
    salt: str,
) -> DataFrame:
    """Deterministic one-per-triple draw from ``vocab`` without a
    global index: vocab elements are hashed into ~KGE_BUCKET-occupancy
    buckets, each triple hashes to ONE bucket (salted by corruption
    position) and takes the candidate minimizing a per-(triple,
    candidate) hash.  Two bounded equi-joins — candidate volume is
    |triples| * ~KGE_BUCKET — with no vocabulary broadcast and no
    global sort, so the plan survives a 100M-entity vocabulary.
    Returns trip columns + ``pick``."""
    n_tot = vocab.agg(F.count(F.lit(1)).alias("n_tot"))
    buckets = (
        vocab.crossJoin(F.broadcast(n_tot))  # single-row totals frame
        .select(
            F.col(vocab_col).alias("cand"),
            (
                F.expr(_hash52(f"concat('kgeb:', {vocab_col})"))
                % F.greatest(F.lit(1), F.expr(f"n_tot div {KGE_BUCKET}"))
            ).alias("bucket"),
        )
    )
    key = "concat(subj, '|', pred, '|', obj)"
    drawn = trip.crossJoin(F.broadcast(n_tot)).select(
        "subj",
        "pred",
        "obj",
        (
            F.expr(_hash52(f"concat('{salt}:', {key})"))
            % F.greatest(F.lit(1), F.expr(f"n_tot div {KGE_BUCKET}"))
        ).alias("bucket"),
    )
    # the per-triple argmin over ~KGE_BUCKET candidates as a map-side-
    # combinable MIN over struct(score, cand) instead of a row_number
    # window: struct ordering compares (score ASC, cand ASC) — exactly
    # the window's ORDER BY, both fields non-null — so the picked row
    # is identical, but the shuffle carries one partially-aggregated
    # row per triple instead of every candidate row through a sort.
    # Validated at BOTH scales (sf0.1 interleaved pairs lean positive;
    # sf1 fast-phase 18.4/24.6 s vs 23.0 s for the window).  NOTE a
    # measurement trap hit during gating: this query's sf1 row is the
    # most shuffle-I/O-bound thing benched, and a host disk-throttle
    # phase produced 157–190 s readings on BOTH variants (the window
    # version included, on an untouched tree) while raw CPU stayed
    # full-speed — slow readings here should be cross-checked against
    # an interleaved control before blaming the plan.
    return (
        drawn.join(buckets, "bucket")
        .withColumn(
            "score", F.expr(_hash52(f"concat('kgepick:{salt}:', {key}, ':', cand)"))
        )
        .groupBy("subj", "pred", "obj")
        .agg(F.min(F.struct("score", "cand")).alias("_best"))
        .select("subj", "pred", "obj", F.col("_best.cand").alias("pick"))
    )


def kge_negatives(cur: DataFrame) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (Bordes et
    al. 2013) over the current triple set ``cur(subj, pred, obj)``:
    for every true triple, corrupt the head with a hash-picked entity
    and the tail with a hash-picked value, keep a corruption only if
    (a) it differs from the true element and (b) the corrupted triple
    is NOT itself true (the "filtered" protocol) -> (subj, pred, obj,
    position, neg_value) with position in {'head', 'tail'}.

    The replacement draw avoids both a global vocabulary index (a
    single-partition row_number at 100M entities) and a vocabulary
    broadcast: the vocabulary is hashed into ~KGE_BUCKET-occupancy
    buckets, the triple hashes to one bucket, and the winner is the
    in-bucket candidate minimizing a per-(triple, candidate) hash —
    the repo's hash-in-place-of-RNG convention, deterministic across
    engines/runs/partitionings and transcribable as a window argmin.

    Scale shape: two equi-joins on the bucket key with candidate
    volume |triples| * ~KGE_BUCKET (linear), one per-triple argmin
    window over ~KGE_BUCKET candidates, then triple-keyed anti-joins
    against the true set for the filtered protocol.  Vocabulary
    counts ride single-row broadcast frames."""
    trip = cur.select("subj", "pred", "obj").distinct().localCheckpoint()
    ents = trip.select("subj").distinct()
    vals = trip.select("obj").distinct()

    heads = (
        _bucketed_draw(trip, ents, "subj", "negh")
        .filter(F.col("pick") != F.col("subj"))
        .select("subj", "pred", "obj", F.col("pick").alias("neg_value"))
        .join(
            trip.select(
                F.col("subj").alias("neg_value"),
                F.col("pred").alias("pred"),
                F.col("obj").alias("obj"),
            ),
            ["neg_value", "pred", "obj"],
            "left_anti",
        )
        .withColumn("position", F.lit("head"))
    )
    tails = (
        _bucketed_draw(trip, vals, "obj", "negt")
        .filter(F.col("pick") != F.col("obj"))
        .select("subj", "pred", "obj", F.col("pick").alias("neg_value"))
        .join(
            trip.select(
                F.col("subj").alias("subj"),
                F.col("pred").alias("pred"),
                F.col("obj").alias("neg_value"),
            ),
            ["subj", "pred", "neg_value"],
            "left_anti",
        )
        .withColumn("position", F.lit("tail"))
    )
    return heads.unionByName(tails).select(
        "subj", "pred", "obj", "position", "neg_value"
    )


SUMMARY_TOP_K = 3


def entity_summaries(cur: DataFrame, top_k: int = SUMMARY_TOP_K) -> DataFrame:
    """Per-entity fact selection for summarization / description
    generation (the RELIN/FACES family of RDF entity summarizers,
    public; informativeness = -ln of the predicate's corpus
    frequency, the standard self-information weight): the top_k facts
    of every subject ranked by rarest-predicate-first -> (subj, pred,
    obj, rank, info) with info = -ln(n_pred / n_total) rounded to 6
    decimals.

    Ranking is decided on (n_pred ASC, pred ASC, obj ASC) — pure
    integer/string compares, so both engines pick identical rows; the
    float info is display-only.  The log ratio is ONE double division
    of two exact BIGINTs (the predicate_pmi contract).

    Scale shape: predicate marginals are vocabulary-sized (broadcast-
    able, left to AQE); the rank window partitions by subject over
    <= that subject's fact count.  Output is top_k * n_entities."""
    marg = cur.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pred"))
    tot = cur.agg(F.count(F.lit(1)).alias("n_total"))
    w = Window.partitionBy("subj").orderBy(
        F.asc("n_pred"), F.asc("pred"), F.asc("obj")
    )
    return (
        cur.join(marg, "pred")
        .crossJoin(F.broadcast(tot))  # single-row totals frame
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "subj",
            "pred",
            "obj",
            "rank",
            F.round(
                -F.log(F.col("n_pred").cast("double") / F.col("n_total").cast("double")),
                6,
            ).alias("info"),
        )
    )


def kg_linearize(cur: DataFrame) -> DataFrame:
    """KG-to-text linearization (the KELM recipe, Agarwal et al.
    NAACL 2021, public: verbalize each entity's triples into one
    training sentence): per subject, facts sorted by (pred, obj) and
    joined as 'subj: pred obj; pred obj; ...' -> (subj, text,
    n_facts, n_tokens).  The bridge from the materialized KG back
    into LLM pre-training data — corpus docs whose token counts feed
    the same curation operators as crawled text.

    Determinism: the clause order is the canonical (pred, obj) sort
    inside an array_sort on the struct (Spark) / string_agg ORDER BY
    (DuckDB) — byte-identical texts on both engines; n_tokens uses
    the repo-wide whitespace token definition.

    Scale shape: ONE groupBy(subj) with a collect_list bounded by the
    per-entity fact count (a KG entity has tens-to-thousands of
    facts, never corpus-sized rows); no window, no global sort."""
    clauses = (
        cur.groupBy("subj")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pred", "obj"))
            ).alias("facts")
        )
        .select(
            "subj",
            F.concat(
                F.col("subj"),
                F.lit(": "),
                F.array_join(
                    F.transform(
                        "facts", lambda x: F.concat(x["pred"], F.lit(" "), x["obj"])
                    ),
                    "; ",
                ),
            ).alias("text"),
            F.size("facts").alias("n_facts"),
        )
    )
    return clauses.withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))),
    )


def characteristic_sets(cur: DataFrame) -> DataFrame:
    """Characteristic-set statistics (Neumann & Moerkotte, ICDE 2011 —
    the standard join-cardinality estimator for RDF/SPARQL engines):
    group subjects by their exact predicate SET -> (char_set, n_preds,
    n_subjects, n_triples), char_set = the sorted comma-joined
    predicate list.

    This is the planner-facing profile of the materialized KG: a
    query optimizer estimates star-join cardinalities from exactly
    these counts, and a curator reads entity 'shapes' (which
    predicate combinations exist, how many entities carry each) off
    the same table.  Pure integer/string — the DuckDB transcription
    is exact.

    Scale shape: one distinct over (subj, pred), one groupBy(subj)
    with a collect_set bounded by the predicate vocabulary, one
    groupBy(char_set) whose output is the number of DISTINCT entity
    shapes (<= 2^|vocab| in theory, a few thousand in practice —
    Neumann-Moerkotte's published observation), plus one subject-
    keyed count join for the triple totals."""
    per_subj = (
        cur.groupBy("subj")
        .agg(
            F.array_join(F.array_sort(F.collect_set("pred")), ",").alias("char_set"),
            F.count(F.lit(1)).alias("n_triples_subj"),
            F.size(F.collect_set("pred")).alias("n_preds"),
        )
    )
    return per_subj.groupBy("char_set", "n_preds").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("n_triples_subj").cast("long").alias("n_triples"),
    ).select("char_set", "n_preds", "n_subjects", "n_triples")


EDIT_ACTIVITY_BUCKET = 1000


def edit_activity(edits: DataFrame, bucket: int = EDIT_ACTIVITY_BUCKET) -> DataFrame:
    """Edit-stream churn profile: adds/deletes per (predicate,
    revision bucket) -> (pred, rev_bucket, n_adds, n_dels,
    n_entities) — the time-series view of the revision feed the
    correction miner consumes (which properties are being edited,
    when, and how delete-heavy the traffic is); rev_bucket =
    rev_id div bucket.

    Integer-only; one map-side-combined groupBy over the edit stream
    (conditional sums, distinct-entity count co-partitioned on the
    group key)."""
    return (
        edits.select(
            "pred",
            F.expr(f"rev_id div {bucket}").alias("rev_bucket"),
            "op",
            "subj",
        )
        .groupBy("pred", "rev_bucket")
        .agg(
            F.sum(F.when(F.col("op") == "add", 1).otherwise(0)).cast("long").alias("n_adds"),
            F.sum(F.when(F.col("op") == "del", 1).otherwise(0)).cast("long").alias("n_dels"),
            F.countDistinct("subj").alias("n_entities"),
        )
    )


def predicate_domain_range(triples: DataFrame, types: DataFrame) -> DataFrame:
    """SDType-flavored ontology induction (Paulheim & Bizer 2013,
    "Type Inference on Noisy RDF Data" — the statistical
    domain/range pattern): the induced DOMAIN of a predicate is the
    subject type carrying the largest share of its triples, the
    induced RANGE likewise over objects — (pred, n_triples,
    domain_cls, domain_share, range_cls, range_share).  Ties break to
    the lexicographically smallest class; shares are relative to the
    TYPED triples on that side and round to 6 decimals.

    ``types(entity, cls)`` is the type assignment table — in a real
    KG the P31/instance-of triples (or the canonicalized CC output);
    the entry harness derives the fixture's deterministic typing
    convention (the same C(u % 30) scheme the type-constraint kernels
    plant).

    Scale shape: the triple set joins the type table twice (entity
    types are vocabulary-sized next to triples — broadcastable in
    practice, plain shuffle-joinable otherwise), then two
    (pred, cls) map-side-combined aggregates and a
    predicate-partitioned argmax window over class-count rows (output
    and window input are both predicate x class sized, never
    corpus-sized)."""
    from pyspark.sql import Window

    t = triples.select("subj", "pred", "obj")

    def side(key: str):
        j = t.join(
            types.select(F.col("entity").alias(key), "cls"), key
        )
        counts = j.groupBy("pred", "cls").agg(F.count(F.lit(1)).alias("n"))
        tot = counts.groupBy("pred").agg(F.sum("n").alias("n_typed"))
        w = Window.partitionBy("pred").orderBy(F.col("n").desc(), F.col("cls"))
        top = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .join(tot, "pred")
            .select(
                "pred",
                F.col("cls"),
                F.round(F.col("n") / F.col("n_typed"), 6).alias("share"),
            )
        )
        return top

    dom = side("subj").select(
        "pred", F.col("cls").alias("domain_cls"), F.col("share").alias("domain_share")
    )
    rng = side("obj").select(
        "pred", F.col("cls").alias("range_cls"), F.col("share").alias("range_share")
    )
    n = t.groupBy("pred").agg(F.count(F.lit(1)).alias("n_triples"))
    return (
        n.join(dom, "pred", "left")
        .join(rng, "pred", "left")
        .select(
            "pred", "n_triples", "domain_cls", "domain_share",
            "range_cls", "range_share",
        )
    )


SHAPE_ROUND = 6


def shape_induction(cur: DataFrame, types: DataFrame) -> DataFrame:
    """SHACL-lite shape mining (the statistical half of sheXer /
    Fernandez-Alvarez et al. 2022: induce per-class property shapes
    from instance data): for every (cls, pred) observed on typed
    subjects of the current state, publish the evidence a shape
    extractor thresholds on — (cls, pred, n_insts, usage_share,
    avg_card, max_card, funct_ratio) where usage_share is the
    fraction of the class's subject instances carrying the predicate
    at all, avg_card/max_card profile the per-instance value
    cardinality, and funct_ratio is the fraction of carrying
    instances with exactly one value (the sh:maxCount 1 vote).
    Shares round to 6 decimals; complements ``predicate_domain_range``
    (majority type PER PREDICATE) with the per-CLASS property view.

    ``types(entity, cls)`` is the type-assignment table as in
    ``predicate_domain_range``.

    Scale shape: one (subj, pred) count over the current state
    (map-side combinable), one entity-keyed join against the
    vocabulary-sized type table, then a (cls, pred) aggregate and a
    cls-keyed join against the per-class instance totals — all
    equi-joins on bounded-cardinality keys; the output is
    class x predicate sized, never corpus-sized."""
    typed = types.select(F.col("entity").alias("subj"), "cls")
    card = cur.groupBy("subj", "pred").agg(F.count(F.lit(1)).alias("card"))
    per_cls = (
        card.join(typed, "subj")
        .groupBy("cls", "pred")
        .agg(
            F.count(F.lit(1)).alias("n_insts"),
            F.round(F.avg("card"), SHAPE_ROUND).alias("avg_card"),
            F.max("card").alias("max_card"),
            F.round(
                F.avg((F.col("card") == 1).cast("double")), SHAPE_ROUND
            ).alias("funct_ratio"),
        )
    )
    cls_totals = (
        cur.select("subj")
        .distinct()
        .join(typed, "subj")
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n_cls"))
    )
    return per_cls.join(cls_totals, "cls").select(
        "cls",
        "pred",
        "n_insts",
        F.round(F.col("n_insts") / F.col("n_cls"), SHAPE_ROUND).alias("usage_share"),
        "avg_card",
        "max_card",
        "funct_ratio",
    )


def truthy_filter(statements: DataFrame) -> DataFrame:
    """Wikidata BestRank / truthy (wdt:) statement filtering — the
    rank semantics every Wikidata consumer (including the reference's
    WDQS queries, which read wdt: truthy triples) depends on:
    statements carry a stmt_rank in {preferred, normal, deprecated};
    the truthy view of a (subj, pred) group is its PREFERRED
    statements when any exist, else its NORMAL statements, and
    deprecated statements never surface.

    Input: ``statements(subj, pred, obj, stmt_rank)``.  Output: the
    surviving (subj, pred, obj, stmt_rank) rows.

    Scale shape: one (subj, pred) map-side-combinable aggregate (does
    the group hold a preferred statement?) joined back on the same
    key — the join reuses the aggregate's hash partitioning, so the
    whole filter is one shuffle; no windows, nothing corpus-sized
    broadcast."""
    nondep = statements.filter(F.col("stmt_rank") != "deprecated")
    has_pref = nondep.groupBy("subj", "pred").agg(
        F.max((F.col("stmt_rank") == "preferred").cast("int")).alias("_hp")
    )
    return (
        nondep.join(has_pref, ["subj", "pred"])
        .filter(
            (F.col("_hp") == 1) & (F.col("stmt_rank") == "preferred")
            | (F.col("_hp") == 0) & (F.col("stmt_rank") == "normal")
        )
        .select("subj", "pred", "obj", "stmt_rank")
    )


def join_cardinality_stats(cur: DataFrame) -> DataFrame:
    """Predicate-pair join-cardinality statistics — the composed-path
    counts (?s p1 ?x . ?x p2 ?o) a SPARQL cost model keeps per
    predicate pair (the characteristic-pairs complement of
    ``characteristic_sets``; Neumann & Moerkotte's RDF-3X statistics
    carry exactly this).  For every ordered (pred_a, pred_b):
    n_paths = the exact number of length-2 composed bindings,
    n_mid = distinct intermediate entities contributing.

    Scale shape: the path count is NEVER enumerated — per
    intermediate entity x, n_paths contributes
    in_count(x, p1) * out_count(x, p2), so the job is two entity-
    keyed counts, one entity-keyed equi-join (per-entity row volume
    is bounded by the entity's DISTINCT predicate counts, not its
    degree — hub-safe by construction), and one predicate-pair
    aggregate over BIGINT-exact products.  Output is
    predicate-vocabulary² sized."""
    inc = cur.groupBy(F.col("obj").alias("x"), F.col("pred").alias("pred_a")).agg(
        F.count(F.lit(1)).alias("n_in")
    )
    out = cur.groupBy(F.col("subj").alias("x"), F.col("pred").alias("pred_b")).agg(
        F.count(F.lit(1)).alias("n_out")
    )
    return (
        inc.join(out, "x")
        .groupBy("pred_a", "pred_b")
        .agg(
            F.sum(F.col("n_in") * F.col("n_out")).alias("n_paths"),
            F.countDistinct("x").alias("n_mid"),
        )
    )


SYM_SUGGEST_PCT = 50


def constraint_suggestions(cur: DataFrame) -> DataFrame:
    """Constraint-candidate mining over instance data — the
    bootstrap complement of corhist's correction mining (the
    reference consumes HUMAN-curated property constraints from WDQS,
    `.../ConstraintsListBuilder.java`; this op proposes NEW ones
    from the data itself, the SDType/RDF2rules-style suggestion
    loop): per predicate, the single-value vote (functionality >=
    95%, integer compare) and the symmetric vote (share of distinct
    (s,o) pairs whose reverse (o,s) also holds under the SAME
    predicate >= SYM_SUGGEST_PCT%).

    Output: (pred, n_triples, n_pairs, n_recip, functionality,
    symmetric_share, suggest_single_value, suggest_symmetric).

    Scale shape: one predicate-keyed profile aggregate, one distinct
    over (s, p, o), one reversed-key self semi-join partitioned on
    (pred, subj, obj), two predicate-keyed counts — every join is an
    equi-join on corpus-partitioned keys, all votes compare in pure
    integers so both engines decide identically."""
    pairs = cur.select("pred", "subj", "obj").distinct().localCheckpoint()
    rev = pairs.select(
        "pred", F.col("obj").alias("subj"), F.col("subj").alias("obj")
    )
    recip = pairs.join(rev, ["pred", "subj", "obj"], "left_semi")
    per_pred = cur.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
    )
    n_pairs = pairs.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    n_recip = recip.groupBy("pred").agg(F.count(F.lit(1)).alias("n_recip"))
    return (
        per_pred.join(n_pairs, "pred")
        .join(n_recip, "pred", "left")
        .select(
            "pred",
            "n_triples",
            "n_pairs",
            F.coalesce("n_recip", F.lit(0)).cast("bigint").alias("n_recip"),
            F.round(
                F.col("n_subjects") / F.col("n_triples").cast("double"), 6
            ).alias("functionality"),
            F.round(
                F.coalesce("n_recip", F.lit(0)) / F.col("n_pairs").cast("double"),
                6,
            ).alias("symmetric_share"),
            (
                F.col("n_subjects") * 100 >= F.lit(FUNC_CANDIDATE_PCT) * F.col("n_triples")
            ).alias("suggest_single_value"),
            (
                F.coalesce("n_recip", F.lit(0)) * 100
                >= F.lit(SYM_SUGGEST_PCT) * F.col("n_pairs")
            ).alias("suggest_symmetric"),
        )
    )


def asof_multivalue(state: DataFrame, rev: int) -> DataFrame:
    """Point-in-time multi-value profile — the single-value
    constraint check evaluated AS OF an arbitrary past revision
    (`rev`), not just the current state: every (subj, pred) carrying
    two or more distinct values in the validity intervals covering
    ``rev`` (from_rev <= rev < to_rev).  This is the interval-state
    payoff the reference's history index exists for
    (`.../HistoryRepository.java` point lookups): any historical
    snapshot is one filter away, no replay.

    Output: (subj, pred, n_objs) for n_objs >= 2.

    Scale shape: one interval filter (partition-prunable on a
    from_rev-partitioned warehouse) + one (subj, pred)
    map-side-combinable distinct count."""
    active = state.filter(
        (F.col("from_rev") <= F.lit(rev)) & (F.col("to_rev") > F.lit(rev))
    )
    return (
        active.groupBy("subj", "pred")
        .agg(F.countDistinct("obj").alias("n_objs"))
        .filter(F.col("n_objs") >= 2)
    )


def class_connectivity(cur: DataFrame, types: DataFrame) -> DataFrame:
    """Class-pair connectivity profile — the class-level adjacency
    summary of the instance graph (the schema-graph view ontology
    tools draw): for every (subject class, object class) pair, the
    number of current-state triples and distinct predicates linking
    them.  Complements ``predicate_domain_range`` (per-predicate
    majority types) with the full class x class matrix.

    Scale shape: two entity-keyed joins against the
    vocabulary-sized type table + one (cls_a, cls_b) map-side-
    combined aggregate; output is class² sized, never corpus-sized."""
    ta = types.select(F.col("entity").alias("subj"), F.col("cls").alias("cls_a"))
    tb = types.select(F.col("entity").alias("obj"), F.col("cls").alias("cls_b"))
    return (
        cur.join(ta, "subj")
        .join(tb, "obj")
        .groupBy("cls_a", "cls_b")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("pred").alias("n_preds"),
        )
    )


REVERT_WINDOW = 20


def revert_detection(edits: DataFrame, window: int = REVERT_WINDOW) -> DataFrame:
    """Identity-revert detection over the edit history — the wiki-
    history maintenance signal (a deletion undone by re-adding the
    SAME triple within ``window`` revisions is a revert, the
    canonical instability marker feeding vandalism heuristics and
    the reference's game queue): one row per revert event
    (subj, pred, obj, del_rev, readd_rev, gap).

    Scale shape: one window (lead) per (subj, pred, obj) ordered by
    rev — the same triple-keyed partitioning the interval-state
    builder already uses; no self-join, nothing corpus-sized
    broadcast."""
    from pyspark.sql import Window

    w = Window.partitionBy("subj", "pred", "obj").orderBy("rev_id")
    flagged = edits.select(
        "subj",
        "pred",
        "obj",
        "op",
        F.col("rev_id").alias("del_rev"),
        F.lead("op").over(w).alias("_nop"),
        F.lead("rev_id").over(w).alias("readd_rev"),
    )
    return (
        flagged.filter(
            (F.col("op") == "del")
            & (F.col("_nop") == "add")
            & (F.col("readd_rev") - F.col("del_rev") <= window)
        )
        .select(
            "subj",
            "pred",
            "obj",
            "del_rev",
            "readd_rev",
            (F.col("readd_rev") - F.col("del_rev")).alias("gap"),
        )
    )


def typed_negatives(cur: DataFrame, types: DataFrame) -> DataFrame:
    """Type-constrained filtered negative sampling (Krompass et al.
    2015): like ``kge_negatives`` but corruptions are drawn ONLY from
    entities of the SAME class as the element they replace — the
    standard upgrade that stops an embedding model from learning mere
    type separation instead of real semantics.  Output: (subj, pred,
    obj, position, neg_value), filtered protocol (corruption must
    differ from the true element and must not itself be a true
    triple).  Triples whose (class, bucket) draw finds no candidate
    drop out deterministically on both engines (rare classes).

    Scale shape: inherits ``_bucketed_draw``'s bounds with the class
    added to the bucket join key — candidate volume stays
    |triples| * ~KGE_BUCKET, no vocabulary broadcast, no global
    index; one extra vocabulary-sized type join per side."""
    trip = cur.select("subj", "pred", "obj").distinct().localCheckpoint()
    key = "concat(subj, '|', pred, '|', obj)"

    def side(vocab_col: str, salt: str, position: str) -> DataFrame:
        vocab = (
            trip.select(vocab_col)
            .distinct()
            .join(
                types.select(F.col("entity").alias(vocab_col), "cls"), vocab_col
            )
        )
        n_tot = vocab.agg(F.count(F.lit(1)).alias("n_tot"))
        nbuck = F.greatest(F.lit(1), F.expr(f"n_tot div {KGE_BUCKET}"))
        buckets = vocab.crossJoin(F.broadcast(n_tot)).select(  # 1-row totals
            F.col(vocab_col).alias("cand"),
            "cls",
            (F.expr(_hash52(f"concat('kgeb:', {vocab_col})")) % nbuck).alias(
                "bucket"
            ),
        )
        drawn = (
            trip.join(
                types.select(F.col("entity").alias(vocab_col), "cls"), vocab_col
            )
            .crossJoin(F.broadcast(n_tot))  # single-row totals frame
            .select(
                "subj",
                "pred",
                "obj",
                "cls",
                (F.expr(_hash52(f"concat('{salt}:', {key})")) % nbuck).alias(
                    "bucket"
                ),
            )
        )
        # NOTE: kept as the row_number window, unlike _bucketed_draw's
        # argmin-as-aggregate — the class-partitioned buckets make this
        # side's candidate volume small enough that the aggregate's
        # SortAggregate fallback (struct buffers are not hash-aggregable)
        # measured consistently SLOWER here (3 interleaved min-of-N
        # pairs: +0.3..0.7 s), while the window stays in one exchange
        w = Window.partitionBy("subj", "pred", "obj").orderBy("score", "cand")
        picked = (
            drawn.join(buckets, ["cls", "bucket"])
            .withColumn(
                "score",
                F.expr(_hash52(f"concat('kgepick:{salt}:', {key}, ':', cand)")),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("subj", "pred", "obj", F.col("cand").alias("pick"))
        )
        anti_key = (
            ["neg_value", "pred", "obj"]
            if vocab_col == "subj"
            else ["subj", "pred", "neg_value"]
        )
        renamed = trip.select(
            F.col("subj").alias("neg_value" if vocab_col == "subj" else "subj"),
            "pred",
            F.col("obj").alias("obj" if vocab_col == "subj" else "neg_value"),
        )
        return (
            picked.filter(F.col("pick") != F.col(vocab_col))
            .select("subj", "pred", "obj", F.col("pick").alias("neg_value"))
            .join(renamed, anti_key, "left_anti")
            .withColumn("position", F.lit(position))
        )

    return side("subj", "tnegh", "head").unionByName(
        side("obj", "tnegt", "tail")
    ).select("subj", "pred", "obj", "position", "neg_value")


DATATYPE_CLASSES = (
    ("qid", "^Q[0-9]+$"),
    ("vid", "^V[0-9]+$"),
    ("int", "^-?[0-9]+$"),
)


def datatype_induction(cur: DataFrame) -> DataFrame:
    """Per-predicate object-datatype induction — the range-DATATYPE
    complement of ``predicate_domain_range`` (which induces range
    CLASSES): classify every object value against the ordered regex
    ladder (entity Q-id, value V-id, bare integer, else string) and
    publish per predicate the share of each class plus the majority
    datatype — what a property-constraint bootstrapper needs before
    proposing value-type or format constraints.

    Output: (pred, n_triples, n_qid, n_vid, n_int, n_str,
    majority_type, majority_share) with share rounded to 6; ties
    break to the first class in the ladder via the fixed >= CASE
    chain, identically on both engines.

    Scale shape: ONE map-side classification pass + one
    predicate-keyed aggregate; output is predicate-vocabulary
    sized."""
    checks = [
        F.sum(F.when(F.col("obj").rlike(rx), 1).otherwise(0)).alias(f"n_{name}")
        for name, rx in DATATYPE_CLASSES
    ]
    prof = cur.groupBy("pred").agg(F.count(F.lit(1)).alias("n_triples"), *checks)
    n_str = (
        F.col("n_triples") - F.col("n_qid") - F.col("n_vid") - F.col("n_int")
    ).alias("n_str")
    prof = prof.select("pred", "n_triples", "n_qid", "n_vid", "n_int", n_str)
    q, v, i, s = (F.col(c) for c in ("n_qid", "n_vid", "n_int", "n_str"))
    best = F.greatest(q, v, i, s)
    majority = (
        F.when((q >= v) & (q >= i) & (q >= s), F.lit("qid"))
        .when((v >= i) & (v >= s), F.lit("vid"))
        .when(i >= s, F.lit("int"))
        .otherwise(F.lit("str"))
    )
    return prof.select(
        "pred",
        "n_triples",
        "n_qid",
        "n_vid",
        "n_int",
        "n_str",
        majority.alias("majority_type"),
        F.round(best / F.col("n_triples").cast("double"), 6).alias(
            "majority_share"
        ),
    )


VT_CHECKPOINTS = 4


def violation_trend(
    state: DataFrame, max_rev: int, n_checkpoints: int = VT_CHECKPOINTS
) -> DataFrame:
    """Multi-snapshot violation trend from ONE interval scan — the
    history-index showcase: the multi-value (single-value-violation)
    count at ``n_checkpoints`` evenly spaced revisions, computed
    WITHOUT replaying history or scanning once per snapshot: each
    validity interval emits the checkpoints it covers in-array, then
    one (checkpoint, subj, pred) aggregate.  Output: (checkpoint,
    rev, n_violating_pairs) — the curve a maintenance dashboard
    plots.

    Scale shape: row volume <= state x n_checkpoints (a constant),
    one distinct count per (checkpoint, subj, pred), one
    constant-sized final aggregate."""
    cps = [(q, max_rev * q // (n_checkpoints + 1)) for q in range(1, n_checkpoints + 1)]
    cp_arr = F.array(
        *[
            F.when(
                (F.col("from_rev") <= F.lit(rev)) & (F.col("to_rev") > F.lit(rev)),
                F.struct(F.lit(q).alias("checkpoint"), F.lit(rev).alias("rev")),
            )
            for q, rev in cps
        ]
    )
    hits = (
        state.select(
            "subj", "pred", "obj",
            F.explode(F.filter(cp_arr, lambda x: x.isNotNull())).alias("cp"),
        )
        .select("subj", "pred", "obj", F.col("cp.checkpoint").alias("checkpoint"), F.col("cp.rev").alias("rev"))
    )
    pairs = (
        hits.groupBy("checkpoint", "rev", "subj", "pred")
        .agg(F.countDistinct("obj").alias("n_objs"))
        .filter(F.col("n_objs") >= 2)
    )
    return pairs.groupBy("checkpoint", "rev").agg(
        F.count(F.lit(1)).alias("n_violating_pairs")
    )


BURST_Z_THRESHOLD = 2


def edit_bursts(edits: DataFrame, bucket: int = EDIT_ACTIVITY_BUCKET) -> DataFrame:
    """Burst detection over the revision stream (the z-score half of
    Kleinberg 2002's burst model, the form ops dashboards actually
    run): bucket the stream into ``bucket``-revision windows and flag
    windows whose edit count sits more than BURST_Z_THRESHOLD
    standard deviations ABOVE the mean bucket rate — the vandalism /
    bot-import alarm upstream of the game queue.  Output: (bucket_id,
    n_edits, zscore, is_burst), zscore rounded to 6.

    The burst decision is made in PURE INTEGERS:
    (n*k - S1)^2 > z^2 * (k*S2 - S1^2) and n*k > S1 with k = number
    of buckets, S1/S2 the BIGINT count sums — both engines decide
    identically; the published zscore is one sqrt+division of the
    same exact integers.

    Scale shape: one bucket aggregate (map-side combinable), one
    single-row totals broadcast, one map-side flag."""
    b = edits.groupBy(
        F.expr(f"rev_id div {bucket}").alias("bucket_id")
    ).agg(F.count(F.lit(1)).alias("n_edits"))
    tot = b.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_edits").alias("s1"),
        F.sum(F.col("n_edits") * F.col("n_edits")).alias("s2"),
    )
    num = F.col("n_edits") * F.col("k") - F.col("s1")
    den2 = F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")
    z2 = BURST_Z_THRESHOLD * BURST_Z_THRESHOLD
    return (
        b.crossJoin(F.broadcast(tot))  # single-row totals frame
        .select(
            "bucket_id",
            "n_edits",
            F.when(
                den2 > 0,
                # z = (n - S1/k) / (sqrt(den2)/k) = num / sqrt(den2)
                F.round(num.cast("double") / F.sqrt(den2.cast("double")), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("zscore"),
            ((num > 0) & (num * num > F.lit(z2) * den2)).alias("is_burst"),
        )
    )


def labeler_agreement(labels: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two boolean labeling functions — the
    agreement statistic a weak-supervision stack reports before
    trusting an ensemble (two labelers that agree no better than
    chance add no signal).  One row: (n, n_both, n_only_a, n_only_b,
    n_neither, kappa) with kappa rounded to 6 (0.0 when pe = 1, the
    degenerate all-same-label case).

    All four cells are exact BIGINT counts; kappa is computed from
    them in one double expression — identical on both engines.

    Scale shape: ONE map-side-combined aggregate."""
    a, bcol = F.col(col_a), F.col(col_b)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((a & bcol).cast("int")).cast("bigint").alias("n_both"),
        F.sum((a & ~bcol).cast("int")).cast("bigint").alias("n_only_a"),
        F.sum((~a & bcol).cast("int")).cast("bigint").alias("n_only_b"),
        F.sum((~a & ~bcol).cast("int")).cast("bigint").alias("n_neither"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n_both") + F.col("n_neither")) / n
    pa1 = (F.col("n_both") + F.col("n_only_a")) / n
    pb1 = (F.col("n_both") + F.col("n_only_b")) / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    return agg.select(
        "n",
        "n_both",
        "n_only_a",
        "n_only_b",
        "n_neither",
        F.when(pe != 1.0, F.round((po - pe) / (1 - pe), 6))
        .otherwise(F.lit(0.0))
        .alias("kappa"),
    )


KGQA_2HOP_CAP = 100_000  # skip predicate pairs whose exact path count
# exceeds this — the cardinality gate that keeps 2-hop enumeration
# linear-ish at corpus scale


def kgqa_pairs(cur: DataFrame, two_hop_cap: int = KGQA_2HOP_CAP) -> DataFrame:
    """KG-to-QA training-pair generation (the synthetic-QA bridge
    next to ``kg_linearize``'s KELM verbalization): every current
    triple yields a 1-hop pair ("what is P of S?" -> O), and 2-hop
    COMPOSITIONAL pairs ("what is P2 of the P1 of S?" -> O2) are
    enumerated ONLY for predicate pairs whose exact join cardinality
    (from ``join_cardinality_stats``'s count-product identity) stays
    under ``two_hop_cap`` — the statistics-gated enumeration that
    keeps the quadratic-looking stage linear by construction: the
    gate itself costs two entity-keyed counts, never a pair
    expansion.  Output: (question, answer, hops).

    Scale shape: 1-hop is a map pass; the 2-hop stage first computes
    the per-(pred_a, pred_b) path counts WITHOUT enumeration, then
    materializes only the gated pairs through one entity-keyed
    equi-join (volume = the gated path counts, known in advance)."""
    one = cur.select(
        F.concat(
            F.lit("what is "), "pred", F.lit(" of "), "subj", F.lit("?")
        ).alias("question"),
        F.col("obj").alias("answer"),
        F.lit(1).alias("hops"),
    )
    stats = join_cardinality_stats(cur).filter(
        F.col("n_paths") <= two_hop_cap
    )
    left = cur.select(
        F.col("subj").alias("s0"), F.col("pred").alias("pred_a"), F.col("obj").alias("x")
    )
    right = cur.select(
        F.col("subj").alias("x"), F.col("pred").alias("pred_b"), F.col("obj").alias("o2")
    )
    two = (
        left.join(right, "x")
        .join(F.broadcast(stats.select("pred_a", "pred_b")), ["pred_a", "pred_b"], "left_semi")
        .select(
            F.concat(
                F.lit("what is "), "pred_b", F.lit(" of the "), "pred_a",
                F.lit(" of "), "s0", F.lit("?"),
            ).alias("question"),
            F.col("o2").alias("answer"),
            F.lit(2).alias("hops"),
        )
    )
    return one.unionByName(two).distinct()


def class_balance_plan(labels: DataFrame, label_col: str = "topic") -> DataFrame:
    """Class-balanced sampling plan: given per-document class labels,
    the per-class keep-rate that downsamples every class to the size
    of the SMALLEST class (the uniform-mixture plan a curation run
    feeds into hash-threshold sampling).  Output: (label, n_docs,
    keep_per_1000) where keep_per_1000 = floor(1000 * min_class /
    n_docs) — integer arithmetic, identical on both engines.

    Scale shape: one label-keyed count + one single-row min
    broadcast."""
    counts = labels.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    mn = counts.agg(F.min("n_docs").alias("min_class"))
    return counts.crossJoin(F.broadcast(mn)).select(  # single-row totals
        "label",
        "n_docs",
        F.expr("(1000 * min_class) DIV n_docs").alias("keep_per_1000"),
    )


# integer-percent overlap threshold for flagging a predicate pair as
# inverse (or a predicate as symmetric): the reversed-pair overlap
# must cover >= PCT% of BOTH predicates' distinct pair sets
INV_CANDIDATE_PCT = 50

# per-middle-node wedge budget for transitive-support enumeration: a
# (pred, middle) cell whose exact wedge count (in_deg * out_deg, a
# count product — never enumerated) exceeds the cap is skipped and
# reported in n_wedges_skipped instead of enumerated (the same
# statistics-gated expansion as kgqa_pairs' 2-hop gate)
TRANS_WEDGE_CAP = 100_000


def property_axioms(cur: DataFrame) -> DataFrame:
    """PARIS-style inverse/symmetric property alignment over the
    current triple set ``cur(subj, pred, obj)`` -> one row per
    ordered predicate pair (pred_a, pred_b) with a nonzero
    reversed-pair overlap: (pred_a, pred_b, n_a, n_b, n_overlap,
    score_a, score_b, inverse_candidate, symmetric).

    n_overlap counts distinct (s, o) pairs of pred_a whose reversal
    (o, s) is asserted under pred_b; score_a = n_overlap / n_a is the
    PARIS alignment confidence that pred_a is a subproperty of
    pred_b^-1 (Suchanek et al., VLDB 2012), score_b likewise.  The
    diagonal (pred_a = pred_b) is the symmetry profile: score = the
    fraction of pairs asserted in both directions.  The candidate
    flag compares in pure integers (n_overlap * 100 >= PCT * n) on
    BOTH sides, so both engines decide identically.

    Scale shape: pair sets deduped once, then ONE edge-keyed
    equi-join ((subj, obj) against the reversed key) — per edge key
    the match multiplicity is bounded by the PREDICATE VOCABULARY
    (the dedup collapsed same-pred repeats), so the join output is at
    most |pairs| * |preds| and the final aggregate is
    predicate^2-sized.  Upstream of any constraint table this is how
    inverse/symmetric constraint CANDIDATES are bootstrapped — cf.
    the reference's hand-curated inverse/symmetric fetch
    (`corhist/.../ConstraintsListUpdater`)."""
    t = cur.select("subj", "pred", "obj").distinct()
    n = t.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    a = t.select(
        F.col("subj").alias("a_subj"),
        F.col("pred").alias("pred_a"),
        F.col("obj").alias("a_obj"),
    )
    b = t.select(
        F.col("subj").alias("b_subj"),
        F.col("pred").alias("pred_b"),
        F.col("obj").alias("b_obj"),
    )
    ov = (
        a.join(b, (F.col("a_subj") == F.col("b_obj")) & (F.col("a_obj") == F.col("b_subj")))
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    na = n.select(F.col("pred").alias("pred_a"), F.col("n_pairs").alias("n_a"))
    nb = n.select(F.col("pred").alias("pred_b"), F.col("n_pairs").alias("n_b"))
    return (
        ov.join(F.broadcast(na), "pred_a")  # predicate-vocabulary-sized
        .join(F.broadcast(nb), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_a",
            "n_b",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_a").cast("double"), 6).alias("score_a"),
            F.round(F.col("n_overlap") / F.col("n_b").cast("double"), 6).alias("score_b"),
            (
                (F.col("n_overlap") * 100 >= F.lit(INV_CANDIDATE_PCT) * F.col("n_a"))
                & (F.col("n_overlap") * 100 >= F.lit(INV_CANDIDATE_PCT) * F.col("n_b"))
            ).alias("inverse_candidate"),
            (F.col("pred_a") == F.col("pred_b")).alias("symmetric"),
        )
    )


def transitive_support(
    cur: DataFrame, wedge_cap: int = TRANS_WEDGE_CAP
) -> DataFrame:
    """Transitivity profile per predicate: the fraction of 2-paths
    s -P-> m -P-> o that are closed by a direct s -P-> o triple ->
    (pred, n_wedges, n_closed, closed_ratio, n_wedges_skipped,
    transitive_candidate).  The rule-mining statistic behind OWL
    TransitiveProperty suggestion (AMIE-style closed-path confidence,
    Galárraga et al., WWW 2013).

    Wedges are enumerated ONLY through (pred, middle) cells whose
    exact wedge count (in_deg * out_deg — a count product on the
    degree profile, never an enumeration) is within ``wedge_cap``;
    hub middles beyond the cap are reported in n_wedges_skipped (the
    kgqa_pairs gate pattern), so the plan survives power-law hubs
    (P31 -> Q5 at Wikidata scale) instead of squaring on them.  The
    candidate flag compares in integers over the ENUMERATED portion
    and additionally requires nothing was skipped.

    Scale shape: degree profile = two (pred, node)-keyed counts; the
    wedge join is (pred, middle)-keyed with per-cell output bounded
    by the cap; closure check is one edge-keyed left join against the
    deduped triple set (multiplicity <= 1)."""
    t = cur.select("subj", "pred", "obj").distinct()
    inc = t.groupBy("pred", F.col("obj").alias("mid")).agg(
        F.count(F.lit(1)).alias("n_in")
    )
    outt = t.groupBy("pred", F.col("subj").alias("mid")).agg(
        F.count(F.lit(1)).alias("n_out")
    )
    cells = inc.join(outt, ["pred", "mid"]).select(
        "pred", "mid", (F.col("n_in") * F.col("n_out")).alias("n_cell_wedges")
    )
    gate = cells.filter(F.col("n_cell_wedges") <= F.lit(wedge_cap)).select("pred", "mid")
    skipped = (
        cells.filter(F.col("n_cell_wedges") > F.lit(wedge_cap))
        .groupBy("pred")
        .agg(F.sum("n_cell_wedges").cast("bigint").alias("n_wedges_skipped"))
    )
    left = t.select(
        F.col("subj").alias("w_subj"), "pred", F.col("obj").alias("mid")
    ).join(gate, ["pred", "mid"])
    right = t.select("pred", F.col("subj").alias("mid"), F.col("obj").alias("w_obj"))
    wedges = left.join(right, ["pred", "mid"])
    closed = wedges.join(
        t.select(
            F.col("subj").alias("w_subj"),
            "pred",
            F.col("obj").alias("w_obj"),
            F.lit(1).alias("is_closed"),
        ),
        ["w_subj", "pred", "w_obj"],
        "left",
    )
    prof = closed.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.sum(F.coalesce(F.col("is_closed"), F.lit(0))).cast("bigint").alias("n_closed"),
    )
    # full outer: a predicate whose EVERY wedge cell is gated out still
    # appears (n_wedges = 0, ratio NULL, skipped count carried)
    return (
        prof.join(skipped, "pred", "full")  # predicate-vocabulary-sized
        .select(
            "pred",
            F.coalesce(F.col("n_wedges"), F.lit(0)).cast("bigint").alias("n_wedges"),
            F.coalesce(F.col("n_closed"), F.lit(0)).cast("bigint").alias("n_closed"),
            F.when(
                F.coalesce(F.col("n_wedges"), F.lit(0)) > 0,
                F.round(F.col("n_closed") / F.col("n_wedges").cast("double"), 6),
            ).alias("closed_ratio"),
            F.coalesce(F.col("n_wedges_skipped"), F.lit(0)).cast("bigint").alias(
                "n_wedges_skipped"
            ),
            (
                (F.coalesce(F.col("n_wedges"), F.lit(0)) > 0)
                & (
                    F.coalesce(F.col("n_closed"), F.lit(0)) * 100
                    >= F.lit(INV_CANDIDATE_PCT) * F.coalesce(F.col("n_wedges"), F.lit(0))
                )
                & (F.coalesce(F.col("n_wedges_skipped"), F.lit(0)) == 0)
            ).alias("transitive_candidate"),
        )
    )


# SDType holdout slice: entities with numeric id % MOD == RES have
# their types hidden and re-inferred (the eval harness for the
# type-inference op; a real KG applies it to genuinely untyped
# entities)
SDTYPE_HOLDOUT_MOD = 10
SDTYPE_HOLDOUT_RES = 3


def sdtype_assign(cur: DataFrame, types: DataFrame, heldout: DataFrame) -> DataFrame:
    """SDType-style type inference (Paulheim & Bizer, ISWC 2013) with
    a holdout evaluation: predicates vote for an entity's class with
    their subject-type distribution learned from the TYPED portion ->
    (entity, predicted_cls, actual_cls, score_ppm, correct).

    The per-(pred, cls) weight is the integer permille-of-a-million
    share floor(1e6 * n_pc / n_p), so an entity's score is a SUM OF
    INTEGERS — exact under any order — and the argmax (score DESC,
    cls ASC) is engine-independent.  ``heldout(entity)`` names the
    entities whose types are hidden from training and then predicted;
    ``types(entity, cls)`` is the ground truth for both sides.

    Scale shape: the distribution table is (predicates x classes) —
    broadcast; training is one (pred, cls)-keyed count over typed
    subject incidences; inference is one broadcast join + one
    entity-keyed aggregate + one per-entity argmax reduction."""
    ho = heldout.select(F.col("entity").alias("subj"))
    train = (
        cur.join(ho, "subj", "left_anti")
        .join(types.select(F.col("entity").alias("subj"), "cls"), "subj")
        .select("pred", "cls")
    )
    dcnt = train.groupBy("pred", "cls").agg(F.count(F.lit(1)).alias("n_pc"))
    dtot = dcnt.groupBy("pred").agg(F.sum("n_pc").alias("n_p"))
    dist = dcnt.join(dtot, "pred").select(
        "pred", "cls", F.expr("(1000000 * n_pc) DIV n_p").alias("ppm")
    )
    inc = cur.join(ho, "subj", "left_semi").select("subj", "pred").distinct()
    scores = (
        inc.join(F.broadcast(dist), "pred")  # (preds x classes)-sized
        .groupBy("subj", "cls")
        .agg(F.sum("ppm").cast("bigint").alias("score_ppm"))
    )
    # per-entity argmax as a MIN over struct(-score_ppm, cls): integer
    # negation flips the BIGINT sum's order exactly (no float -0/NaN
    # cases), so the pick equals the old window's (score_ppm DESC,
    # cls ASC) row — map-side combinable instead of a sort window
    pred = (
        scores.groupBy("subj")
        .agg(F.min(F.struct((-F.col("score_ppm")).alias("neg"), "cls")).alias("_best"))
        .select(
            F.col("subj").alias("entity"),
            F.col("_best.cls").alias("predicted_cls"),
            (-F.col("_best.neg")).cast("bigint").alias("score_ppm"),
        )
    )
    return pred.join(
        types.select(F.col("entity"), F.col("cls").alias("actual_cls")), "entity"
    ).select(
        "entity",
        "predicted_cls",
        "actual_cls",
        "score_ppm",
        (F.col("predicted_cls") == F.col("actual_cls")).alias("correct"),
    )


# AMIE-style implication rules: minimum absolute support and the
# integer-compared PCA-confidence gate for the candidate flag
AMIE_MIN_SUPPORT = 10
AMIE_CANDIDATE_PCT = 60


def amie_implications(cur: DataFrame) -> DataFrame:
    """AMIE-style same-direction implication rules p_body(x, y) =>
    p_head(x, y) over the current triple set ``cur(subj, pred, obj)``
    — one row per ordered predicate pair with nonzero support:
    (body_pred, head_pred, n_body, n_head, n_pca_body, n_support,
    head_coverage, std_conf, pca_conf, rule_candidate).

    The distinctive AMIE contribution (Galarraga et al., WWW 2013) is
    the PCA denominator: under the partial-completeness assumption a
    body pair (x, y) only counts AGAINST the rule when x is known to
    have at least one head_pred edge (to anything) — missing facts
    about x are "unknown", not counterexamples — so
    pca_conf = support / #{(x, y) in body : exists z head_pred(x, z)}
    sits between std_conf (closed-world) and 1.  This is the
    same-direction half of the axiom space next to property_axioms'
    reversed-pair (inverse/symmetric) half, and the rule shape the
    reference's correction miner instantiates per-edit
    (`corhist/.../SimpleCorrectionsHistoryMiner`) profiled here
    corpus-wide over the materialized KG instead.

    The candidate flag compares in pure integers
    (n_support * 100 >= PCT * n_pca_body AND n_support >= MIN_SUPPORT)
    so both engines decide identically.

    Scale shape: triples deduped once; support comes from ONE
    (subj, obj)-keyed equi-join of the pair set against itself and
    the PCA denominator from ONE subj-keyed equi-join against the
    deduped (pred, subj) table — per key the match multiplicity is
    bounded by the PREDICATE VOCABULARY (both sides deduped), so join
    output is at most |pairs| * |preds| and every aggregate is
    map-side combinable down to a predicate^2-sized result."""
    t = cur.select("subj", "pred", "obj").distinct().localCheckpoint()
    n = t.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    # support: same (subj, obj) asserted under both predicates
    sup = (
        t.alias("a")
        .join(
            t.select(
                F.col("subj").alias("subj"),
                F.col("pred").alias("head_pred"),
                F.col("obj").alias("obj"),
            ).alias("b"),
            ["subj", "obj"],
        )
        .filter(F.col("a.pred") != F.col("head_pred"))
        .groupBy(F.col("a.pred").alias("body_pred"), "head_pred")
        .agg(F.count(F.lit(1)).alias("n_support"))
    )
    # PCA denominator: body pairs whose subject has ANY head_pred edge
    head_subj = t.select(F.col("pred").alias("head_pred"), "subj").distinct()
    pca = (
        t.join(head_subj, "subj")
        .filter(F.col("pred") != F.col("head_pred"))
        .groupBy(F.col("pred").alias("body_pred"), "head_pred")
        .agg(F.count(F.lit(1)).alias("n_pca_body"))
    )
    nb = n.select(F.col("pred").alias("body_pred"), F.col("n_pairs").alias("n_body"))
    nh = n.select(F.col("pred").alias("head_pred"), F.col("n_pairs").alias("n_head"))
    return (
        sup.join(pca, ["body_pred", "head_pred"])  # predicate^2-sized
        .join(F.broadcast(nb), "body_pred")
        .join(F.broadcast(nh), "head_pred")
        .select(
            "body_pred",
            "head_pred",
            "n_body",
            "n_head",
            "n_pca_body",
            "n_support",
            F.round(F.col("n_support") / F.col("n_head").cast("double"), 6).alias(
                "head_coverage"
            ),
            F.round(F.col("n_support") / F.col("n_body").cast("double"), 6).alias(
                "std_conf"
            ),
            F.round(F.col("n_support") / F.col("n_pca_body").cast("double"), 6).alias(
                "pca_conf"
            ),
            (
                (F.col("n_support") * 100 >= F.lit(AMIE_CANDIDATE_PCT) * F.col("n_pca_body"))
                & (F.col("n_support") >= F.lit(AMIE_MIN_SUPPORT))
            ).alias("rule_candidate"),
        )
    )


# PRA (path-ranking) settings: the target predicate whose links the
# path features rank, and the join-cardinality gate that bounds which
# length-2 path types are ever enumerated
PRA_TARGET_PRED = "P0"
PRA_PATH_CAP = 1_000_000


def pra_path_features(
    cur: DataFrame,
    target: str = PRA_TARGET_PRED,
    path_cap: int = PRA_PATH_CAP,
) -> DataFrame:
    """PRA path-type feature statistics (Lao & Cohen 2010, "Relational
    retrieval using a combination of path-constrained random walks"):
    for the ``target`` predicate, every length-1 path type (another
    predicate connecting the same pair) and every GATED length-2 path
    type (pred_a/pred_b composed through a mid entity) is scored by
    how well the pairs it connects predict a direct ``target`` edge —
    the feature-selection statistics a PRA/SFE link-prediction
    trainer computes before fitting per-path weights.  Output one row
    per path type: (path, hops, n_pairs, n_hits, prec_ppm, rec_ppm)
    where n_pairs = distinct (subj, obj) the path connects, n_hits =
    those also linked by ``target``, prec_ppm/rec_ppm integer-ppm
    precision/recall against the positive pair set.

    Scale shape: triples deduped once; length-1 features are one
    pred-keyed aggregate.  Length-2 path types pass through the
    ``join_cardinality_stats`` gate FIRST (exact composed-path counts
    from two entity-keyed counts — never an enumeration), so the one
    mid-entity equi-join only materializes path types whose instance
    count is known <= ``path_cap``; hub blowups are excluded by the
    gate, not discovered by OOM.  The positive pair set rides a
    (subj, obj)-keyed left join; all aggregates map-side combinable,
    result is path-vocabulary sized."""
    t = cur.select("subj", "pred", "obj").distinct().localCheckpoint()
    pos = t.filter(F.col("pred") == target).select("subj", "obj").distinct()
    npos = pos.agg(
        F.greatest(F.count(F.lit(1)), F.lit(1)).cast("bigint").alias("n_pos")
    )  # single-row broadcast frame (the predicate_value_drift pattern)
    one = t.filter(F.col("pred") != target).select(
        F.col("pred").alias("path"), F.lit(1).alias("hops"), "subj", "obj"
    )
    gate = join_cardinality_stats(t).filter(F.col("n_paths") <= path_cap)
    left = t.select(
        F.col("subj").alias("s0"), F.col("pred").alias("pred_a"), F.col("obj").alias("x")
    )
    right = t.select(
        F.col("subj").alias("x"), F.col("pred").alias("pred_b"), F.col("obj").alias("o2")
    )
    two = (
        left.join(right, "x")
        .join(
            F.broadcast(gate.select("pred_a", "pred_b")),
            ["pred_a", "pred_b"],
            "left_semi",
        )
        .select(
            F.concat("pred_a", F.lit("/"), "pred_b").alias("path"),
            F.lit(2).alias("hops"),
            F.col("s0").alias("subj"),
            F.col("o2").alias("obj"),
        )
    )
    feats = one.unionByName(two).distinct()
    lab = feats.join(
        pos.withColumn("is_pos", F.lit(1)), ["subj", "obj"], "left"
    )
    agg = lab.groupBy("path", "hops").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.coalesce(F.col("is_pos"), F.lit(0))).cast("bigint").alias("n_hits"),
        F.expr(
            "(1000000 * CAST(sum(coalesce(is_pos, 0)) AS BIGINT)) DIV count(1)"
        ).alias("prec_ppm"),
    )
    return agg.crossJoin(F.broadcast(npos)).select(
        "path",
        "hops",
        "n_pairs",
        "n_hits",
        "prec_ppm",
        F.expr("(1000000 * n_hits) DIV n_pos").alias("rec_ppm"),
    )


def cardinality_qerror(cur: DataFrame) -> DataFrame:
    """Cardinality-estimation quality audit (q-error, Moerkotte et
    al. VLDB 2009) of the uniform-independence join estimate against
    the EXACT composed-path counts: for every ordered predicate pair,
    est_paths = n(pred_a) * n(pred_b) DIV n_entities (each pred_a
    edge's object matches n(pred_b)/|V| out-edges under independence)
    vs the true n_paths from ``join_cardinality_stats``; q_error_ppm
    = 1e6 * max(est/actual, actual/est) in exact integer
    cross-division, plus the direction flag.  This is the
    optimizer-statistics self-audit a 100-TB engine runs to know
    WHERE the independence assumption lies about its own data (and
    why the kgqa/PRA stages gate on exact counts instead).

    Scale shape: predicate-keyed counts + one distinct-entity count
    (single-row broadcast) + the count-product identity of
    join_cardinality_stats — never a path enumeration; output is
    predicate-vocabulary squared."""
    t = cur.select("subj", "pred", "obj").distinct().localCheckpoint()
    n = t.groupBy("pred").agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    ents = (
        t.select(F.col("subj").alias("v"))
        .unionAll(t.select(F.col("obj").alias("v")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ent"))
    )
    actual = join_cardinality_stats(t).select(
        "pred_a", "pred_b", F.col("n_paths").cast("bigint").alias("n_paths")
    )
    na = n.select(F.col("pred").alias("pred_a"), F.col("n_edges").alias("n_a"))
    nb = n.select(F.col("pred").alias("pred_b"), F.col("n_edges").alias("n_b"))
    est = (
        na.crossJoin(nb)
        .crossJoin(F.broadcast(ents))  # single-row totals frame
        .select(
            "pred_a",
            "pred_b",
            "n_a",
            "n_b",
            "n_ent",
            F.expr("(n_a * n_b) DIV n_ent").alias("est_paths"),
        )
    )
    return (
        est.join(actual, ["pred_a", "pred_b"], "left")
        .withColumn("n_paths", F.coalesce(F.col("n_paths"), F.lit(0)).cast("bigint"))
        .select(
            "pred_a",
            "pred_b",
            "n_a",
            "n_b",
            "n_ent",
            "est_paths",
            "n_paths",
            F.expr(
                "CASE WHEN est_paths > 0 AND n_paths > 0 THEN "
                "greatest((1000000 * est_paths) DIV n_paths, "
                "(1000000 * n_paths) DIV est_paths) END"
            ).alias("q_error_ppm"),
            (F.col("est_paths") < F.col("n_paths")).alias("underestimated"),
        )
    )


# Dawid-Skene smoothing clamp: per-labeler conditional vote rates in
# per-mille, clamped to [1, 999] so no pattern gets a zero-probability
# veto (the add-one convention, exact integers)
DS_CLAMP_LO = 1
DS_CLAMP_HI = 999


def dawid_skene_step(votes: DataFrame, labelers: tuple = ("lang_ok", "len_ok", "rep_ok")) -> DataFrame:
    """One Dawid-Skene EM step (Dawid & Skene 1979 — the classic
    label-model upgrade over majority vote) on the weak-labeling
    ensemble: (1) truth <- majority vote, (2) per labeler the
    conditional vote rates P(vote|truth) in clamped per-mille,
    (3) re-vote each pattern by the EXACT integer product
    prior_pm * prod_l cond_pm — naive-Bayes posteriors compared by
    cross-multiplication, never a float or a log.  Output one row per
    vote pattern: (lang_ok, len_ok, rep_ok, n_docs, majority_label,
    score1, score0, corrected_label, flipped) — flipped patterns are
    where the label model disagrees with majority vote, the exact
    artifact an annotation pipeline reviews.

    Scale shape: ONE pattern aggregate over the vote stream
    (map-side combinable to 2^|labelers| rows); every subsequent step
    is arithmetic on that 8-row frame with single-row broadcast
    totals.  Products are bounded by 1000^(|labelers|+1) — BIGINT-safe
    at any corpus size."""
    n_l = len(labelers)
    pat = votes.groupBy(*labelers).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    maj = pat.withColumn(
        "majority_label",
        (
            sum(F.col(c).cast("int") for c in labelers) * 2 >= F.lit(n_l)
        ).cast("int"),
    ).localCheckpoint()  # 2^n_l rows
    tot = maj.groupBy().agg(
        F.sum(F.when(F.col("majority_label") == 1, F.col("n_docs")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("majority_label") == 0, F.col("n_docs")).otherwise(0))
        .cast("bigint")
        .alias("n0"),
    )
    clamp = f"least({DS_CLAMP_HI}, greatest({DS_CLAMP_LO}, {{e}}))"
    conds = maj.crossJoin(F.broadcast(tot)).groupBy().agg(
        *[
            F.expr(
                clamp.format(
                    e=f"(1000 * sum(CASE WHEN majority_label = 1 AND {c}"
                    f" THEN n_docs ELSE 0 END)) DIV min(n1)"
                )
            )
            .cast("bigint")
            .alias(f"p1_{c}")
            for c in labelers
        ]
        + [
            F.expr(
                clamp.format(
                    e=f"(1000 * sum(CASE WHEN majority_label = 0 AND {c}"
                    f" THEN n_docs ELSE 0 END)) DIV min(n0)"
                )
            )
            .cast("bigint")
            .alias(f"p0_{c}")
            for c in labelers
        ]
        + [
            F.expr(clamp.format(e="(1000 * min(n1)) DIV (min(n1) + min(n0))"))
            .cast("bigint")
            .alias("prior1_pm"),
        ]
    )
    s1 = " * ".join(
        [f"CASE WHEN {c} THEN p1_{c} ELSE 1000 - p1_{c} END" for c in labelers]
        + ["prior1_pm"]
    )
    s0 = " * ".join(
        [f"CASE WHEN {c} THEN p0_{c} ELSE 1000 - p0_{c} END" for c in labelers]
        + ["(1000 - prior1_pm)"]
    )
    return (
        maj.crossJoin(F.broadcast(conds))  # single-row conditionals
        .select(
            *labelers,
            "n_docs",
            "majority_label",
            F.expr(s1).cast("bigint").alias("score1"),
            F.expr(s0).cast("bigint").alias("score0"),
        )
        .withColumn(
            "corrected_label",
            (F.col("score1") >= F.col("score0")).cast("int"),
        )
        .withColumn(
            "flipped", F.col("corrected_label") != F.col("majority_label")
        )
    )
