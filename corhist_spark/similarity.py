"""Approximate-nearest-neighbor search over an embedding column
(array<float>).

- Brute-force cosine top-k: the correctness baseline.  Dot products run
  as sequential `F.aggregate` folds over zipped arrays (JVM-side,
  deterministic summation order — matters for cross-engine equality).
- LSH-bucketed variant: sign-of-projection onto deterministic
  pseudo-random hyperplanes buckets the vectors; candidates only search
  within their bucket.  This is the scale path — the cross join becomes
  a bucket-keyed equi-join (at 1000 executors the brute-force cross
  join is quadratic and infeasible; the bucket join is linear in bucket
  occupancy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(embeddings: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return embeddings.select(
        "vec_id", v.alias("v")
    ).withColumn("nrm", _norm(F.col("v")))


MAX_BRUTEFORCE_QUERIES = 1024


def knn_bruteforce(
    embeddings: DataFrame, k: int = 3, n_queries: int = 10, round_to: int = 3
) -> DataFrame:
    """Top-k cosine neighbors for vec_id < n_queries (self excluded).
    Ranking uses the ROUNDED similarity plus neighbor id as tiebreak so
    results are reproducible across engines.

    This is the CORRECTNESS BASELINE, not the scale path: the plan is
    (n_queries x corpus), linear only while the query side is small —
    a caller passing n_queries ~ |corpus| would build a true N^2
    cartesian, so the query count is hard-capped; use knn_lsh for
    corpus-scale search."""
    if n_queries > MAX_BRUTEFORCE_QUERIES:
        raise ValueError(
            f"knn_bruteforce is the small-query-side baseline (n_queries <= "
            f"{MAX_BRUTEFORCE_QUERIES}); use knn_lsh for corpus-scale ANN"
        )
    e = with_norm(embeddings)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    d = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("dv"), F.col("nrm").alias("dn"))
    sims = (
        q.crossJoin(d)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn")), round_to).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def lsh_buckets(embeddings: DataFrame, n_planes: int = 4) -> DataFrame:
    """Deterministic hyperplane LSH: plane j has components
    h_j[i] = +1 if ((i*7 + j*13) % 23) % 2 == 0 else -1; the bucket is
    the n_planes-bit string of projection signs.  The mod-23 mixing
    makes every plane distinct (a plain parity of i+j would collapse
    planes two apart onto each other, quartering the bucket count).

    Components are quantized to integers (floor(x*1000)) before the
    fold so the projection is exact integer arithmetic — the sign is
    then reproducible across engines regardless of float summation
    order (the DuckDB oracle mirrors this bit-for-bit)."""
    e = with_norm(embeddings)
    q = F.transform(F.col("v"), lambda x: F.floor(x * 1000).cast("long"))
    bits = []
    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                q,
                F.transform(
                    F.sequence(F.lit(0), F.size("v") - 1),
                    lambda i: F.when(((i * 7 + j * 13) % 23) % 2 == 0, F.lit(1))
                    .otherwise(F.lit(-1))
                    .cast("long"),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return e.withColumn("bucket", F.concat(*bits))


MAX_EMB_BUCKET = 64


def planes_for_corpus(n_vectors: int, floor: int = 8) -> int:
    """Corpus-scaled hyperplane count: ceil(log2(N)) with a floor.

    At a FIXED plane count the expected bucket occupancy grows linearly
    with the corpus (N / 2^planes), so the in-bucket self-join is
    O(N^2 / 2^planes) — quadratic at 100x scale.  log2-scaling keeps
    expected occupancy ~constant (2^ceil(log2 N) >= N buckets), so the
    candidate volume stays linear in N.  Both engines compute the same
    integer (exact integer ceil of log2), so the oracle mirrors it."""
    import math

    return max(floor, math.ceil(math.log2(max(int(n_vectors), 2))))


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.25,
    n_planes: int | None = None,
    max_bucket: int = MAX_EMB_BUCKET,
    round_to: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidate generation via
    the deterministic hyperplane buckets, verification = exact rounded
    cosine >= threshold inside the bucket.

    Scale shape (the embedding-side sibling of textops.lsh_candidates,
    with the same two guards):

    - ``n_planes`` defaults to ceil(log2(N)) (planes_for_corpus), so
      bucket count scales with the corpus and expected occupancy stays
      O(1) instead of O(N) — the fixed-256-bucket variant is quadratic
      at 100x scale.
    - buckets above ``max_bucket`` occupancy are dropped BEFORE the
      self-join (a degenerate hot bucket — e.g. the all-zeros region —
      is quadratic in its occupancy on one shuffle key; true near-dups
      of a dropped bucket still collide in no other band here, so the
      cap is a recall-for-boundedness trade the caller sets).  Singleton
      buckets produce no pairs and are filtered by the same sizes join.

    Production near-dup thresholds sit around 0.9-0.99; the default is
    tuned to the synthetic random-embedding testdata so the oracle
    comparison has rows to check."""
    if n_planes is None:
        n_planes = planes_for_corpus(embeddings.count())
    e = lsh_buckets(embeddings, n_planes)
    sizes = e.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bc"))
    ok = sizes.filter((F.col("_bc") >= 2) & (F.col("_bc") <= max_bucket)).select("bucket")
    e = e.join(ok, "bucket", "left_semi")
    a = e.select(
        "bucket", F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = e.select(
        "bucket", F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), round_to).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


# Centroid-table bound: sqrt(N) outgrows executor memory somewhere
# around 10^9-10^10 vectors (10^5 centroids x ~1 KB each broadcast to
# every task).  Above the cap the cell count stops growing (per-cell
# lists get longer instead — the standard IVF capacity trade) and the
# assignment path switches from broadcast to sign-prefix sharding (see
# knn_ivf / MAX_BROADCAST_CENTROIDS).
MAX_IVF_CENTROIDS = 65_536


def cells_for_corpus(
    n_vectors: int, floor: int = 16, cap: int = MAX_IVF_CENTROIDS
) -> int:
    """IVF coarse-cell count: ceil(sqrt(N)) with a floor and a cap —
    the standard IVF sizing (cells ~ sqrt(N) balances assignment cost
    N*cells against per-cell scan cost N/cells * nprobe), bounded so
    the centroid table can never outgrow a broadcast/shard budget."""
    import math

    return min(cap, max(floor, math.ceil(math.sqrt(max(int(n_vectors), 1)))))


def _quantized(col):
    return F.transform(col, lambda x: F.floor(x * 1000).cast("long"))


def _int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _ivf_centroids(e: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic centroid table shared by BOTH assignment paths
    (the 'broadcast path stays bit-exact' guarantee and the DuckDB
    oracles depend on the two paths never desyncing): rank-based
    selection of the ``n_cells`` smallest vec_ids, NOT a
    ``vec_id < n_cells`` filter — ids need not be dense or 0-based
    (sharded id spaces, ids surviving upstream dedup), and a sparse id
    space would silently yield an empty centroid table otherwise."""
    return (
        e.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
    )


def _ivf_scored(embeddings: DataFrame, n_cells: int, centroids: DataFrame | None = None):
    """(vec_id, v, nrm, qv, cid, s) — every vector scored against every
    coarse centroid (integer-quantized dot product, so assignment is
    engine-exact).

    Default centroid choice is deterministic (the first ``n_cells``
    vectors): the oracle must replicate the quantizer bit-for-bit, and
    the scale shape — a small broadcast centroid table
    nested-loop-joined against the corpus, then probe-limited search —
    is identical either way.  Pass ``centroids`` (cid, cv) to score
    against a TRAINED quantizer instead (train_ivf_centroids).  The
    broadcast NLJ against sqrt(N) centroids IS the intended plan (IVF's
    coarse assignment is corpus x centroids by definition)."""
    e = with_norm(embeddings).withColumn("qv", _quantized(F.col("v")))
    cent = _ivf_centroids(e, n_cells) if centroids is None else centroids
    return e.crossJoin(F.broadcast(cent)).withColumn(
        "s", _int_dot(F.col("qv"), F.col("cv"))
    )


# argmax ordering for cell assignment: max score, then MIN centroid id
# (mirrored by the oracle's `ORDER BY s DESC, cid` rank)
def _best_cell_ord():
    return F.struct(F.col("s").alias("s"), (-F.col("cid")).alias("nc"))


IVF_TRAIN_ITERS = 2


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    n_iters: int = IVF_TRAIN_ITERS,
    seed_centroids: DataFrame | None = None,
    assignment: str = "broadcast",
    prefix_planes: int | None = None,
) -> DataFrame:
    """Lloyd-refined coarse quantizer (the k-means|| shape, public):
    seed with the deterministic first-``n_cells`` vectors, then
    ``n_iters`` rounds of assign (max-inner-product, the same
    integer-quantized argmax the search path uses) -> per-cell mean ->
    spherical re-normalization back to the quantized integer scale.
    Returns (cid, cv) to pass into knn_ivf / semantic_dedup.

    Ingest-order centroids are fine on uniform fixtures but degrade
    recall on CLUSTERED real-world embeddings (several seeds land in
    one dense region while sparse regions get none — so nearby queries
    and their true neighbors split across cells).  Training moves
    centroids toward the actual density (pinned by the skewed-fixture
    recall test in tests/test_similarity_guards.py).

    Cross-engine exactness (the DuckDB oracle transcribes the whole
    loop): per-cell component sums are exact longs; the mean, the
    spherical norm (a LEFT Fold over components in index order) and the
    final round() are identical IEEE double sequences in both engines.
    Cells that capture no vectors, or whose mean is the zero vector,
    keep their previous centroid.

    Scale shape: each round is one assignment pass plus a (cell,
    dim)-keyed partial aggregate.  ``assignment="broadcast"`` (the
    bit-exact default the knn_ivf_trained oracle transcribes) scores
    every vector against every centroid — O(N * n_cells) work per
    round, quadratic in N at dedup sizing where n_cells ~ N/occupancy.
    ``assignment="sharded"`` runs each round's assignment through the
    sign-prefix shard join instead (_sharded_scored: same-prefix
    centroids only + the empty-shard min-cid fallback) — per-vector
    work capped at the shard budget, LINEAR in N per round, no
    centroid broadcast; the resulting quantizer is its own
    deterministic algorithm (within-prefix Lloyd), driver-oracled
    end-to-end via semantic_dedup_trained_sharded.  At 100 TB you
    train on a SAMPLE (standard k-means|| practice) and this function
    receives that sample; n_iters is a small constant."""
    if assignment == "sharded" and prefix_planes is None:
        prefix_planes = prefix_planes_for_cells(n_cells)
    e = with_norm(embeddings).withColumn("qv", _quantized(F.col("v")))
    cent = (
        _ivf_centroids(e, n_cells) if seed_centroids is None else seed_centroids
    ).localCheckpoint()
    for _ in range(n_iters):
        if assignment == "sharded":
            scored = _sharded_scored(e, cent, prefix_planes)
        else:
            scored = e.crossJoin(F.broadcast(cent)).withColumn(
                "s", _int_dot(F.col("qv"), F.col("cv"))
            )
        assign = scored.groupBy("vec_id").agg(
            F.max_by("cid", _best_cell_ord()).alias("cell"),
            F.first("qv").alias("qv"),
        )
        sums = (
            assign.select("cell", F.posexplode("qv").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
        )
        upd = (
            sums.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "sx", "cnt"))).alias("cols"))
            .select(
                "cell",
                F.expr("transform(cols, c -> CAST(c.sx AS DOUBLE) / c.cnt)").alias("means"),
            )
            .select(
                "cell",
                "means",
                # left fold in index order — mirrored by the oracle's
                # list_reduce over a 0.0-prepended list
                F.sqrt(
                    F.aggregate(
                        F.col("means"), F.lit(0.0), lambda acc, x: acc + x * x
                    )
                ).alias("nrm"),
            )
            .select(
                "cell",
                F.when(
                    F.col("nrm") > 0,
                    F.expr(
                        "transform(means,"
                        " m -> CAST(round(m * 1000.0 / nrm, 0) AS BIGINT))"
                    ),
                ).alias("new_cv"),
            )
        )
        cent = (
            cent.join(upd, cent["cid"] == upd["cell"], "left")
            .select("cid", F.coalesce("new_cv", "cv").alias("cv"))
            .localCheckpoint()
        )
    return cent


def _prefix_bits(qv_col, n_planes: int):
    """Sign-prefix of the integer-quantized vector — the shard key of
    the sharded IVF assignment.  Plane j has components
    h_j[i] = +1 if ((i*m_j + j*13) % 23) % 2 == 0 else -1 with
    m_j = 7 for j < 2 (identical to lsh_buckets' first two planes —
    the 2-plane driver oracle transcribes exactly these) and
    m_j = 7 + 2*j beyond: the multiplicative term keeps the deeper
    planes DISTINCT as j grows (the additive family repeats sign
    patterns early — e.g. its planes 1/10/15 coincide at dim 8 —
    which would silently collapse shards and break the per-task
    centroid budget).  All 16 planes are distinct at dim >= 16
    (pinned in tests); plane count is capped at PREFIX_MAX_PLANES —
    the family is mod-23 periodic, so more planes stop adding
    shards (see prefix_planes_for_cells)."""
    bits = []
    for j in range(n_planes):
        m = 7 if j < 2 else 7 + 2 * j
        proj = F.aggregate(
            F.zip_with(
                qv_col,
                F.transform(
                    F.sequence(F.lit(0), F.size(qv_col) - 1),
                    # PySpark invokes the lambda immediately while
                    # building the expression, so closing over the
                    # loop's m/j is safe (no late binding)
                    lambda i: F.when(
                        ((i * m + j * 13) % 23) % 2 == 0, F.lit(1)
                    )
                    .otherwise(F.lit(-1))
                    .cast("long"),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _sharded_scored(e: DataFrame, cent0: DataFrame, prefix_planes: int):
    """Core of the sharded assignment over a PREPARED corpus frame
    (vec_id, v, nrm, qv) and an arbitrary (cid, cv) centroid table —
    shared by the ingest-order path (_ivf_scored_sharded) and the
    sharded Lloyd training rounds (train_ivf_centroids)."""
    cent = (
        cent0.withColumn("pfx", _prefix_bits(F.col("cv"), prefix_planes))
        # the point of this path is NOT broadcasting the centroids
        .hint("SHUFFLE_HASH")
    )
    ep = e.withColumn("pfx", _prefix_bits(F.col("qv"), prefix_planes))
    scored = ep.join(cent, "pfx").withColumn(
        "s", _int_dot(F.col("qv"), F.col("cv"))
    )
    fallback = cent0.orderBy("cid").limit(1)
    missing = ep.join(cent.select("pfx").distinct(), "pfx", "left_anti")
    scored_fb = missing.crossJoin(F.broadcast(fallback)).withColumn(
        "s", _int_dot(F.col("qv"), F.col("cv"))
    )
    return scored.unionByName(scored_fb)


def _ivf_scored_sharded(
    embeddings: DataFrame,
    n_cells: int,
    prefix_planes: int,
    centroids: DataFrame | None = None,
):
    """Sharded coarse assignment for centroid tables too big to
    broadcast: corpus vectors and centroids are both keyed by a short
    sign-prefix (2^prefix_planes shards) and scored through a SHUFFLE
    equi-join on the prefix — each task holds only its shard's
    centroids (cells / 2^p of the table) instead of all of them, and
    the corpus shuffles ONCE on the prefix key (linear, no broadcast).
    A vector is assigned to its best centroid WITHIN its own prefix
    shard — the standard locality approximation (recall floor pinned
    in tests/test_similarity_guards.py); the broadcast path stays
    bit-exact and is used whenever the table fits.  Pass ``centroids``
    (cid, cv) to shard-assign against an explicit (e.g. trained)
    table instead of the ingest-order first-``n_cells``.

    Empty-shard fallback: a prefix shard can contain corpus vectors
    but ZERO centroids (e.g. sign-skewed embeddings with ingest-order
    centroid selection) — the bare inner join would then silently DROP
    those vectors from assignment (lost queries/neighbors in knn_ivf,
    lost non-duplicate documents in semantic_dedup).  Such vectors are
    routed to the global min-cid centroid instead (one broadcast row),
    so every vector is always assigned somewhere."""
    e = with_norm(embeddings).withColumn("qv", _quantized(F.col("v")))
    cent0 = (
        _ivf_centroids(e, n_cells).localCheckpoint()
        if centroids is None
        else centroids
    )
    return _sharded_scored(e, cent0, prefix_planes)


# Beyond this many centroids the assignment no longer broadcasts the
# centroid table; it shards by sign-prefix instead (_ivf_scored_sharded).
MAX_BROADCAST_CENTROIDS = 4096


def knn_ivf(
    embeddings: DataFrame,
    k: int = 3,
    n_queries: int = 10,
    n_cells: int | None = None,
    n_probe: int = 2,
    round_to: int = 3,
    max_broadcast_centroids: int = MAX_BROADCAST_CENTROIDS,
    prefix_planes: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: vectors are assigned to their nearest coarse
    centroid (inverted lists); a query searches only its ``n_probe``
    closest cells.  Same output shape as knn_bruteforce.  Pass
    ``centroids`` (cid, cv — e.g. train_ivf_centroids) to search a
    trained quantizer; it rides the broadcast assignment path.

    The scale path alongside knn_lsh: candidate volume per query is
    n_probe * N / n_cells ~ 2*sqrt(N) at the default sizing, and the
    inverted lists are a plain (cell)-keyed table — co-partitioned
    probe/search joins, no all-pairs anywhere.  The corpus-side cell
    assignment is a map-side partial aggregate (max_by over the scored
    rows): the N x n_cells score rows never shuffle — a row_number
    window here would shuffle the whole cross product on vec_id, the
    kind of plan that dies at 10^10 vectors.  Only the tiny query
    subset pays a window (for its n_probe cells).  Measured recall@3
    on the sf0.001 fixture: 0.97 (vs 0.70 multi-probe LSH)."""
    if centroids is not None:
        # explicit centroid table: n_cells/prefix_planes are unused on
        # this path — deriving them would cost a full corpus count()
        scored = _ivf_scored(embeddings, 0, centroids=centroids)
    else:
        if n_cells is None:
            n_cells = cells_for_corpus(embeddings.count())
        if n_cells <= max_broadcast_centroids:
            scored = _ivf_scored(embeddings, n_cells)
        else:
            if prefix_planes is None:
                prefix_planes = prefix_planes_for_cells(n_cells)
            scored = _ivf_scored_sharded(embeddings, n_cells, prefix_planes)
    assign = scored.groupBy("vec_id").agg(
        F.max_by("cid", _best_cell_ord()).alias("cell"),
        F.first("v").alias("dv"),
        F.first("nrm").alias("dn"),
    ).select(F.col("vec_id").alias("neighbor_id"), "dv", "dn", "cell")
    wq = Window.partitionBy("vec_id").orderBy(F.desc("s"), F.asc("cid"))
    probe = (
        scored.filter(F.col("vec_id") < n_queries)
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv2"),
            F.col("nrm").alias("qn"),
            F.col("cid").alias("cell"),
        )
    )
    sims = (
        probe.join(assign, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv2"), F.col("dv")) / (F.col("qn") * F.col("dn")), round_to).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


# cells_for_dedup defaults — exported so the DuckDB oracle derives the
# same literals instead of hardcoding them (a silent desync risk)
DEDUP_OCCUPANCY = 64
DEDUP_FLOOR = 16

# SemDeDup's published operating regime keeps only pairs that are
# near-identical in embedding space; anything much lower over-deletes
# (most non-duplicate pairs in a real corpus exceed cosine 0.25).
SEMDEDUP_DEFAULT_THRESHOLD = 0.9


def cells_for_dedup(
    n_vectors: int, occupancy: int = DEDUP_OCCUPANCY, floor: int = DEDUP_FLOOR
) -> int:
    """Cell count for SEMANTIC DEDUP: N / occupancy, so expected cell
    size stays CONSTANT as the corpus grows.  Unlike search sizing
    (sqrt(N), cells_for_corpus), dedup compares all within-cell pairs —
    constant occupancy keeps total pair volume LINEAR in N
    (N * occupancy / 2); sqrt(N) occupancy would make it N^1.5.  The
    centroid table then grows as N/occupancy — UNCAPPED on purpose (a
    cap would let occupancy grow past the budget and the pair volume go
    quadratic); instead the sharded assignment path scales its shard
    count with the table (prefix_planes_for_cells), keeping the
    per-task centroid share bounded."""
    return max(floor, int(n_vectors) // occupancy)


# Above this many cells the broadcast-exact assignment's O(N * n_cells)
# WORK term dominates the sharded path's extra shuffle even though the
# centroid table still fits a broadcast: at dedup sizing n_cells grows
# as N/occupancy, so broadcast assignment work is quadratic in N.
# Measured at the sf1 tier (20k vectors, 312 cells): broadcast 70.1 s
# vs sharded 15.3 s.  Applies only when the caller does NOT pin
# max_broadcast_centroids — a pinned value keeps the pure size rule so
# the oracle-backed queries hold their transcribed path.
SEMDEDUP_AUTO_SHARD_CELLS = 256


def semdedup_assignment_path(
    n_cells: int, max_broadcast_centroids: int | None = None
) -> str:
    """Which assignment the dedup takes: 'broadcast' (exact, scores all
    cells) or 'sharded' (sign-prefix, scores same-prefix cells).  A
    pinned ``max_broadcast_centroids`` selects by SIZE alone (the
    oracle-pinning contract); the default selects by WORK — dedup cell
    counts grow linearly with N, so the switch must trip long before
    the broadcast memory bound does."""
    if max_broadcast_centroids is not None:
        return "broadcast" if n_cells <= max_broadcast_centroids else "sharded"
    if n_cells > min(SEMDEDUP_AUTO_SHARD_CELLS, MAX_BROADCAST_CENTROIDS):
        return "sharded"
    return "broadcast"


# Per-task centroid budget of the sharded assignment: a shard holds
# ~n_cells / 2^planes centroids; planes scale so that share stays under
# this bound instead of growing linearly with the corpus.
PREFIX_SHARD_CENTROID_BUDGET = 4096

# The prefix family stops yielding NEW independent planes past this
# width (mod-23 periodicity + the dimensionality bound on realizable
# sign patterns), so more planes would add shard-key characters without
# adding shards.  16 planes x the 4096 budget bounds the per-task share
# for centroid tables up to ~2.7e8 cells (~1.7e10 vectors at dedup
# occupancy 64); beyond that the share grows as n_cells / 2^16 —
# documented residual, not silent.
PREFIX_MAX_PLANES = 16


def prefix_planes_for_cells(
    n_cells: int, per_task_budget: int = PREFIX_SHARD_CENTROID_BUDGET
) -> int:
    """Shard-key width for the sharded IVF assignment: enough sign
    planes that each of the 2^planes prefix shards holds at most
    ~``per_task_budget`` centroids (expected, under balanced signs).
    A FIXED plane count would let the per-task centroid share grow
    linearly with the centroid table (~N/256 for semantic-dedup sizing)
    — exactly the unbounded-state failure the sharded path exists to
    prevent.  Capped at PREFIX_MAX_PLANES: past the family's
    independent-plane supply, extra planes no longer split shards."""
    import math

    return min(
        PREFIX_MAX_PLANES,
        max(2, math.ceil(math.log2(max(int(n_cells), 1) / per_task_budget))),
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = SEMDEDUP_DEFAULT_THRESHOLD,
    n_cells: int | None = None,
    round_to: int = 3,
    max_broadcast_centroids: int | None = None,
    prefix_planes: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    public): assign every vector to a coarse cell, compare cosine only
    WITHIN cells, and greedily drop any vector that has a lower-id
    in-cell neighbor at similarity >= threshold (keep-first).  Returns
    the survivors (vec_id, cell).

    The embedding-space sibling of the LSH near-dup pruner
    (embedding_near_dups): clusters catch paraphrase-level duplicates
    that byte-level LSH misses.  Scale shape: constant expected cell
    occupancy (cells_for_dedup) keeps the within-cell pair volume
    linear in N; assignment broadcasts the centroid table while it
    fits and shards by sign-prefix beyond max_broadcast_centroids.
    Pass ``centroids`` (cid, cv — e.g. train_ivf_centroids) to dedup
    within a TRAINED quantizer's cells; on skewed corpora trained
    cells are balanced, so the in-cell pair volume stays near the
    occupancy budget instead of concentrating in one giant cell.

    The default threshold follows the paper's regime (~0.9+: only
    near-identical pairs are duplicates).  Synthetic random-embedding
    fixtures have no such pairs, so the test harness passes a low
    threshold EXPLICITLY — that is a fixture setting, not a default.

    COST NOTE (measured at the sf1 tier, 20k vectors / 312 cells): the
    broadcast-exact assignment scores every vector against every cell —
    O(N * N/occupancy) dot products at dedup sizing, i.e. quadratic in
    N even though the memory footprint broadcasts fine.  The sharded
    path scores only same-prefix centroids (~per_task_budget per
    vector once planes scale), which makes assignment WORK linear in N
    — 5x faster already at sf1 (15.3 s vs 77.0 s).  The default
    therefore switches to the sharded path by WORK
    (semdedup_assignment_path: n_cells > SEMDEDUP_AUTO_SHARD_CELLS),
    long before the broadcast MEMORY bound trips; pass an explicit
    ``max_broadcast_centroids`` to select by size alone (the
    oracle-backed harness query pins the broadcast path this way)."""
    if centroids is not None:
        # explicit (trained) centroid table: broadcast-exact assignment
        # by default (the oracle-transcribed path, as in knn_ivf);
        # passing prefix_planes alongside selects the sharded
        # assignment against the same table — linear work, the scale
        # pairing for sharded-trained quantizers
        if prefix_planes is not None:
            scored = _ivf_scored_sharded(
                embeddings, 0, prefix_planes, centroids=centroids
            )
        else:
            scored = _ivf_scored(embeddings, 0, centroids=centroids)
    else:
        if n_cells is None:
            n_cells = cells_for_dedup(embeddings.count())
        if prefix_planes is None:
            prefix_planes = prefix_planes_for_cells(n_cells)
        if semdedup_assignment_path(n_cells, max_broadcast_centroids) == "broadcast":
            scored = _ivf_scored(embeddings, n_cells)
        else:
            scored = _ivf_scored_sharded(embeddings, n_cells, prefix_planes)
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.max_by("cid", _best_cell_ord()).alias("cell"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
    )
    lo = assign.select(
        "cell", F.col("vec_id").alias("lo_id"), F.col("v").alias("lv"), F.col("nrm").alias("ln")
    )
    hi = assign.select(
        "cell", F.col("vec_id").alias("hi_id"), F.col("v").alias("hv"), F.col("nrm").alias("hn")
    )
    dups = (
        lo.join(hi, "cell")
        .filter(F.col("lo_id") < F.col("hi_id"))
        .select(
            F.col("hi_id").alias("vec_id"),
            F.round(_dot(F.col("lv"), F.col("hv")) / (F.col("ln") * F.col("hn")), round_to).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("vec_id")
        .distinct()
    )
    return assign.join(dups, "vec_id", "left_anti").select("vec_id", "cell")


def knn_ivf_recall(
    embeddings: DataFrame,
    k: int = 3,
    n_queries: int = 10,
    n_cells: int | None = None,
    max_broadcast_centroids: int = MAX_BROADCAST_CENTROIDS,
) -> DataFrame:
    """Recall gate for the IVF path: per query, overlap between IVF
    top-k and brute-force top-k ((query_id, n_common))."""
    bf = knn_bruteforce(embeddings, k, n_queries).select("query_id", "neighbor_id")
    iv = knn_ivf(
        embeddings, k, n_queries, n_cells,
        max_broadcast_centroids=max_broadcast_centroids,
    ).select("query_id", "neighbor_id")
    common = (
        bf.join(iv, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    qs = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"))
        .distinct()
    )
    return qs.join(common, "query_id", "left").select(
        "query_id", F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common")
    )


def knn_recall(
    embeddings: DataFrame, k: int = 3, n_queries: int = 10, n_planes: int = 4
) -> DataFrame:
    """ANN quality gate: per query, how many of the brute-force top-k
    neighbors the LSH-bucketed search recovers ((query_id, n_common);
    recall@k = n_common / k).  Both sides are deterministic, so this is
    oracle-checkable — the scale path's accuracy is pinned, not
    assumed."""
    bf = knn_bruteforce(embeddings, k, n_queries).select("query_id", "neighbor_id")
    ls = knn_lsh(embeddings, k, n_queries, n_planes).select("query_id", "neighbor_id")
    common = (
        bf.join(ls, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    qs = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"))
        .distinct()
    )
    return qs.join(common, "query_id", "left").select(
        "query_id", F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common")
    )


def _probe_buckets(bucket, n_planes: int):
    """Multi-probe expansion: the query's own bucket plus every bucket
    at Hamming distance 1 (one sign bit flipped).  Standard multi-probe
    LSH — a near neighbor that lands just across one hyperplane is
    recovered without doubling the plane count.  Candidate volume grows
    by (n_planes + 1)x but stays bucket-keyed and linear in corpus
    size (vs. the recall-equivalent alternative of halving n_planes,
    which doubles every bucket's occupancy)."""
    flip = lambda j: F.concat(  # noqa: E731
        bucket.substr(F.lit(1), j),
        F.when(bucket.substr(j + 1, F.lit(1)) == "0", F.lit("1")).otherwise(F.lit("0")),
        bucket.substr(j + 2, F.lit(n_planes)),
    )
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(-1), F.lit(n_planes - 1)),
            lambda j: F.when(j < 0, bucket).otherwise(flip(j)),
        )
    )


def knn_lsh(
    embeddings: DataFrame, k: int = 3, n_queries: int = 10, n_planes: int = 4, round_to: int = 3
) -> DataFrame:
    """Bucketed ANN: same output shape as knn_bruteforce but neighbors
    are only searched within the query's multi-probe bucket set (its
    own bucket + all Hamming-1 neighbors, see _probe_buckets)."""
    e = lsh_buckets(embeddings, n_planes)
    q = (
        e.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.explode(_probe_buckets(F.col("bucket"), n_planes)).alias("bucket"),
        )
    )
    d = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("dv"), F.col("nrm").alias("dn"), "bucket")
    sims = (
        q.join(d, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn")), round_to).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


BITEXT_K = 4  # neighborhood size for the margin denominator
BITEXT_ACCEPT_MARGIN = 1.0  # top-1 must beat its two-sided neighborhood
BITEXT_QUERIES = 128  # default exact-pass query cap (oracle interpolates it)


def bitext_margin(
    embeddings: DataFrame,
    n_queries: int = BITEXT_QUERIES,
    k: int = BITEXT_K,
) -> DataFrame:
    """Margin-based parallel-pair mining (the ratio-margin criterion of
    Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining with
    Multilingual Sentence Embeddings" — the CCMatrix/LASER recipe):
    split the corpus into two halves (even vec_id = source side, odd =
    target side), find each capped source query's best target by
    cosine, and score the pair by its RATIO MARGIN —
    cos(x,y) / ((avg cos(x, NN_k(x)) + avg cos(y, NN_k(y))) / 2) —
    instead of the raw cosine.  Raw-cosine thresholds are broken by
    HUB vectors (a generic target is everyone's nearest neighbor); the
    two-sided neighborhood denominator cancels hubness, which is why
    production bitext pipelines mine on margin, not similarity.
    Output: (query_id, match_id, sim_m3, margin, accepted).

    Cross-engine float contract: cosines are quantized once to
    round(cos*1000) BIGINT (DuckDB round() is half-away-from-zero like
    Spark HALF_UP); both neighborhood sums are exact integer sums of k
    such values, so the margin is ONE double division of two exact
    BIGINTs, rounded to 6 — the repo's established contract.  Pairs
    whose denominator is <= 0 (pathological all-negative
    neighborhoods) are dropped, documented.

    Scale shape: the forward pass is (n_queries x target half) — the
    knn_bruteforce correctness shape, hard-capped at
    MAX_BRUTEFORCE_QUERIES; the backward pass scores only the <=
    n_queries DISTINCT matched targets against the source half (same
    cap).  The 100-TB path swaps the two capped cross-joins for the
    IVF/LSH candidate generators already in this module (knn_ivf /
    knn_lsh) and keeps the margin arithmetic unchanged."""
    if n_queries > MAX_BRUTEFORCE_QUERIES:
        raise ValueError(
            f"bitext_margin's exact passes are capped at "
            f"{MAX_BRUTEFORCE_QUERIES} queries; route candidates through "
            f"knn_ivf/knn_lsh for corpus-scale mining"
        )
    e = with_norm(embeddings)
    src = e.filter(F.col("vec_id") % 2 == 0)
    tgt = e.filter(F.col("vec_id") % 2 == 1)
    q = src.filter(F.col("vec_id") < 2 * n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )

    def _sims(left, right, lid, rid):
        return left.crossJoin(right).select(
            lid,
            rid,
            F.round(
                _dot(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn")) * 1000,
                0,
            )
            .cast("long")
            .alias("sim_m3"),
        )

    d = tgt.select(
        F.col("vec_id").alias("match_id"),
        F.col("v").alias("dv"),
        F.col("nrm").alias("dn"),
    )
    fwd = _sims(q, d, F.col("query_id"), F.col("match_id"))
    w_f = Window.partitionBy("query_id").orderBy(F.desc("sim_m3"), F.asc("match_id"))
    fwd_k = fwd.withColumn("rn", F.row_number().over(w_f)).filter(F.col("rn") <= k)
    top1 = fwd_k.filter(F.col("rn") == 1).select("query_id", "match_id", "sim_m3")
    fwd_sum = fwd_k.groupBy("query_id").agg(F.sum("sim_m3").alias("fwd_sum"))

    # backward neighborhoods: only the matched targets, vs the FULL
    # source half (not just the query set) — hubness must be measured
    # against everything the target could have matched
    mt = top1.select("match_id").distinct()
    bq = mt.join(
        tgt.select(
            F.col("vec_id").alias("match_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        ),
        "match_id",
    )
    bs = src.select(
        F.col("vec_id").alias("src_id"),
        F.col("v").alias("dv"),
        F.col("nrm").alias("dn"),
    )
    bwd = _sims(bq, bs, F.col("match_id"), F.col("src_id"))
    w_b = Window.partitionBy("match_id").orderBy(F.desc("sim_m3"), F.asc("src_id"))
    bwd_sum = (
        bwd.withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= k)
        .groupBy("match_id")
        .agg(F.sum("sim_m3").alias("bwd_sum"))
    )

    denom = F.col("fwd_sum") + F.col("bwd_sum")
    return (
        top1.join(fwd_sum, "query_id")
        .join(bwd_sum, "match_id")
        .filter(denom > 0)
        .select(
            "query_id",
            "match_id",
            "sim_m3",
            F.round(2 * k * F.col("sim_m3") / denom.cast("double"), 6).alias(
                "margin"
            ),
        )
        .withColumn(
            "accepted", (F.col("margin") > F.lit(BITEXT_ACCEPT_MARGIN)).cast("int")
        )
    )


# centroid-distance outlier flag: a vector whose squared distance to
# the global centroid exceeds FACTOR x the corpus mean squared
# distance is flagged (Chebyshev-style fixed multiple -- no global
# sort, no order-dependent float reduction anywhere)
OUTLIER_FACTOR = 4


def embedding_outliers(embeddings: DataFrame) -> DataFrame:
    """Centroid-distance outlier audit over the QUANTIZED embedding
    space -> (vec_id, label, dist2, outlier): the pre-training sweep
    that drops corrupt/degenerate vectors before they skew ANN cells
    or contrastive batches.

    All sufficient statistics are exact integers on the repo's
    floor(1000x) quantization: per-dimension sums S_d, the global
    squared-norm total SSQ, and the count n.  The centroid mu = S/n
    and the per-vector distance are assembled from those integers in
    fixed array order (both engines iterate the 64-dim arrays
    left-to-right), and dist2 = qq - 2*q.mu + mu.mu is published
    rounded to 3.  The outlier rule compares against
    OUTLIER_FACTOR * E[dist2] where E[dist2] = SSQ/n - |mu|^2 -- the
    mean comes from the EXACT integer statistics, never from a
    corpus-wide float sum, so the flag is deterministic.

    Scale shape: one posexplode aggregate (64 keys, map-side
    combined) + one single-row total, both driver-small (dim-sized);
    the output pass is map-only against broadcast literals."""
    e = embeddings.select(
        "vec_id", "label", _quantized(F.col("embedding")).alias("qv")
    )
    stats = (
        e.select(F.posexplode("qv").alias("dim", "q"))
        .groupBy("dim")
        .agg(F.sum("q").alias("sd"))
        .orderBy("dim")
        .collect()
    )  # dim-sized (64 rows): driver-small by construction
    tot = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_int_dot(F.col("qv"), F.col("qv"))).alias("ssq"),
    ).collect()[0]
    n, ssq = tot["n"], tot["ssq"]
    mu = [r["sd"] / n for r in stats]
    mu_arr = F.array(*[F.lit(float(m)) for m in mu])
    mu2 = 0.0
    for m in mu:
        mu2 += m * m
    mean_dist2 = ssq / n - mu2
    qmu = F.aggregate(
        F.zip_with(F.col("qv"), mu_arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dist2 = (
        _int_dot(F.col("qv"), F.col("qv")).cast("double")
        - 2 * qmu
        + F.lit(mu2)
    )
    return e.select(
        "vec_id",
        "label",
        F.round(dist2, 3).alias("dist2"),
        (dist2 > F.lit(float(OUTLIER_FACTOR * mean_dist2))).alias("outlier"),
    )


def label_separation(embeddings: DataFrame) -> DataFrame:
    """Intra- vs inter-class separation audit over the quantized
    embedding space -> one row per unordered label pair (label_a <
    label_b): mean pairwise dot WITHIN each class, mean dot ACROSS
    the pair, and a deterministic `separated` flag (cross mean below
    the average of the two within means) -- the embedding-quality
    check run before the labels are trusted for contrastive
    sampling or balanced retrieval training.

    The O(n^2) pair means collapse to centroid algebra on EXACT
    integer sums: sum_{i<j in L} q_i.q_j = (S_L.S_L - SSQ_L) / 2 and
    sum_{i in A, j in B} q_i.q_j = S_A.S_B, so nothing ever
    enumerates a pair.  Scale shape: one label-keyed posexplode
    aggregate (|labels| x dims keys) + label-pair assembly on a
    vocabulary-sized frame."""
    e = embeddings.select(
        "vec_id", "label", _quantized(F.col("embedding")).alias("qv")
    )
    per = e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_l"),
        F.sum(_int_dot(F.col("qv"), F.col("qv"))).alias("ssq_l"),
    )
    sums = (
        e.select("label", F.posexplode("qv").alias("dim", "q"))
        .groupBy("label", "dim")
        .agg(F.sum("q").alias("sd"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "sd"))).alias("ds")
        )
        .select(
            "label", F.expr("transform(ds, x -> x.sd)").alias("sv")
        )
    )
    lab = per.join(sums, "label")  # label-vocabulary-sized
    a = lab.select(
        F.col("label").alias("label_a"),
        F.col("n_l").alias("n_a"),
        F.col("ssq_l").alias("ssq_a"),
        F.col("sv").alias("sv_a"),
    )
    b = lab.select(
        F.col("label").alias("label_b"),
        F.col("n_l").alias("n_b"),
        F.col("ssq_l").alias("ssq_b"),
        F.col("sv").alias("sv_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
    within_a = (
        (_int_dot(F.col("sv_a"), F.col("sv_a")) - F.col("ssq_a")).cast("double")
        / (F.col("n_a") * (F.col("n_a") - 1))
    )
    within_b = (
        (_int_dot(F.col("sv_b"), F.col("sv_b")) - F.col("ssq_b")).cast("double")
        / (F.col("n_b") * (F.col("n_b") - 1))
    )
    cross = _int_dot(F.col("sv_a"), F.col("sv_b")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    )
    return pairs.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        F.round(within_a, 6).alias("within_a"),
        F.round(within_b, 6).alias("within_b"),
        F.round(cross, 6).alias("cross_mean"),
        (2 * cross < within_a + within_b).alias("separated"),
    )


# int8 scalar quantization: 255 levels (the symmetric int8 range a
# vector store actually ships); micro-unit fixed-point input
QUANT_LEVELS = 255


def embedding_quantization(vecs: DataFrame) -> DataFrame:
    """Per-dimension int8 scalar-quantization audit over
    ``vecs(vec_id, embedding)`` — one row per dimension:
    (dim, n, mn_micro, mx_micro, scale_micro, max_err_micro,
    sum_sq_err, mean_err_micro).

    The decision a 100-TB embedding store actually makes: whether
    4x-smaller int8 vectors lose acceptable precision.  Each float is
    fixed-pointed FIRST (floor(x * 1e6) — the repo's micro-unit
    pattern, so both engines run integer arithmetic from there), then
    quantized per-dimension with q = min(LEVELS, (v - mn) DIV scale),
    scale = max((mx - mn) DIV LEVELS, 1), and the reconstruction
    error v - (mn + q * scale) is aggregated exactly.

    Scale shape: ONE explode of the vector column (n_vecs x dim rows,
    linear), a dim-keyed aggregate (map-side combine, dim groups), a
    broadcast join of the dim-sized stats table back onto the stream,
    and a final dim-keyed aggregate.  No vector ever meets another
    vector — this is the cheap linear audit next to the ANN family.
    At >= 2^63 / (scale^2) values per dimension the exact sum_sq
    needs per-shard partials into decimal — document, don't hide:
    bigint holds to ~1e11 vectors per dimension at unit-norm inputs."""
    d = vecs.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        # CAST to double FIRST: Spark coerces FLOAT * INT to a float32
        # multiply, whose ~0.03-micro rounding at 1e6 scale crosses
        # integer boundaries DuckDB's double multiply does not
        F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").alias("vm"),
    )
    s = d.groupBy("dim").agg(
        F.min("vm").alias("mn"),
        F.max("vm").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    sc = s.select(
        "dim",
        "mn",
        "mx",
        "n",
        F.expr(f"greatest((mx - mn) DIV {QUANT_LEVELS}, 1)").alias("scale"),
    )
    q = d.join(F.broadcast(sc), "dim").withColumn(
        "err",
        F.expr(
            f"vm - (mn + least({QUANT_LEVELS}, (vm - mn) DIV scale) * scale)"
        ),
    )
    return q.groupBy("dim", "n", "mn", "mx", "scale").agg(
        F.max("err").cast("bigint").alias("max_err_micro"),
        F.sum(F.col("err") * F.col("err")).cast("bigint").alias("sum_sq_err"),
        F.expr("CAST(sum(err) AS BIGINT) DIV first(n)").alias("mean_err_micro"),
    ).select(
        "dim",
        "n",
        F.col("mn").alias("mn_micro"),
        F.col("mx").alias("mx_micro"),
        F.col("scale").alias("scale_micro"),
        "max_err_micro",
        "sum_sq_err",
        "mean_err_micro",
    )


KCENTER_K = 8


def _int_d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kcenter_coreset(embeddings: DataFrame, k: int = KCENTER_K) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985, the 2-approximation):
    seed with the lowest vec_id, then k-1 times pick the point
    FARTHEST from the chosen set (integer squared L2 on the repo-
    standard milli-quantized vectors; ties broken by lowest vec_id) —
    the classic diversity-sampling pass that picks a maximally-spread
    subset of a training corpus, the opposite failure mode of
    similarity dedup.

    Returns one row per center: (rank, center_id, sel_d2 — the
    point's distance-to-set when selected, i.e. the covering radius
    before it joined; 0 for the seed) plus n_assigned under the final
    nearest-center assignment (ties to the lowest rank).

    Scale shape per round: one global max + one filtered min (both
    all-reduce aggregates, bytes to the driver), one broadcast of the
    single new center vector, one map-only distance update.  k is a
    constant; the corpus is scanned k times and never shuffled.  The
    distance state is re-checkpointed per round (lineage cut)."""
    e = embeddings.select(
        "vec_id",
        _quantized(_as_double(F.col("embedding"))).alias("qv"),
    ).localCheckpoint()
    seed = e.agg(F.min("vec_id")).first()[0]
    chosen = [(1, seed, 0)]
    cv = e.filter(F.col("vec_id") == seed).select(F.col("qv").alias("cv"))
    state = (
        e.crossJoin(F.broadcast(cv))
        .select(
            "vec_id",
            "qv",
            _int_d2(F.col("qv"), F.col("cv")).alias("mind"),
        )
        .localCheckpoint()
    )
    for r in range(2, k + 1):
        mx = state.agg(F.max("mind")).first()[0]
        nxt = (
            state.filter(F.col("mind") == mx)
            .agg(F.min("vec_id"))
            .first()[0]
        )
        chosen.append((r, nxt, int(mx)))
        cv = e.filter(F.col("vec_id") == nxt).select(
            F.col("qv").alias("cv")
        )
        state = (
            state.crossJoin(F.broadcast(cv))
            .select(
                "vec_id",
                "qv",
                F.least(
                    F.col("mind"), _int_d2(F.col("qv"), F.col("cv"))
                ).alias("mind"),
            )
            .localCheckpoint()
        )
    spark = embeddings.sparkSession
    from .localframe import local_df

    centers = local_df(spark, chosen, "rank long, center_id long, sel_d2 long")
    cvecs = e.join(
        centers.select(F.col("center_id").alias("vec_id"), "rank"), "vec_id"
    ).select(F.col("rank").alias("crank"), F.col("qv").alias("cv"))
    # argmin (d2, rank) as one integer key (rank <= 15), identical
    # arithmetic in the DuckDB twin
    assigned = (
        e.crossJoin(F.broadcast(cvecs))
        .select(
            "vec_id",
            (
                _int_d2(F.col("qv"), F.col("cv")) * 16 + F.col("crank")
            ).alias("k2"),
        )
        .groupBy("vec_id")
        .agg(F.min("k2").alias("best"))
        .select((F.col("best") % 16).alias("rank"))
        .groupBy("rank")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_assigned"))
    )
    return (
        centers.join(assigned, "rank", "left")
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            F.col("center_id").cast("bigint").alias("center_id"),
            F.col("sel_d2").cast("bigint").alias("sel_d2"),
            F.coalesce("n_assigned", F.lit(0)).cast("bigint").alias(
                "n_assigned"
            ),
        )
    )


PQ_SUBSPACES = 4
PQ_CODES = 16


def pq_audit(
    embeddings: DataFrame,
    n_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
) -> DataFrame:
    """Product-quantization audit (Jégou et al. 2011): split each
    milli-quantized vector into ``n_subspaces`` contiguous subvectors,
    build a ``n_codes``-entry codebook per subspace from the lowest
    vec_ids (ingest-order, the same bit-exact-oracle tradeoff as the
    IVF coarse quantizer — swap in trained centroids via the
    `semantic_dedup_trained` k-means pass when recall matters), assign
    every subvector to its nearest code (integer squared L2, ties to
    the lowest code id) and report what the compression costs: total
    squared reconstruction error, codes actually used, and the top
    code's occupancy share per subspace — the three numbers that say
    whether a PQ index of this corpus would be balanced or degenerate.

    Scale shape: the codebook is n_subspaces x n_codes rows
    (broadcast); one map-only explode to (vector, subspace) grain, a
    broadcast join + argmin, then a (subspace, code) aggregate rolled
    up to n_subspaces output rows.  The corpus shuffles only at the
    code-grain aggregate, whose cardinality is n_subspaces*n_codes."""
    e = embeddings.select(
        "vec_id",
        _quantized(_as_double(F.col("embedding"))).alias("qv"),
    )
    dim = len(e.select("qv").first()[0])
    sub = dim // n_subspaces
    parts = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("bigint").alias("m"),
                        F.slice(F.col("qv"), m * sub + 1, sub).alias("sv"),
                    )
                    for m in range(n_subspaces)
                ]
            )
        ).alias("p"),
    ).select("vec_id", F.col("p.m").alias("m"), F.col("p.sv").alias("sv"))
    codes = (
        parts.filter(F.col("vec_id") < n_codes)
        .select(
            "m",
            F.col("vec_id").cast("bigint").alias("code"),
            F.col("sv").alias("cv"),
        )
    )
    assigned = (
        parts.join(F.broadcast(codes), "m")
        .select(
            "vec_id",
            "m",
            (_int_d2(F.col("sv"), F.col("cv")) * n_codes + F.col("code"))
            .alias("k2"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("k2").alias("best"))
        .select(
            "m",
            (F.col("best") % n_codes).alias("code"),
            (F.col("best") / n_codes).cast("bigint").alias("d2"),
        )
    )
    per_code = assigned.groupBy("m", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d2").cast("bigint").alias("err"),
    )
    return per_code.groupBy("m").agg(
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("codes_used"),
        F.expr("(1000 * MAX(n)) DIV SUM(n)").cast("bigint").alias(
            "top_code_pm"
        ),
        F.sum("err").cast("bigint").alias("total_sq_err"),
    )


KNN_FILTER_LABEL = 1


def knn_filtered(
    embeddings: DataFrame,
    label: int = KNN_FILTER_LABEL,
    k: int = 3,
    n_queries: int = 10,
    round_to: int = 3,
) -> DataFrame:
    """Attribute-filtered vector search — the production case vanilla
    ANN indexes handle badly (a post-filter after top-k starves
    selective filters; the correct semantics is top-k AMONG the
    filtered set, which is what this computes): exact cosine top-k
    over only the corpus vectors carrying ``label``, for the first
    ``n_queries`` query vectors of any label.  Exactness baseline
    with the same hard query cap as knn_bruteforce — the scale path
    composes the filter into the IVF cell scan (filter BEFORE
    scoring; per-cell candidate lists shrink with selectivity).

    Returns (query_id, neighbor_id, sim, rn)."""
    if n_queries > MAX_BRUTEFORCE_QUERIES:
        raise ValueError(
            f"knn_filtered is the small-query-side baseline (n_queries <="
            f" {MAX_BRUTEFORCE_QUERIES})"
        )
    e = embeddings.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    d = e.filter(F.col("label") == int(label)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("dv"),
        F.col("nrm").alias("dn"),
    )
    sims = (
        q.crossJoin(d)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn")),
                round_to,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return sims.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def dim_energy(embeddings: DataFrame) -> DataFrame:
    """Per-dimension variance energy of the embedding space — the
    truncation audit behind Matryoshka/PCA-style dimensionality
    decisions: variance per coordinate (exact integer moment sums on
    the milli-quantized vectors), each dimension's share of total
    energy in ppm, and the cumulative share in DESCENDING energy
    order — read off how many dimensions hold 90% before paying for
    all of them.

    Output per dim: (dim, var_num — the exact n*sum(x^2)-sum(x)^2
    numerator, energy_ppm, cum_energy_ppm, energy_rank).

    Scale shape: one posexplode map pass into a (dim) aggregate — the
    output frame is dimension-sized; the ranking windows run on it."""
    q = embeddings.select(
        _quantized(_as_double(F.col("embedding"))).alias("qv")
    )
    per = (
        q.select(F.posexplode("qv").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("bigint")
            .alias("var_num"),
        )
    )
    tot = per.agg(F.sum("var_num").cast("bigint").alias("tv"))
    w = Window.orderBy(F.col("var_num").desc(), F.col("dim").asc())
    return (
        per.crossJoin(F.broadcast(tot))
        # ppm shares divide the TOTAL first (var_num DIV (tv DIV 1e6)):
        # multiplying var_num by 1e6 overflows BIGINT once the moment
        # sums pass ~9e12 (hit at sf1); the pre-divided form is exact
        # to <=1 ppm and engine-identical
        .withColumn(
            "energy_ppm",
            F.expr("var_num DIV greatest(1, tv DIV 1000000)")
            .cast("bigint"),
        )
        .withColumn(
            "energy_rank", F.row_number().over(w).cast("bigint")
        )
        .withColumn(
            "cum_energy_ppm",
            F.expr(
                "(SUM(var_num) OVER (ORDER BY var_num DESC,"
                " dim ASC ROWS BETWEEN UNBOUNDED PRECEDING AND"
                " CURRENT ROW)) DIV greatest(1, tv DIV 1000000)"
            ).cast("bigint"),
        )
        .select("dim", "var_num", "energy_ppm", "energy_rank",
                "cum_energy_ppm")
    )
