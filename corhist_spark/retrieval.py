"""BM25 relevance scoring over the document corpus — the
keyword-profile selection operator of a training-data curation
pipeline (pick documents matching a topic profile before training,
the retrieval-style complement of dsir_select's distribution
matching).

Okapi BM25 (Robertson et al., TREC-3, public) with the
always-positive idf variant ln(1 + (N - df + 0.5)/(df + 0.5)) used
by Lucene, so scores never go negative for very common terms.

Scale shape (100 TB): the query term set is tiny and enters as an
IN-list filter BEFORE any aggregation, so the corpus token stream is
scanned once and reduced map-side to <= |docs| * |query| rows; N and
avgdl are single-row aggregates cross-joined broadcast (the repo's
totals-frame pattern); document length comes from the same single
scan.  No self-joins, no per-row Python, and every shuffle key is
doc_id or the (tiny) term.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_tokens: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, bm25) for every document containing at least one query
    token; bm25 = sum over matched terms of
    idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), rounded to 6
    decimals (the repo-wide cross-engine float contract: the <=|query|
    per-doc term sum is order-dependent only at ~1e-16).

    dl is the document's whitespace token count and avgdl its corpus
    mean — an exact BIGINT sum divided by an exact count, so both
    engines compute the identical double."""
    qtoks = sorted(set(query_tokens))
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(qtoks))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))  # single-row totals frame
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(F.round(F.sum("s"), 6).alias("bm25"))


# nDCG cutoffs and the position-gain table 1e6/log2(i+1), i = 1..10 —
# Python-side constants interpolated into BOTH engines (log2 is libm,
# not correctly-rounded; a shared integer table cannot drift)
NDCG_KS = (5, 10)
NDCG_GAIN_MICRO = tuple(
    round(1_000_000 / math.log2(i + 1)) for i in range(1, 11)
)


def ndcg_eval(scores: DataFrame, relevance: DataFrame, ks: tuple = NDCG_KS) -> DataFrame:
    """Binary nDCG@k of a retrieval ranking (Jarvelin & Kekalainen
    2002) — one row per cutoff k: (k, n_ranked, n_rel_total,
    n_rel_at_k, dcg_micro, idcg_micro, ndcg_ppm).  The retrieval
    quality gate for the selection stack: BM25 (or any scorer) picks
    training documents; this measures how much of the truly relevant
    mass the top of that ranking actually captures.

    ``scores(doc_id, bm25)`` ranks by (score DESC, doc_id);
    ``relevance(doc_id, rel)`` carries binary labels.  DCG/IDCG use
    the shared micro-integer gain table (NDCG_GAIN_MICRO), so both
    engines sum exact integers; IDCG places all n_rel_total relevant
    docs optimally (prefix sums of the gain table, capped at k).

    Scale shape: the ranking is orderBy + limit max(ks) — Spark plans
    TakeOrderedAndProject, a distributed top-k with per-partition
    partials, never a global sort; everything downstream is
    <= max(ks) rows plus one map-side-combined relevance count."""
    kmax = max(ks)
    top = (
        scores.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(kmax)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .join(relevance, "doc_id", "left")
        .select("rk", F.coalesce(F.col("rel"), F.lit(0)).alias("rel"))
        .localCheckpoint()
    )
    n_rel = relevance.agg(
        F.sum(F.col("rel")).cast("bigint").alias("n_rel_total")
    )
    gain_case = "CASE rk " + " ".join(
        f"WHEN {i + 1} THEN {g}" for i, g in enumerate(NDCG_GAIN_MICRO)
    ) + " END"
    prefix = []
    acc = 0
    for g in NDCG_GAIN_MICRO:
        acc += g
        prefix.append(acc)
    parts = []
    for k in ks:
        idcg_case = (
            "CASE least(" + str(k) + ", n_rel_total) "
            + " ".join(
                f"WHEN {i + 1} THEN {p}" for i, p in enumerate(prefix[:k])
            )
            + " ELSE 0 END"
        )
        parts.append(
            top.filter(F.col("rk") <= k)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
                F.sum("rel").cast("bigint").alias("n_rel_at_k"),
                F.coalesce(F.sum(F.expr(f"rel * ({gain_case})")), F.lit(0))
                .cast("bigint")
                .alias("dcg_micro"),
            )
            .crossJoin(F.broadcast(n_rel))  # single-row totals frame
            .select(
                F.lit(k).cast("bigint").alias("k"),
                "n_ranked",
                "n_rel_total",
                "n_rel_at_k",
                "dcg_micro",
                F.expr(idcg_case).cast("bigint").alias("idcg_micro"),
                F.expr(
                    f"CASE WHEN ({idcg_case}) > 0 "
                    f"THEN (1000000 * dcg_micro) DIV ({idcg_case}) END"
                ).alias("ndcg_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# two-stage retrieval settings: BM25 candidate depth and the nDCG
# cutoff the re-rank is judged at
RERANK_CANDIDATES = 50
RERANK_KS = (10,)


def rerank_eval(
    scores: DataFrame,
    embeddings: DataFrame,
    relevance: DataFrame,
    n_candidates: int = RERANK_CANDIDATES,
    ks: tuple = RERANK_KS,
) -> DataFrame:
    """Two-stage retrieval evaluation (the BM25-then-dense pattern
    every modern retrieval stack runs; the dense query vector comes
    from pseudo-relevance feedback — Rocchio with the top-1 BM25
    document as the sole feedback doc): take the top
    ``n_candidates`` BM25 candidates, re-rank them by rounded cosine
    to the top-1 candidate's embedding, and report nDCG@k for BOTH
    rankings over the same candidate set and relevance — the
    before/after table that decides whether the dense stage pays.
    Output: (ranking, k, n_ranked, n_rel_total, n_rel_at_k,
    dcg_micro, idcg_micro, ndcg_ppm) with ranking in
    {'bm25_baseline', 'cosine_reranked'}.

    Scale shape: candidate selection is orderBy+limit
    (TakeOrderedAndProject — distributed top-k); everything after is
    <= n_candidates rows: one id-keyed embedding join, a 1-row seed
    broadcast, and the ndcg_eval aggregates."""
    from corhist_spark.similarity import with_norm, _dot

    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    # the dense stage can only rerank docs that HAVE embeddings, and
    # a fair before/after needs one candidate set — so the join comes
    # BEFORE the top-k (an id-keyed equi-join; the top-k stays a
    # distributed TakeOrderedAndProject over the joined stream)
    cand = (
        scores.join(
            with_norm(embeddings).select(
                F.col("vec_id").alias("doc_id"), "v", "nrm"
            ),
            "doc_id",
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(n_candidates)
        .withColumn("rk", F.row_number().over(w))
        .localCheckpoint()  # <= n_candidates rows
    )
    seed = cand.filter(F.col("rk") == 1).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    rr = cand.crossJoin(F.broadcast(seed)).select(
        "doc_id",
        F.round(
            _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 3
        ).alias("bm25"),
    )
    base = ndcg_eval(cand.select("doc_id", "bm25"), relevance, ks=ks).select(
        F.lit("bm25_baseline").alias("ranking"), "*"
    )
    rer = ndcg_eval(rr, relevance, ks=ks).select(
        F.lit("cosine_reranked").alias("ranking"), "*"
    )
    return base.unionByName(rer)


RRF_K = 60
RRF_TOPN = 100
RRF_OUT = 20


def rrf_fusion(docs: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two rankers at
    K — the standard zero-training retrieval ensemble: each ranker
    contributes 1/(k + rank) for its top-N, documents outside a
    ranker's top-N contribute nothing (RRF@N, the practical form — a
    full-corpus rank would force a global sort).  Ranker A orders by
    the alphabetic-per-mille quality score, ranker B by document
    length; both tie-break on doc_id.  Scores are integer-scaled
    (1e6 DIV (k + rank)), so fusion and its ordering are exact.

    Returns the fused top-RRF_OUT: (fused_rank, doc_id, rrf_scaled).

    Scale shape: each ranker's top-N comes from a distributed
    TakeOrdered (orderBy + limit, never a full sort-to-one-partition);
    ranks are then assigned on the N-row frame, fused with one
    doc_id-grain aggregate, and the output is another TakeOrdered."""
    scored = docs.select(
        "doc_id",
        F.expr(
            "(1000 * length(regexp_replace(lower(text), '[^a-z]', '')))"
            " DIV greatest(n_chars, 1)"
        )
        .cast("bigint")
        .alias("q"),
        F.col("n_chars").cast("bigint").alias("len"),
    ).localCheckpoint()

    def topn_ranks(order_col: str) -> DataFrame:
        top = scored.orderBy(
            F.col(order_col).desc(), F.col("doc_id").asc()
        ).limit(RRF_TOPN)
        w = Window.orderBy(F.col(order_col).desc(), F.col("doc_id").asc())
        return top.select(
            "doc_id", F.row_number().over(w).alias("rank")
        ).select(
            "doc_id",
            F.expr(f"1000000 DIV ({RRF_K} + rank)").alias("contrib"),
        )

    fused = (
        topn_ranks("q")
        .unionByName(topn_ranks("len"))
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("bigint").alias("rrf_scaled"))
    )
    wf = Window.orderBy(F.col("rrf_scaled").desc(), F.col("doc_id").asc())
    return (
        fused.orderBy(F.col("rrf_scaled").desc(), F.col("doc_id").asc())
        .limit(RRF_OUT)
        .select(
            F.row_number().over(wf).cast("bigint").alias("fused_rank"),
            "doc_id",
            "rrf_scaled",
        )
    )
