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

from pyspark.sql import DataFrame
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
