"""Interleaved documents -> candidate triples.

The graft payload (BASELINE.json north_star): batched mention detection
and entity-link scoring over interleaved text+media spans with
Arrow-vectorized pandas UDFs (never row-at-a-time Python), emitting
candidate (subj, pred, obj) triples while preserving the span sequence
(kind, text, media_ref, order) row-for-row.

Scale shape: explode is narrow (no shuffle); the pandas UDF runs on
Arrow batches inside the scan stage; the only shuffles are the
canonicalization join and the final triple dedupe.  Skew from hot
entities (Q5-style) is handled downstream by salted aggregation
(textops.salted_count) and AQE.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MENTION_RE = re.compile(r"\bQ\d+\b")
CUE_RE = re.compile(r"\bP\d+\b")

MENTION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("entity", StringType()),
            StructField("start", IntegerType()),
            StructField("score", DoubleType()),
        ]
    )
)


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents -> one row per span, order preserved via span_idx."""
    return docs.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def reassemble_spans(spans: DataFrame) -> DataFrame:
    """Inverse of explode_spans — used by the span-sequence-equality
    invariant test (sort_array on (span_idx, ...) restores order)."""
    return (
        spans.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("span_idx", "kind", "text", "media_ref", "offset")
                    )
                ),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans")
        )
    )


@F.pandas_udf(MENTION_SCHEMA)
def detect_mentions(text: pd.Series) -> pd.Series:
    """Arrow-batched mention detection + deterministic link scoring.

    Score = 1 / (1 + mention_start / 100): earlier mentions link more
    confidently.  Pure function of the text so tests are reproducible.
    """

    def one(t):
        if not t:
            return []
        return [
            {"entity": m.group(0), "start": m.start(), "score": 1.0 / (1.0 + m.start() / 100.0)}
            for m in MENTION_RE.finditer(t)
        ]

    return text.map(one)


@F.pandas_udf(ArrayType(StringType()))
def detect_cues(text: pd.Series) -> pd.Series:
    """Arrow-batched property-cue detection (P-ids appearing in text)."""
    return text.map(lambda t: CUE_RE.findall(t) if t else [])


def extract_mentions(spans: DataFrame) -> DataFrame:
    """Text spans -> (doc_id, span_idx, offset, mentions, cues)."""
    return spans.filter(F.col("kind") == "text").select(
        "doc_id",
        "span_idx",
        "offset",
        detect_mentions("text").alias("mentions"),
        detect_cues("text").alias("cues"),
    )


def emit_triples(mentioned: DataFrame) -> DataFrame:
    """Candidate triples: consecutive mention pairs within a span wired
    through the span's first property cue; link score = min of the two
    mention scores.  Pure column expressions (zip_with/slice)."""
    pairs = F.zip_with(
        F.slice("mentions", 1, F.greatest(F.size("mentions") - 1, F.lit(0))),
        F.slice("mentions", 2, F.greatest(F.size("mentions") - 1, F.lit(0))),
        lambda a, b: F.struct(
            a["entity"].alias("subj"),
            b["entity"].alias("obj"),
            F.least(a["score"], b["score"]).alias("score"),
        ),
    )
    return (
        mentioned.filter((F.size("mentions") >= 2) & (F.size("cues") >= 1))
        .select(
            "doc_id",
            "span_idx",
            F.element_at("cues", 1).alias("pred"),
            F.explode(pairs).alias("pair"),
        )
        .select(
            F.col("pair.subj").alias("subj"),
            "pred",
            F.col("pair.obj").alias("obj"),
            F.col("pair.score").alias("score"),
            "doc_id",
            "span_idx",
        )
    )


def extract_triples(docs: DataFrame) -> DataFrame:
    """documents -> candidate triples with provenance."""
    return emit_triples(extract_mentions(explode_spans(docs)))


def aggregate_triples(triples: DataFrame) -> DataFrame:
    """Distinct graph edges with evidence counts and best link score."""
    return triples.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("evidence"),
        F.max("score").alias("score"),
    )


def media_context_links(docs: DataFrame, max_dist: int = 4) -> DataFrame:
    """Caption-linking over an interleaved token stream: each media
    span (>= 8-char token, the same convention the multimodal feature
    path uses) links to the NEAREST preceding text mention
    (``^[a-z]{6,7}$`` — mention-shaped but too short to be media)
    within ``max_dist`` positions — (doc_id, span_idx, media_ref,
    context_mention).

    This is the media-grounding shape of interleaved KG construction:
    the mention supplies the candidate entity for the media object.
    Plan: posexplode (narrow) + ONE per-doc window (shuffle keyed by
    doc_id, uniform); no join, no Python."""
    from pyspark.sql import Window

    toks = (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("span_idx", "tok"))
        .select(
            "doc_id",
            "span_idx",
            "tok",
            (F.length("tok") >= 8).alias("is_media"),
            F.when(F.col("tok").rlike("^[a-z]{6,7}$"), F.col("tok")).alias("mention"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("span_idx")
        .rowsBetween(-max_dist, -1)
    )
    return (
        toks.withColumn("context_mention", F.last("mention", ignorenulls=True).over(w))
        .filter(F.col("is_media") & F.col("context_mention").isNotNull())
        .select("doc_id", "span_idx", F.col("tok").alias("media_ref"), "context_mention")
    )


EL_N_CANDS = 3


def el_candidates(
    mentions: DataFrame,
    popularity: DataFrame,
    id_space: int,
    n_cands: int = EL_N_CANDS,
) -> DataFrame:
    """Entity-linking candidate generation with a commonness prior —
    the stage between mention detection and canonicalization in every
    EL stack (Milne & Witten 2008's commonness): for each distinct
    mention surface, propose ``n_cands`` candidate entities from the
    alias map and rank them by corpus popularity; commonness =
    candidate popularity / total popularity of the mention's
    surviving candidates.

    The alias map here is the harness's deterministic stand-in (a
    real system feeds a curated alias dictionary): candidate k of a
    mention is Q(md5-hash(mention:k) mod id_space), inner-joined
    against ``popularity(entity, n_triples)`` so only entities that
    exist in the KG survive.  Output: (mention, candidate, n_triples,
    commonness, cand_rank) with rank 1 = most popular (ties to the
    smaller candidate id) and commonness rounded to 6.

    Scale shape: mentions explode x n_cands (a constant), one
    entity-keyed equi-join against the vocabulary-sized popularity
    table, and per-mention windows over <= n_cands rows — nothing
    corpus-sized is windowed, sorted or broadcast."""
    from pyspark.sql import Window

    cands = mentions.select(
        "mention",
        F.explode(F.sequence(F.lit(0), F.lit(n_cands - 1))).alias("k"),
    ).select(
        "mention",
        F.concat(
            F.lit("Q"),
            (
                F.expr(
                    "CAST(conv(substr(md5(concat(mention, ':', CAST(k AS STRING))),"
                    " 1, 13), 16, 10) AS BIGINT)"
                )
                % id_space
            ).cast("string"),
        ).alias("candidate"),
    ).distinct()
    scored = cands.join(
        popularity.select(F.col("entity").alias("candidate"), "n_triples"),
        "candidate",
    )
    w = Window.partitionBy("mention")
    wo = w.orderBy(F.col("n_triples").desc(), "candidate")
    return scored.select(
        "mention",
        "candidate",
        "n_triples",
        F.round(
            F.col("n_triples") / F.sum("n_triples").over(w).cast("double"), 6
        ).alias("commonness"),
        F.row_number().over(wo).alias("cand_rank"),
    )


@F.pandas_udf(
    ArrayType(
        StructType(
            [
                StructField("start", IntegerType()),
                StructField("end", IntegerType()),
                StructField("surface", StringType()),
            ]
        )
    )
)
def _mention_spans(text: pd.Series) -> pd.Series:
    """Arrow-batched offset-bearing mention detection: (start, end,
    surface) per maximal [a-z]{6,} run, 1-based inclusive-exclusive
    offsets (start = m.start()+1, end = m.end()+1 — substr
    coordinates)."""
    def one(t):
        if not t:
            return []
        return [
            {"start": m.start() + 1, "end": m.end() + 1, "surface": m.group(0)}
            for m in NER_RE.finditer(t)
        ]

    return text.map(one)


NER_RE = re.compile(r"[a-z]{6,}")


def ner_spans(docs: DataFrame) -> DataFrame:
    """Offset-bearing span export for NER training data — the
    (doc_id, start, end, surface) table a span-labeling trainer
    consumes (the north-star's span-level mention detection with
    REAL character offsets, not just surfaces): one Arrow pandas-UDF
    pass, one explode, no shuffle at all.

    Offsets are 1-based substr coordinates (start inclusive, end
    exclusive) so `substr(text, start, end - start) = surface` holds
    on both engines by construction."""
    return docs.select(
        "doc_id", F.explode(_mention_spans("text")).alias("m")
    ).select(
        "doc_id",
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
        F.col("m.surface").alias("surface"),
    )


def clip_pairs(links: DataFrame) -> DataFrame:
    """Contrastive media-caption training pairs (the CLIP-style
    batch-construction export) over the caption-link table
    ``links(doc_id, span_idx, media_ref, context_mention)`` ->
    (doc_id, span_idx, media_ref, mention, label): each grounded
    media span yields its linked mention as the POSITIVE (label 1)
    and one hash-picked DIFFERENT mention from the corpus mention
    vocabulary as the NEGATIVE (label 0) — hash-in-place-of-RNG, and
    a hash that lands on the positive mention is bumped to the next
    vocabulary slot, so the pair set is deterministic across
    engines/runs/partitionings.

    Scale shape: the mention vocabulary is tiny (it is already the
    distinct-mention space of the linker) — its global row_number
    index and the single-row count are the repo's vocabulary-sized /
    totals patterns; everything row-wise is one broadcast join over
    the links."""
    from pyspark.sql import Window

    ment = (
        links.select(F.col("context_mention").alias("mention"))
        .distinct()
        .withColumn(
            "idx", F.row_number().over(Window.orderBy("mention")) - 1
        )  # mention-vocabulary-sized
    )
    cnt = ment.agg(F.count(F.lit(1)).alias("nm"))
    pos = links.select(
        "doc_id",
        "span_idx",
        "media_ref",
        F.col("context_mention").alias("mention"),
        F.lit(1).alias("label"),
    )
    h = F.expr(
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',"
        " CAST(span_idx AS STRING), ':clipneg')), 1, 13), 16, 10) AS BIGINT)"
    )
    withidx = (
        links.join(
            F.broadcast(ment.withColumnRenamed("mention", "context_mention")),
            "context_mention",
        )
        .withColumnRenamed("idx", "pos_idx")
        .crossJoin(F.broadcast(cnt))  # single-row totals
        .withColumn("raw_idx", h % F.col("nm"))
        .withColumn(
            "neg_idx",
            F.when(F.col("raw_idx") == F.col("pos_idx"), (F.col("raw_idx") + 1) % F.col("nm"))
            .otherwise(F.col("raw_idx")),
        )
        .filter(F.col("nm") >= 2)  # no negative exists in a 1-mention corpus
    )
    neg = withidx.join(
        F.broadcast(ment.withColumnRenamed("idx", "neg_idx")), "neg_idx"
    ).select(
        "doc_id",
        "span_idx",
        "media_ref",
        "mention",
        F.lit(0).alias("label"),
    )
    return pos.unionByName(neg)
