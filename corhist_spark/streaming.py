"""Structured Streaming variant of the online path (game.Main).

- ``revision_feed_filter``: the live revision-stream predicate of
  `corhist/.../game/ViolationDatabaseUpdater.java:104-109` (keep
  wikidata-item revisions with content change).
- ``stream_apply_rules``: micro-batch rule application — the same
  broadcast-join + rank-window plan as evaluate.apply_rules run inside
  ``foreachBatch``, appending predictions to a warehouse table.
- ``upsert_violation_queue``: the p/a/r/o state machine of
  `game/ViolationDatabase.java:71-97,202-239` as a batch MERGE
  emulation: existing OBSOLETE rows flip back to PROPOSED, existing
  p/a/r rows are left untouched, unseen violations are inserted as
  PROPOSED.  With Iceberg this is a single MERGE INTO; on the parquet
  warehouse it is a full-outer join rewrite inside foreachBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from .storage import Warehouse


def revision_feed_filter(stream: DataFrame) -> DataFrame:
    return stream.filter(
        (F.col("rev_content_model") == "wikibase-item")
        & (F.col("database") == "wikidatawiki")
        & F.col("rev_content_changed")
    )


def upsert_violation_queue(queue: DataFrame | None, incoming: DataFrame) -> DataFrame:
    """One MERGE round.  incoming: (entity_id, property_id,
    statement_id, constraint_id, constraint_type, message, edit_json).
    queue: same + state.  Returns the new queue contents."""
    inc = incoming.dropDuplicates(["statement_id", "constraint_id"]).withColumn(
        "state", F.lit("p")
    )
    if queue is None:
        return inc
    q = queue.alias("q")
    i = inc.alias("i")
    joined = q.join(
        i.select(
            F.col("statement_id").alias("i_sid"),
            F.col("constraint_id").alias("i_cid"),
        ),
        (F.col("q.statement_id") == F.col("i_sid"))
        & (F.col("q.constraint_id") == F.col("i_cid")),
        "left",
    )
    # existing rows: OBSOLETE + re-seen -> PROPOSED; others unchanged
    updated = joined.select(
        "q.*",
        F.when((F.col("q.state") == "o") & F.col("i_sid").isNotNull(), F.lit("p"))
        .otherwise(F.col("q.state"))
        .alias("_new_state"),
    ).drop("state").withColumnRenamed("_new_state", "state")
    inserts = inc.join(
        queue.select("statement_id", "constraint_id"),
        ["statement_id", "constraint_id"],
        "left_anti",
    )
    return updated.unionByName(inserts.select(*updated.columns))


QUEUE_EVENT_SCHEMA = StructType(
    [
        StructField("statement_id", StringType()),
        StructField("constraint_id", StringType()),
        StructField("kind", StringType()),  # violation | approve | reject | obsolete
        StructField("seq", StringType()),  # ordering within a batch
    ]
)

QUEUE_STATE_SCHEMA = StructType([StructField("state", StringType())])

QUEUE_OUT_SCHEMA = StructType(
    [
        StructField("statement_id", StringType()),
        StructField("constraint_id", StringType()),
        StructField("state", StringType()),
    ]
)


def _queue_transition(cur: str | None, kind: str) -> str | None:
    """The p/a/r/o machine of `game/ViolationDatabase.java`:
    addViolation (`:71-97`): absent -> PROPOSED, OBSOLETE -> PROPOSED,
    else unchanged; logAction approve/reject -> a/r;
    clearProposedViolations (`:60-68`): PROPOSED -> OBSOLETE."""
    if kind == "violation":
        return "p" if cur is None or cur == "o" else cur
    if cur is None:
        return None  # actions on unknown violations are dropped
    if kind == "approve":
        return "a"
    if kind == "reject":
        return "r"
    if kind == "obsolete":
        return "o" if cur == "p" else cur
    return cur


def _fold_queue_events(pdfs: Iterator[pd.DataFrame], cur: str | None) -> str | None:
    """Fold a key's events (possibly split across SEVERAL Arrow chunks
    in arbitrary order — maxRecordsPerBatch splits big groups) through
    the transition machine: concatenate first, sort by seq ONCE.  A
    per-chunk sort would apply transitions out of global seq order and
    corrupt the state (caught in round-5 review; pinned by
    test_stateful_streaming.test_fold_sorts_across_chunks)."""
    new = cur
    chunks = list(pdfs)
    if chunks:
        batch = pd.concat(chunks)
        for kind in batch.sort_values("seq")["kind"]:
            new = _queue_transition(new, kind)
    return new


def stateful_violation_queue(events: DataFrame, checkpoint_dir: str):
    """Custom stateful streaming operator: the violation-queue state
    machine as ``applyInPandasWithState`` keyed by
    (statement_id, constraint_id).  State survives across micro-batches
    (the reference keeps it in HSQLDB); each batch emits the keys whose
    state changed."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cur = state.get[0] if state.exists else None
        new = _fold_queue_events(pdfs, cur)
        if new is not None and new != cur:
            state.update((new,))
            yield pd.DataFrame(
                [{"statement_id": key[0], "constraint_id": key[1], "state": new}]
            )

    out = events.groupBy("statement_id", "constraint_id").applyInPandasWithState(
        update,
        outputStructType=QUEUE_OUT_SCHEMA,
        stateStructType=QUEUE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def windowed_revision_counts(
    stream: DataFrame,
    window_dur: str = "10 minutes",
    watermark: str = "5 minutes",
    checkpoint_dir: str | None = None,
):
    """Event-time windowed per-entity revision counts with a watermark:
    rows later than the watermark are dropped and a window finalizes
    (append mode) once the watermark passes its end — the late-data
    semantics a revision feed needs at scale.  The reference's live
    updater (`game/ViolationDatabaseUpdater.java:72-109`) assumes SSE
    arrival order and has no event-time handling at all; this is the
    Structured Streaming upgrade of that path.

    Returns a DataStreamWriter (memory sink, availableNow) producing
    (window_start, entity, n) rows for FINALIZED windows only."""
    out = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_dur), "entity")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "entity", "n")
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("memory")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def streaming_dedup_documents(
    stream: DataFrame,
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
):
    """Ingest-time exact dedup for a document feed: re-arrivals of the
    same content hash within the watermark horizon are dropped,
    first-seen rows pass through (append mode).

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state is
    EVICTED once the watermark passes — bounded state regardless of
    feed volume, vs plain ``dropDuplicates`` whose state grows with
    every distinct document ever seen (unbounded at a 100 TB/day
    crawl).  Batch-side exact dedup over the full corpus stays
    ``q_exact_dedup``; this operator is the streaming front door.

    stream: (doc_id, text, ts).  Returns a DataStreamWriter (memory
    sink, availableNow) emitting the surviving rows + text_hash."""
    out = (
        stream.withColumn("text_hash", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("memory")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def stream_apply_rules(
    stream: DataFrame,
    rules: DataFrame,
    revisions: DataFrame,
    state: DataFrame,
    wh: Warehouse,
    table: str = "stream_predictions",
    checkpoint_dir: str | None = None,
):
    """Attach a foreachBatch sink that applies the mined rules to each
    micro-batch of corrections-shaped rows and appends predictions."""
    from .evaluate import apply_rules

    def handle(batch: DataFrame, batch_id: int):
        if batch.isEmpty():
            return
        preds = apply_rules(rules, batch, revisions, state).filter(
            F.col("predicted").isNotNull()
        )
        preds.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            wh._path(table)
        )

    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def join_edit_streams(
    edits: DataFrame,
    meta: DataFrame,
    watermark: str = "10 minutes",
    horizon_s: int = 600,
    checkpoint_dir: str | None = None,
):
    """Stream-stream interval join: edit events and revision metadata
    arrive on SEPARATE feeds (the reference's SSE updater reads one
    merged feed, `game/ViolationDatabaseUpdater.java:72-109`; real
    ingestion rarely gets that luxury).  An edit joins the metadata
    row with the same rev_id arriving within ``horizon_s`` seconds of
    it.  Both sides carry watermarks, so Spark evicts join state once
    an edit can no longer find a matching metadata row — bounded
    state at any feed volume.

    edits: (rev_id, entity, ts); meta: (rev_id, author, mts).
    Returns a DataStreamWriter (memory sink, availableNow) emitting
    (rev_id, entity, author, ts, mts)."""
    e = edits.withWatermark("ts", watermark)
    m = meta.withColumnRenamed("rev_id", "m_rev").withWatermark("mts", watermark)
    cond = (
        (F.col("rev_id") == F.col("m_rev"))
        & (F.col("mts") >= F.col("ts"))
        & (F.col("mts") <= F.col("ts") + F.expr(f"interval {horizon_s} seconds"))
    )
    out = e.join(m, cond).select("rev_id", "entity", "author", "ts", "mts")
    writer = (
        out.writeStream.outputMode("append")
        .format("memory")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def session_window_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "5 minutes",
    checkpoint_dir: str | None = None,
):
    """Event-time SESSION windows (native ``F.session_window``) with a
    watermark: per-entity activity sessions close ``gap`` after their
    last event, merge transitively while events keep arriving inside
    the gap, and finalize (append mode) once the watermark passes the
    session end — the stateful sessionization a revision feed needs
    without any custom state store (contrast q_user_sessions' batch
    window chain; this is the streaming twin on Spark's built-in
    merging session state).

    Returns a DataStreamWriter (memory sink, availableNow) producing
    (session_start, session_end, entity, n) for FINALIZED sessions."""
    out = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "entity")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "entity",
            "n",
        )
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("memory")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def enriched_window_counts(
    stream: DataFrame,
    dim: DataFrame,
    window_dur: str = "10 minutes",
    watermark: str = "5 minutes",
    checkpoint_dir: str | None = None,
):
    """Stream-static enrichment then event-time windowed aggregation:
    the streaming side joins a STATIC dimension (broadcast per
    micro-batch — Spark's stream-static join never builds join state)
    before the watermarked window count.  This is the canonical
    'enrich the feed with a slowly-changing dim' topology; rows whose
    key misses the dim are kept with a NULL-bucket label so the
    aggregation accounts for every event (an inner join would silently
    drop unmatched events — an audit hazard).

    ``stream`` needs (ts, key); ``dim`` needs (key, label).  Returns a
    DataStreamWriter (memory sink, availableNow) producing
    (window_start, label, n) for FINALIZED windows."""
    joined = stream.join(F.broadcast(dim), "key", "left").select(
        "ts", F.coalesce("label", F.lit("<miss>")).alias("label")
    )
    out = (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_dur), "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "label", "n")
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("memory")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
