"""applyInPandasWithState violation-queue machine: state must survive
across micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""

from __future__ import annotations

import pytest

from corhist_spark.streaming import QUEUE_EVENT_SCHEMA, stateful_violation_queue


def test_stateful_queue_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: two violations arrive
    spark.createDataFrame(
        [("s1", "c1", "violation", "1"), ("s2", "c1", "violation", "2")],
        schema=QUEUE_EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: s1 approved; s2 goes obsolete then is re-seen -> proposed
    spark.createDataFrame(
        [
            ("s1", "c1", "approve", "3"),
            ("s2", "c1", "obsolete", "4"),
            ("s2", "c1", "violation", "5"),
            ("s3", "c1", "approve", "6"),  # action on unknown key: dropped
        ],
        schema=QUEUE_EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(QUEUE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = "queue_updates"
    q = (
        stateful_violation_queue(stream, str(tmp_path / "ckpt"))
        .queryName(name)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # final state per key: last emitted update wins
    final = {}
    for r in rows:
        final[(r.statement_id, r.constraint_id)] = r.state
    assert final[("s1", "c1")] == "a"
    assert final[("s2", "c1")] == "p"  # o -> p on re-sight within batch 2
    assert ("s3", "c1") not in final


def test_fold_sorts_across_chunks():
    """A key whose events arrive split across Arrow chunks must fold in
    GLOBAL seq order: chunk1 holds (v seq1, a seq4), chunk2 (r seq2,
    o seq5).  Global order v,r,a,o ends 'a' (last approve/reject wins);
    a buggy per-chunk sort would process v,a then r,o and end 'r'."""
    import pandas as pd

    from corhist_spark.streaming import _fold_queue_events

    c1 = pd.DataFrame({"kind": ["violation", "approve"], "seq": ["0001", "0004"]})
    c2 = pd.DataFrame({"kind": ["reject", "obsolete"], "seq": ["0002", "0005"]})
    assert _fold_queue_events(iter([c1, c2]), None) == "a"
    assert _fold_queue_events(iter([]), "p") == "p"


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Ingest dedup: a re-arrival of the same text within the watermark
    horizon is dropped; a distinct text passes; state is bounded by the
    watermark (dropDuplicatesWithinWatermark)."""
    import time as _t
    from datetime import datetime

    from corhist_spark.streaming import streaming_dedup_documents

    def ts(h, m):
        return datetime(2024, 1, 1, h, m)

    src = str(tmp_path / "dsrc")
    sch = "doc_id string, text string, ts timestamp"

    def write_batch(rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode("append").parquet(src)
        _t.sleep(1.2)

    # batch 1: original + exact duplicate (same text, other doc_id)
    write_batch([("d1", "alpha beta gamma", ts(10, 0)),
                 ("d2", "alpha beta gamma", ts(10, 1)),
                 ("d3", "unique text here", ts(10, 2))])
    # batch 2: another duplicate arriving in a later micro-batch but
    # still inside the watermark horizon -> dropped too
    write_batch([("d4", "alpha beta gamma", ts(10, 3)),
                 ("d5", "fresh second doc", ts(10, 4))])

    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_dedup_documents(stream, checkpoint_dir=str(tmp_path / "dckpt"))
        .queryName("dedup_docs")
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM dedup_docs").collect()
    kept = sorted(r.doc_id for r in rows)
    assert kept == ["d1", "d3", "d5"], kept
    assert all(r.text_hash for r in rows)


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    """Event-time windows + watermark: a row arriving after the
    watermark passed its window is DROPPED (the finalized window count
    excludes it), and windows only emit once finalized (append mode)."""
    import time as _t
    from datetime import datetime

    from corhist_spark.streaming import windowed_revision_counts

    def ts(h, m, s=0):
        return datetime(2024, 1, 1, h, m, s)

    src = str(tmp_path / "wsrc")
    sch = "entity string, ts timestamp"

    def write_batch(rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode("append").parquet(src)
        _t.sleep(1.2)  # distinct mtimes -> deterministic file order

    # batch 1: two rows in [10:00,10:10) + an advancer at 10:30
    write_batch([("e1", ts(10, 0, 30)), ("e1", ts(10, 4)), ("adv", ts(10, 30))])
    # batch 2 (watermark 10:25): [10:00,10:10) finalizes with n=2 and
    # its state is evicted; new rows in [10:30,10:40)
    write_batch([("e2", ts(10, 31)), ("adv", ts(10, 50))])
    # batch 3 (watermark 10:45): the 10:02 row is now LATE — its
    # window's state is gone, so it must be dropped, not re-opened
    write_batch([("e1", ts(10, 2)), ("adv", ts(11, 10))])

    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        windowed_revision_counts(stream, checkpoint_dir=str(tmp_path / "wckpt"))
        .queryName("win_counts")
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM win_counts").collect()
    got = {}
    for r in rows:
        got.setdefault((r.window_start.strftime("%H:%M"), r.entity), []).append(r.n)
    # exactly one finalized emission with n=2: the late 10:02 row was
    # dropped, not counted and not re-opened as a second window row
    assert got[("10:00", "e1")] == [2]
    assert got[("10:30", "e2")] == [1] and got[("10:30", "adv")] == [1]
    assert ("11:10", "adv") not in got  # last window never finalized


def test_stream_stream_interval_join(spark, tmp_path):
    """Two feeds (edit events / revision metadata) joined by rev_id
    with a time-bound: metadata within the horizon joins, metadata
    beyond the horizon does not, metadata without an edit is dropped."""
    from datetime import datetime

    from corhist_spark.streaming import join_edit_streams

    def ts(h, m, s=0):
        return datetime(2024, 1, 1, h, m, s)

    esrc, msrc = str(tmp_path / "esrc"), str(tmp_path / "msrc")
    esch = "rev_id long, entity string, ts timestamp"
    msch = "rev_id long, author string, mts timestamp"
    spark.createDataFrame(
        [
            (1, "Q1", ts(10, 0)),
            (2, "Q2", ts(10, 1)),
            (4, "Q4", ts(10, 2)),
        ],
        esch,
    ).coalesce(1).write.parquet(esrc)
    spark.createDataFrame(
        [
            (1, "alice", ts(10, 5)),       # within 600 s of 10:00 -> joins
            (2, "bob", ts(10, 20)),        # 19 min after the edit -> beyond horizon
            (3, "carol", ts(10, 3)),       # no matching edit -> dropped
            (4, "dave", ts(9, 55)),        # metadata BEFORE the edit -> dropped
        ],
        msch,
    ).coalesce(1).write.parquet(msrc)

    e = spark.readStream.schema(esch).parquet(esrc)
    m = spark.readStream.schema(msch).parquet(msrc)
    q = (
        join_edit_streams(e, m, checkpoint_dir=str(tmp_path / "jckpt"))
        .queryName("ss_join")
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM ss_join").collect()
    assert {(r.rev_id, r.entity, r.author) for r in rows} == {(1, "Q1", "alice")}
