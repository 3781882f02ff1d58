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
