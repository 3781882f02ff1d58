"""Explicit hot-key skew handling (north rule): salting for joins and
aggregations on high-degree keys (the P31/Q5 problem — a handful of
keys carrying a large share of rows).

AQE's skew-join splitting handles most cases at runtime; these helpers
are the *explicit* variant for joins AQE can't rebalance (e.g. when the
skewed side must stay sort-merge) and for two-stage aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame, small: DataFrame, on: str, n_salts: int = 8, how: str = "inner"
) -> DataFrame:
    """Join ``big`` (skewed on ``on``) with ``small`` by replicating the
    small side across ``n_salts`` salt values and scattering the big
    side's hot rows uniformly.  Result is row-identical to
    ``big.join(small, on, how)``; the shuffle key becomes
    (on, salt), so one hot key spreads over n_salts reducers."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")


def hot_keys(df: DataFrame, key: str, threshold_share: float = 0.01) -> DataFrame:
    """Keys carrying more than ``threshold_share`` of all rows — the
    candidates for salting (diagnostic)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total * threshold_share)
        .orderBy(F.desc("n"))
    )


SKEW_TOP_K = 8
SKEW_TARGET_PER_TASK = 100_000


def skew_profile(
    df: DataFrame,
    key: str,
    top_k: int = SKEW_TOP_K,
    target_per_task: int = SKEW_TARGET_PER_TASK,
) -> DataFrame:
    """Join-key skew scorecard — the report read before choosing a
    salt count for ``salted_join`` / a two-stage aggregation: the
    ``top_k`` hottest keys with their row share and the per-key salt
    recommendation ceil(freq / target_per_task) (how many reducers a
    single-key shuffle partition must be split over so no task
    exceeds ``target_per_task`` rows).  Output: (key, freq, share,
    n_keys, n_rows, recommended_salts), share rounded to 6.

    Scale shape: one key-keyed map-side-combinable count, ONE
    distributed top-k over it (TakeOrderedAndProject — the key
    vocabulary is never globally sorted), one single-row totals
    broadcast.  The integer ceil is (freq + target - 1) / target so
    both engines round identically."""
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("freq").alias("n_rows")
    )
    head = counts.orderBy(F.col("freq").desc(), "key").limit(top_k)
    return head.crossJoin(F.broadcast(totals)).select(  # single-row totals
        "key",
        "freq",
        F.round(F.col("freq") / F.col("n_rows").cast("double"), 6).alias("share"),
        "n_keys",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.expr(
            f"(freq + {target_per_task} - 1) DIV {target_per_task}"
        ).alias("recommended_salts"),
    )


PART_TARGET_BYTES = 128 * 1024 * 1024  # the Spark default-ish 128 MiB


def partition_advisor(
    docs: DataFrame,
    size_col: str = "text",
    target_bytes: int = PART_TARGET_BYTES,
) -> DataFrame:
    """Shuffle/file partition-count advisor — the one-row report
    behind choosing spark.sql.shuffle.partitions and output file
    counts for a corpus: total rows, total payload bytes (length of
    ``size_col``), recommended partitions = ceil(bytes / target)
    (integer ceil — both engines round identically), and the
    resulting rows-per-partition.

    Scale shape: ONE map-side-combined aggregate; everything else is
    arithmetic on the single-row frame."""
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(F.length(size_col)), F.lit(0))
        .cast("bigint")
        .alias("n_bytes"),
    )
    rec = F.expr(f"greatest(1, (n_bytes + {target_bytes} - 1) DIV {target_bytes})")
    return agg.select(
        "n_rows",
        "n_bytes",
        rec.cast("bigint").alias("recommended_partitions"),
        F.expr(
            f"n_rows DIV greatest(1, (n_bytes + {target_bytes} - 1) DIV {target_bytes})"
        )
        .cast("bigint")
        .alias("rows_per_partition"),
    )
