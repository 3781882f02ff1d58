"""Bloom-filter semi-join: filter a huge fact table by a key set that
is too large to broadcast EXACTLY but fits as bits (Bloom 1970) — the
standard 100-TB shuffle-avoidance pattern (Spark's own runtime filters
inject the same shape; this is the explicit, cross-engine-checkable
form with md5-derived positions instead of the JVM's opaque hashes).

Layout: n_bits bit positions packed into 63-bit BIGINT words (bits
0..62 — bit 63 is never used, so no engine touches the sign bit and
DuckDB's checked `<<` never overflows).  The bitmap is built with ONE
groupBy(word).bit_or over k md5 positions per key — map-side combined
to <= n_bits/63 rows (16 k rows for 2^20 bits), a side input orders of
magnitude smaller than the key set itself.

Probe shape: the fact side's DISTINCT keys (not rows) explode to k
positions, inner-join the broadcast bitmap on word, keep positions
whose bit is set, and a key is a member iff ALL k positions hit
(count == k; a position whose word row is absent means no key ever
set a bit there, and the inner join drops it — correct rejection).
Everything is integer md5 arithmetic, so false positives are
DETERMINISTIC and the whole operator transcribes to a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 20
BLOOM_K = 4
WORD_BITS = 63  # bits 0..62 only: the sign bit stays untouched


def _positions(df: DataFrame, key_expr: str, n_bits: int, k: int) -> DataFrame:
    """(key, i, pos): the k md5-derived bit positions of each key —
    pos_i = hex13(md5('bf' || i || ':' || key)) % n_bits (the shared
    repo-wide 13-hex decode from sketches._hex13)."""
    from corhist_spark.sketches import _hex13

    return df.select(
        F.expr(key_expr).cast("string").alias("bf_key"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    ).select(
        "bf_key",
        (_hex13("concat('bf', CAST(i AS STRING), ':', bf_key)") % n_bits).alias("pos"),
    )


def bloom_bitmap(
    keys: DataFrame, key_expr: str, n_bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """(word, bits) bitmap over the key set: word = pos div 63, bit =
    pos % 63, OR-ed per word.  <= ceil(n_bits/63) rows, mergeable
    (cell-wise bit_or) across partitions and across key-set shards."""
    pos = _positions(keys, key_expr, n_bits, k)
    return (
        pos.select(
            F.expr(f"pos div {WORD_BITS}").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )


def bloom_member_keys(
    probe_keys: DataFrame,
    bitmap: DataFrame,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """The subset of ``probe_keys`` (column ``bf_key`` produced by the
    caller via _positions' key_expr, or any one-column frame renamed)
    whose k positions are ALL set in the bitmap -> (bf_key)."""
    pos = _positions(probe_keys, "bf_key", n_bits, k)
    cells = pos.select(
        "bf_key",
        F.expr(f"pos div {WORD_BITS}").alias("word"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias("m"),
    )
    return (
        cells.join(F.broadcast(bitmap), "word")
        .filter(F.expr("(bits & m) <> 0"))
        .groupBy("bf_key")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k)
        .select("bf_key")
    )


def bloom_semi_join_stats(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_expr: str,
    n_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """One summary row pinning the operator end-to-end:
    (n_bitmap_words, n_bloom_rows, n_exact_rows, n_false_positive_rows)
    — fact rows passing the Bloom filter vs the exact semi-join on the
    same key set; the difference is the filter's deterministic false
    positives (rows a second exact stage would drop; the Bloom stage's
    job is to kill the >99.9% of the fact table that cannot match
    WITHOUT shuffling it).

    Scale shape: the bitmap is a <= n_bits/63-row broadcast; the probe
    works on the fact side's DISTINCT keys; the fact table itself is
    touched only by two semi-joins on its own key — no repartition of
    the fact rows by anything new."""
    bitmap = bloom_bitmap(keys, key_expr, n_bits, k).localCheckpoint()
    probe = fact.select(F.expr(fact_key).cast("string").alias("bf_key")).distinct()
    members = bloom_member_keys(probe, bitmap, n_bits, k)
    fact_keyed = fact.select(F.expr(fact_key).cast("string").alias("bf_key"))
    n_bloom = fact_keyed.join(members, "bf_key", "left_semi").count()
    exact = keys.select(F.expr(key_expr).cast("string").alias("bf_key")).distinct()
    n_exact = fact_keyed.join(exact, "bf_key", "left_semi").count()
    spark = fact.sparkSession
    from .localframe import local_df

    return local_df(
        spark,
        [(bitmap.count(), n_bloom, n_exact, n_bloom - n_exact)],
        "n_bitmap_words bigint, n_bloom_rows bigint, n_exact_rows bigint,"
        " n_false_positive_rows bigint",
    )
