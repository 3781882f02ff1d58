"""Distributed BPE merge training over a document corpus.

The missing piece between "count tokens" and "train on tokens":
learning the byte-pair-encoding merge table itself.  Classic BPE
(Sennrich et al. 2016, public) trains on the WORD HISTOGRAM, not the
raw corpus — so the only corpus-sized operation here is the initial
word count (one groupBy with map-side combine); every merge iteration
then runs over the (unique-word, count) table, which is vocabulary-
sized, orders of magnitude smaller than 100 TB of text.

Iteration shape (mirrors canonicalize.connected_components):
  1. explode adjacent symbol pairs weighted by word count
  2. one aggregate picks the max-count pair (deterministic tie-break:
     count desc, then pair lexicographic) — a 1-row collect
  3. a higher-order F.aggregate rewrites every word's symbol array,
     merging that pair greedily left-to-right (the standard BPE apply
     rule, so "aaa" + (a,a) -> [aa, a])
  4. localCheckpoint the words frame to cut lineage before the next
     round (deep self-referential plans stall Catalyst otherwise)

Everything is JVM-side array expressions — no Python UDFs.  There is
deliberately NO driver SQL oracle: the per-iteration argmax makes the
loop data-dependent, which a single SQL string cannot express; the
correctness pin is an exact-match pytest oracle against an
independent pure-Python BPE trainer (tests/test_bpe.py), the same
pattern the rule-mining core uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_histogram(docs: DataFrame) -> DataFrame:
    """(word, n): whitespace-token counts — the one corpus-sized pass."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_pair_expr(left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs inside the `syms` array column, as one F.aggregate."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        "syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(l, r)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(docs: DataFrame, n_merges: int = 10) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge table [(left, right, pair_count), ...].

    The merge table is driver-sized by definition (a tokenizer has
    tens of thousands of merges); each iteration collects exactly ONE
    row (the argmax pair)."""
    words = word_histogram(docs).select(
        F.expr("split(word, '')").alias("syms"), "n"
    )
    words = words.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = words.select(
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.expr(
                        "transform(sequence(1, size(syms)-1), "
                        "i -> struct(syms[i-1] AS l, syms[i] AS r))"
                    ),
                ).otherwise(F.expr("CAST(array() AS array<struct<l:string,r:string>>)"))
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            break
        left, right, count = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["c"])
        merges.append((left, right, count))
        words = words.select(_merge_pair_expr(left, right).alias("syms"), "n")
        words = words.localCheckpoint()
    return merges


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Segment every document with a learned merge table —
    (doc_id, n_pieces, n_distinct_pieces).  Merges apply in learned
    order, greedily left-to-right per word, all in array expressions."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = docs.select("doc_id", F.explode(toks).alias("word")).select(
        "doc_id", F.expr("split(word, '')").alias("syms")
    )
    for i, (left, right, _) in enumerate(merges):
        d = d.select("doc_id", _merge_pair_expr(left, right).alias("syms"))
        # plan depth grows one nested aggregate per merge; cut the
        # lineage periodically so a real tokenizer-sized merge table
        # (tens of thousands) does not stall Catalyst analysis
        if (i + 1) % 8 == 0:
            d = d.localCheckpoint()
    return (
        d.select("doc_id", F.explode("syms").alias("piece"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.countDistinct("piece").alias("n_distinct_pieces"),
        )
    )
