"""Distributed BPE merge training over a document corpus.

The missing piece between "count tokens" and "train on tokens":
learning the byte-pair-encoding merge table itself.  Classic BPE
(Sennrich et al. 2016, public) trains on the WORD HISTOGRAM, not the
raw corpus — so the only corpus-sized operation here is the initial
word count (one groupBy with map-side combine); every merge iteration
then runs over the (unique-word, count) table, which is vocabulary-
sized, orders of magnitude smaller than 100 TB of text.

Training has two paths sharing exact semantics (equality pinned in
tests/test_bpe.py): when the histogram fits under
DRIVER_HISTOGRAM_MAX_ROWS it is collected ONCE and the merge loop runs
driver-side (one Spark job total — the histogram is vocabulary-sized,
so this is the normal case even at 100 TB of text); otherwise the
distributed per-merge loop below runs.

Distributed iteration shape (mirrors canonicalize.connected_components):
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


# Above this vocabulary size the merge loop stays distributed; below it
# the histogram is collected once and the remaining merges run driver-
# side.  A real tokenizer's word histogram is VOCABULARY-sized (unique
# words), orders of magnitude smaller than the corpus — at 100 TB of
# text the histogram is typically a few million rows, so the collect
# turns tens of thousands of sequential Spark jobs (one per merge) into
# ONE job + a driver loop.  The distributed loop remains the fallback
# for histograms that genuinely don't fit the driver.
DRIVER_HISTOGRAM_MAX_ROWS = 500_000


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right merge — the exact pure-Python mirror of
    `_merge_pair_expr` (so the two training paths are interchangeable;
    equality is pinned in tests/test_bpe.py)."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _train_merges_driver(
    hist: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Driver-side merge loop over the collected (symbols, count)
    histogram.  Tie-break identical to the distributed argmax: count
    desc, then (l, r) lexicographic asc (ASCII == UTF-8 binary order
    for this corpus; Spark's string sort is binary).

    Pair counts are maintained INCREMENTALLY (the standard BPE-trainer
    optimization): each merge rewrites only the words that contain the
    merged pair (tracked in an occurrence index), so a tokenizer-sized
    run is O(total symbol touches of affected words), not
    O(n_merges x corpus symbols) — the naive full rescan per merge
    would take hours of driver CPU at a few-million-row histogram
    despite being 'one Spark job'.  Count equality with the full
    rescan (and with the distributed loop) is pinned in
    tests/test_bpe.py."""
    merges: list[tuple[str, str, int]] = []
    words = [(list(syms), n) for syms, n in hist]
    counts: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, n) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + n
            occ.setdefault(p, set()).add(idx)
    for _ in range(n_merges):
        if not counts:
            break
        (left, right), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((left, right, int(c)))
        # rewrite ONLY words containing (left, right); occurrence sets
        # may hold stale indices from earlier rewrites — harmless, the
        # subtract/re-add below nets to zero for unaffected words
        for idx in occ.pop((left, right), set()):
            syms, n = words[idx]
            for p in zip(syms, syms[1:]):
                counts[p] -= n
                if counts[p] <= 0:
                    counts.pop(p, None)
            new = _merge_word(syms, left, right)
            words[idx] = (new, n)
            for p in zip(new, new[1:]):
                counts[p] = counts.get(p, 0) + n
                occ.setdefault(p, set()).add(idx)
    return merges


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    driver_max_rows: int = DRIVER_HISTOGRAM_MAX_ROWS,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge table [(left, right, pair_count), ...].

    The one corpus-sized pass is the initial word histogram.  When the
    histogram (vocabulary-sized) fits under ``driver_max_rows`` it is
    collected once and the merge loop runs driver-side — train
    wall-time is then flat in n_merges instead of one Spark job per
    merge.  Larger vocabularies fall back to the distributed loop,
    where each iteration collects exactly ONE row (the argmax pair)."""
    words = word_histogram(docs).select(
        F.expr("split(word, '')").alias("syms"), "n"
    )
    words = words.localCheckpoint()
    if words.count() <= driver_max_rows:
        hist = [(list(r["syms"]), int(r["n"])) for r in words.collect()]
        return _train_merges_driver(hist, n_merges)
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


def apply_bpe(docs: DataFrame, merges: list) -> DataFrame:
    """Segment every document with a learned merge table —
    (doc_id, n_pieces, n_distinct_pieces).  Merges apply in learned
    order, greedily left-to-right per word.

    The whole merge table is ONE expression: an outer F.aggregate folds
    over the merge-table array literal, the inner F.aggregate applies
    one merge greedily to the word's symbol array (nested higher-order
    functions — the inner lambda closes over the outer merge struct).
    Plan depth is therefore CONSTANT in n_merges — no per-merge
    projection towers and no corpus-materializing localCheckpoints
    (which at tokenizer-sized tables meant checkpointing 100 TB of
    symbol arrays thousands of times).  ``merges`` entries may be
    (l, r) or (l, r, count)."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = docs.select("doc_id", F.explode(toks).alias("word")).select(
        "doc_id", F.expr("split(word, '')").alias("chars")
    )
    if not merges:  # empty table: pieces are the raw characters
        d = d.select("doc_id", F.col("chars").alias("syms"))
        return (
            d.select("doc_id", F.explode("syms").alias("piece"))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_pieces"),
                F.countDistinct("piece").alias("n_distinct_pieces"),
            )
        )
    merge_arr = F.array(
        *[
            F.struct(F.lit(m[0]).alias("l"), F.lit(m[1]).alias("r"))
            for m in merges
        ]
    )
    seg = F.aggregate(
        merge_arr,
        F.col("chars"),
        lambda syms, m: F.aggregate(
            syms,
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == m["l"])
                & (x == m["r"]),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(m["l"], m["r"])),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ),
    )
    d = d.select("doc_id", seg.alias("syms"))
    return (
        d.select("doc_id", F.explode("syms").alias("piece"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.countDistinct("piece").alias("n_distinct_pieces"),
        )
    )
