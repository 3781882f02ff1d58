"""Distributed BPE merge training vs an independent pure-Python BPE
trainer (Sennrich-style, word-histogram based): the learned merge
tables must match EXACTLY — same pairs, same order, same counts.
Same oracle pattern as the rule-mining core (test_mining_oracle)."""

from __future__ import annotations

from collections import Counter

from corhist_spark.bpe import apply_bpe, train_bpe_merges, word_histogram


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference trainer: argmax pair by (count desc, left asc,
    right asc), greedy left-to-right merge, stop below count 2."""
    words = [([c for c in w], n) for w, n in word_counts.items()]
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merges.append((left, right, c))
        new_words = []
        for syms, n in words:
            out: list[str] = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            new_words.append((out, n))
        words = new_words
    return merges, words


def _segment(word: str, merges) -> list[str]:
    syms = list(word)
    for left, right, _ in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def test_bpe_merges_match_python_trainer(spark):
    """Default path (histogram fits -> collected once, driver loop)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = {r.word: r.n for r in word_histogram(docs).collect()}
    want, _ = _python_bpe(wc, n_merges=8)
    got = train_bpe_merges(docs, n_merges=8)
    assert got == want


def test_bpe_distributed_loop_matches_driver_path(spark):
    """driver_max_rows=0 forces the distributed per-merge loop; both
    training paths must learn the identical merge table (and match the
    independent trainer)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = {r.word: r.n for r in word_histogram(docs).collect()}
    want, _ = _python_bpe(wc, n_merges=6)
    dist = train_bpe_merges(docs, n_merges=6, driver_max_rows=0)
    drv = train_bpe_merges(docs, n_merges=6)
    assert dist == drv == want


def test_bpe_merges_on_planted_overlaps(spark):
    """Overlap semantics: 'aaa' under merge (a,a) segments greedily as
    [aa, a]; ties break lexicographically."""
    d = spark.createDataFrame(
        [(1, "aaa aaa bb"), (2, "aaa bb bb")], "doc_id long, text string"
    )
    wc = {r.word: r.n for r in word_histogram(d).collect()}
    want, _ = _python_bpe(wc, n_merges=4)
    got = train_bpe_merges(d, n_merges=4)
    assert got == want
    # 'aaa' x3 contributes 2 (a,a) pairs per occurrence = 6; (b,b) = 3
    assert got[0][:2] == ("a", "a") and got[0][2] == 6


def test_apply_bpe_matches_python_segmentation(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    merges = train_bpe_merges(docs, n_merges=5)
    got = {r.doc_id: (r.n_pieces, r.n_distinct_pieces) for r in apply_bpe(docs, merges).collect()}
    for r in docs.collect():
        pieces = [p for w in r.text.split(" ") if w for p in _segment(w, merges)]
        assert got[r.doc_id] == (len(pieces), len(set(pieces))), r.doc_id
