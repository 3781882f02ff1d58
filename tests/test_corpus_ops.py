"""Corpus-curation operators: chunking, chunk-level dedup,
decontamination, repetition stats, stratified sampling — semantic unit
tests on planted inputs plus physical-plan audits (JVM-side, map-only
where promised)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from corhist_spark.textops import (
    chunk_dedup,
    decontaminate,
    doc_chunks,
    dsir_select,
    remove_boilerplate,
    repetition_stats,
    stratified_sample,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_chunks_width_and_empty_guard(spark):
    d = _docs(
        spark,
        [
            (1, " ".join(f"w{i}" for i in range(35))),  # 35 toks -> 3 chunks
            (2, ""),  # empty: must yield NO chunks, not a descending sequence
            (3, "a b"),  # shorter than width -> one 2-token chunk
        ],
    )
    got = {(r.doc_id, r.chunk_id): r.n_chunk_tokens for r in doc_chunks(d).collect()}
    assert got == {(1, 0): 16, (1, 1): 16, (1, 2): 3, (3, 0): 2}


def test_chunk_dedup_keeps_one_canonical_copy(spark):
    shared = " ".join(f"s{i}" for i in range(16))
    tail_a = " ".join(f"a{i}" for i in range(16))
    tail_b = " ".join(f"b{i}" for i in range(16))
    d = _docs(spark, [(1, f"{shared} {tail_a}"), (2, f"{shared} {tail_b}")])
    out = {r.doc_id: r for r in chunk_dedup(d).collect()}
    # doc 1 holds the canonical (min doc_id) copy of the shared chunk
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[2].n_chunks == 2 and out[2].n_kept == 1
    assert out[1].clean_hash == hashlib.md5(f"{shared} {tail_a}".encode()).hexdigest()
    assert out[2].clean_hash == hashlib.md5(tail_b.encode()).hexdigest()


def test_chunk_dedup_all_dropped_yields_null_hash(spark):
    shared = " ".join(f"s{i}" for i in range(16))
    d = _docs(spark, [(1, shared), (2, shared)])
    out = {r.doc_id: r for r in chunk_dedup(d).collect()}
    assert out[1].n_kept == 1 and out[1].clean_hash is not None
    assert out[2].n_kept == 0 and out[2].clean_hash is None


def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_remove_boilerplate_threshold_boundary(spark):
    """4 docs in one source, threshold = max(2, ceil(0.25*4)) = 2: the
    banner (df=4) and the pair segment (df=2, exactly AT the threshold)
    are dropped from every occurrence; the unique tails (df=1) stay.
    A second source with the SAME banner text but df=1 keeps it —
    frequency is counted per source, not globally."""
    banner = " ".join(f"h{i}" for i in range(16))
    pair = " ".join(f"p{i}" for i in range(16))
    tails = {k: " ".join(f"t{k}_{i}" for i in range(16)) for k in range(4)}
    d = _src_docs(
        spark,
        [
            (0, "s", f"{banner} {pair} {tails[0]}"),
            (1, "s", f"{banner} {pair} {tails[1]}"),
            (2, "s", f"{banner} {tails[2]}"),
            (3, "s", f"{banner} {tails[3]}"),
            (9, "other", f"{banner} {tails[0]}"),
        ],
    )
    out = {r.doc_id: r for r in remove_boilerplate(d).collect()}
    assert out[0].n_chunks == 3 and out[0].n_kept == 1
    assert out[0].clean_hash == hashlib.md5(tails[0].encode()).hexdigest()
    assert out[2].n_chunks == 2 and out[2].n_kept == 1
    # same banner text, different source, df=1 there -> kept
    assert out[9].n_kept == 2
    assert (
        out[9].clean_hash
        == hashlib.md5(f"{banner} {tails[0]}".encode()).hexdigest()
    )


def test_dsir_select_planted_domains(spark):
    """DSIR importance weighting on a two-domain plant: docs made of
    target-domain tokens score a positive mean log weight (more
    probable under the target model) and are selected; docs made of
    off-domain tokens score negative and are not.  n_feats counts
    unigrams + bigrams (2n-1 for an n-token doc); an empty doc has no
    features and drops out; a one-token doc contributes its unigram
    only (no degenerate bigram).  The two vocabularies are DISJOINT on
    purpose: a raw-only doc that reused a target token would (rightly)
    drag target docs' weights down — per-bucket cr grows while ct
    stays, which is DSIR working, not a bug."""
    d = _docs(
        spark,
        [
            (0, "alpha beta gamma alpha"),
            (1, "beta alpha gamma"),
            (2, "zork quux blorp zork"),
            (3, "quux blorp zork"),
            (4, ""),
            (5, "solo"),
        ],
    )
    out = {r.doc_id: r for r in dsir_select(d, d.filter(F.col("doc_id") <= 1)).collect()}
    assert 4 not in out
    assert out[0].n_feats == 7 and out[1].n_feats == 5  # 2n-1
    assert out[5].n_feats == 1
    assert out[0].selected and out[1].selected
    assert out[0].log_weight > 0 < out[1].log_weight
    # raw-only vocabulary: never more probable under the target model
    assert not out[2].selected and not out[3].selected and not out[5].selected
    assert out[2].log_weight < 0 > out[3].log_weight


def test_remove_boilerplate_drops_all_occurrences(spark):
    """Unlike chunk_dedup (one canonical copy kept), boilerplate
    removal drops EVERY occurrence — a doc that is pure boilerplate
    comes back with n_kept=0 and a null clean_hash."""
    banner = " ".join(f"h{i}" for i in range(16))
    d = _src_docs(spark, [(0, "s", banner), (1, "s", banner), (2, "s", banner)])
    out = {r.doc_id: r for r in remove_boilerplate(d).collect()}
    assert all(out[k].n_kept == 0 and out[k].clean_hash is None for k in (0, 1, 2))


def test_word_ngrams_short_doc_guard(spark):
    d = _docs(spark, [(1, "only three tokens"), (2, " ".join("t" + str(i) for i in range(9)))])
    got = word_ngrams(d, n=8).collect()
    assert {r.doc_id for r in got} == {2}
    assert len(got) == 2  # 9 tokens -> two 8-grams


def test_decontaminate_flags_exact_overlap_only(spark):
    phrase = " ".join(f"p{i}" for i in range(8))
    ev = _docs(spark, [(100, f"{phrase} extra tokens here")])
    tr = _docs(
        spark,
        [
            (1, f"lead in {phrase} trailing"),  # contains the eval 8-gram
            (2, " ".join(f"q{i}" for i in range(20))),  # disjoint
            (3, " ".join(f"p{i}" for i in range(7))),  # too short for any 8-gram
        ],
    )
    got = {r.doc_id: (r.n_hits, r.contaminated) for r in decontaminate(tr, ev).collect()}
    assert got[1][1] is True and got[1][0] >= 1
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_repetition_stats_planted_values(spark):
    # 6 tokens "x y z x y z" -> trigrams: xyz yzx zxy xyz -> 4 total, 3 distinct
    d = _docs(spark, [(1, "x y z x y z"), (2, "")])
    got = {r.doc_id: r for r in repetition_stats(d).collect()}
    assert got[1].dup_ngram_frac == pytest.approx(1 - 3 / 4, abs=1e-6)
    assert got[1].top_token_share == pytest.approx(2 / 6, abs=1e-6)
    assert got[2].dup_ngram_frac == 0.0 and got[2].top_token_share == 0.0


def test_stratified_sample_matches_python_hash(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = {(r.doc_id, r.source) for r in stratified_sample(docs).collect()}
    for r in docs.select("doc_id", "source").collect():
        h = int(hashlib.md5(f"{r.doc_id}:{r.source}".encode()).hexdigest()[:13], 16) % 1000
        rate = 100 + 50 * (int(r.source.lstrip("src")) % 8)
        assert ((r.doc_id, r.source) in kept) == (h < rate)


def test_stratified_sample_source_without_numeric_suffix_keeps_base_rate(spark):
    """A stratum whose source name has no numeric suffix must fall back
    to the 100-per-mille base rate instead of being silently dropped
    (the old NULL-rate behavior excluded the whole stratum)."""
    n = 2000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(1).alias("n_chars"),
    )
    kept = stratified_sample(d).count()
    assert kept > 0, "no-digit source stratum silently dropped"
    # ~10% of 2000 expected under the base rate
    assert 120 <= kept <= 280, kept


def test_pii_stats_planted_values(spark):
    from corhist_spark.textops import pii_stats

    rows = [
        (1, "mail a.b+c@foo.bar.com and x@y.io, call +12345678901 now"),
        (2, "+123456 too short, no email here"),  # 6 digits < {7,}
        (3, None),
        # a +digit run INSIDE an email local part: redacted as part of
        # <EMAIL>, so it must not be counted as a phone either (counts
        # correspond to the placeholders actually emitted)
        (4, "write u+1234567@x.com ok"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_stats(d).collect()}
    assert (got[1].n_emails, got[1].n_phones) == (2, 1)
    assert (got[2].n_emails, got[2].n_phones) == (0, 0)
    assert (got[3].n_emails, got[3].n_phones) == (0, 0)
    assert (got[4].n_emails, got[4].n_phones) == (1, 0)
    red4 = "write <EMAIL> ok"
    assert got[4].redacted_hash == hashlib.md5(red4.encode()).hexdigest()
    red1 = "mail <EMAIL> and <EMAIL>, call <PHONE> now"
    assert got[1].redacted_hash == hashlib.md5(red1.encode()).hexdigest()
    assert got[3].redacted_hash == hashlib.md5(b"").hexdigest()


def test_winnow_fingerprints_matches_python(spark):
    from corhist_spark.textops import WINNOW_K, WINNOW_W, winnow_fingerprints

    texts = {
        1: "a b c d e f g h",
        2: "a b",          # shorter than k -> no grams
        3: "a b c d",      # fewer grams than w -> single window
    }
    d = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in winnow_fingerprints(d).collect()}

    def py_winnow(text):
        toks = [t for t in text.split(" ") if t]
        if len(toks) < WINNOW_K:
            return 0, None
        grams = [
            " ".join(toks[i : i + WINNOW_K])
            for i in range(len(toks) - WINNOW_K + 1)
        ]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:13], 16) for g in grams]
        minima = [
            min(hs[i : i + WINNOW_W])
            for i in range(max(len(hs) - WINNOW_W + 1, 1))
        ]
        fps = sorted(set(minima))
        return len(fps), hashlib.md5(",".join(map(str, fps)).encode()).hexdigest()

    for doc_id, text in texts.items():
        n, h = py_winnow(text)
        assert (got[doc_id].n_fingerprints, got[doc_id].fp_hash) == (n, h), doc_id


def test_corpus_ops_plans(spark):
    """All curation operators stay JVM-side; the sampler is map-only
    (no Exchange), the decontamination probe broadcasts the eval set,
    and media_context/sequence_pack shuffle exactly once (their
    per-doc/per-group window)."""
    from corhist_spark.extract import media_context_links
    from corhist_spark.textops import sequence_pack

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 10 == 7)
    tr = docs.filter(F.col("doc_id") % 10 != 7)
    frames = {
        "doc_chunks": doc_chunks(docs),
        "chunk_dedup": chunk_dedup(docs),
        "decontaminate": decontaminate(tr, ev),
        "repetition_stats": repetition_stats(docs),
        "stratified_sample": stratified_sample(docs),
        "sequence_pack": sequence_pack(docs),
        "media_context": media_context_links(docs),
        "remove_boilerplate": remove_boilerplate(
            docs.select("doc_id", "source", "text")
        ),
        "dsir_select": dsir_select(docs, docs.filter(F.col("lang") == "en")),
    }
    plans = {
        k: df._jdf.queryExecution().executedPlan().toString() for k, df in frames.items()
    }
    for k, plan in plans.items():
        assert "Python" not in plan, f"{k}: {plan}"
        assert "CartesianProduct" not in plan, f"{k}: {plan}"
    assert "Exchange" not in plans["stratified_sample"], plans["stratified_sample"]
    assert "BroadcastHashJoin" in plans["decontaminate"], plans["decontaminate"]
    # dsir's scoring join must ride the broadcast ratio table (its
    # <= n_buckets size is by construction), never a shuffle join
    assert "BroadcastHashJoin" in plans["dsir_select"], plans["dsir_select"]
    # media_context promises "no join"; its window is the one shuffle
    assert "Join" not in plans["media_context"], plans["media_context"]
    for k in ("media_context", "sequence_pack"):
        n_exch = plans[k].count("Exchange hashpartitioning")
        assert n_exch == 1, f"{k}: expected exactly 1 shuffle, saw {n_exch}"


def test_chunk_dedup_matches_python_replay_on_random_corpora(spark):
    """Property check: on random corpora with planted shared chunks,
    chunk_dedup matches a pure-Python replay of the keep rule (an
    occurrence survives iff it is the minimal (doc_id, chunk_id)
    occurrence of its chunk text)."""
    import random

    rng = random.Random(77)
    W = 16
    # a pool of 6 shareable chunks + per-doc unique filler
    pool = [" ".join(f"c{p}w{i}" for i in range(W)) for p in range(6)]
    rows = []
    for d in range(30):
        parts = []
        for k in range(rng.randint(1, 5)):
            if rng.random() < 0.5:
                parts.append(rng.choice(pool))
            else:
                parts.append(" ".join(f"d{d}k{k}w{i}" for i in range(rng.randint(1, W))))
        rng.shuffle(parts)
        rows.append((d, " ".join(parts)))

    # python replay
    def chunks(text):
        toks = [t for t in text.split(" ") if t]
        return [" ".join(toks[i : i + W]) for i in range(0, len(toks), W)]

    first = {}
    for d, text in rows:
        for cid, ct in enumerate(chunks(text)):
            first.setdefault(ct, (d, cid))
    want = {}
    for d, text in rows:
        ch = chunks(text)
        kept = [ct for cid, ct in enumerate(ch) if first[ct] == (d, cid)]
        want[d] = (
            len(ch),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else None,
        )

    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.clean_hash)
        for r in chunk_dedup(_docs(spark, rows)).collect()
    }
    assert got == want


def test_sequence_pack_boundaries_and_overflow(spark):
    """Packing semantics: a chunk joins the sequence its starting
    offset falls in, so a sequence can overflow by at most width-1
    tokens and always holds at least one chunk."""
    from corhist_spark.textops import sequence_pack

    # one pack group (doc_ids = 0, 32, 64: all % 32 == 0)
    d = _docs(
        spark,
        [
            (0, " ".join(f"a{i}" for i in range(40))),   # chunks: 16,16,8
            (32, " ".join(f"b{i}" for i in range(20))),  # chunks: 16,4
            (64, " ".join(f"c{i}" for i in range(10))),  # chunks: 10
        ],
    )
    out = sorted(
        (r.seq_id, r.n_chunks, r.n_tokens)
        for r in sequence_pack(d, width=16, budget=64, n_groups=32).collect()
    )
    # cum starts: 0,16,32,40,56,60 -> seq 0 holds all six chunks
    # (starts < 64) with 70 tokens: overflow beyond budget but < 64+16
    assert out == [(0, 6, 70)]

    d2 = _docs(spark, [(0, " ".join(f"a{i}" for i in range(80)))])  # 5 full chunks
    out2 = sorted(
        (r.seq_id, r.n_chunks, r.n_tokens)
        for r in sequence_pack(d2, width=16, budget=64, n_groups=32).collect()
    )
    # starts 0,16,32,48 -> seq 0 (64 toks exactly); start 64 -> seq 1
    assert out2 == [(0, 4, 64), (1, 1, 16)]


def test_media_context_nearest_preceding_mention(spark):
    from corhist_spark.extract import media_context_links

    d = _docs(
        spark,
        [
            # positions:  0      1       2       3         4
            (1, "filler mention zzz mediatoken9 after"),
            # mention at 1 within 4 of media at 3 -> linked; nothing after counts
            (2, "mediatoken9 mention"),  # no PRECEDING mention -> dropped
            (3, "mention a b c d mediatoken9"),  # distance 5 -> too far
            (4, "firstt secondd mediatoken9"),  # two mentions: nearest wins
        ],
    )
    got = {(r.doc_id, r.span_idx): r.context_mention
           for r in media_context_links(d).collect()}
    assert got == {(1, 3): "mention", (4, 2): "secondd"}


def test_corpus_ops_null_text_safe(spark):
    """NULL text must flow through every curation operator as an
    empty/dropped doc, never crash (size(NULL) = -1 in Spark — the
    n > 0 guards must hold)."""
    from corhist_spark.textops import sequence_pack

    d = spark.createDataFrame(
        [(1, None, "src1"), (2, "some real tokens here", "src2")],
        "doc_id long, text string, source string",
    )
    assert {r.doc_id for r in doc_chunks(d).collect()} == {2}
    assert {r.doc_id: r.n_chunks for r in chunk_dedup(d).collect()} == {2: 1}
    assert {(r.pack_group, r.n_chunks) for r in sequence_pack(d).collect()} == {(2, 1)}
    rs = {r.doc_id: r.dup_ngram_frac for r in repetition_stats(d).collect()}
    assert rs[1] == 0.0
    ss = stratified_sample(d).collect()  # must not throw; doc 1 hash is NULL-safe
    assert all(r.doc_id in (1, 2) for r in ss)


def test_sequence_pack_invariants_random(spark):
    """Random-corpus invariants: token totals are preserved, every
    sequence holds >= 1 chunk, and no sequence exceeds
    budget + width - 1 tokens (the bounded-overflow guarantee)."""
    import random

    from corhist_spark.textops import sequence_pack

    rng = random.Random(4242)
    rows = [
        (d, " ".join(f"d{d}w{i}" for i in range(rng.randint(0, 90))))
        for d in range(60)
    ]
    W, B = 16, 64
    out = sequence_pack(_docs(spark, rows), width=W, budget=B, n_groups=8).collect()
    total_tokens = sum(len([t for t in text.split(" ") if t]) for _, text in rows)
    assert sum(r.n_tokens for r in out) == total_tokens
    assert all(r.n_chunks >= 1 for r in out)
    assert max(r.n_tokens for r in out) <= B + W - 1
    # seq ids are dense from 0 within each pack group
    by_group = {}
    for r in out:
        by_group.setdefault(r.pack_group, []).append(r.seq_id)
    for g, ids in by_group.items():
        assert sorted(ids) == list(range(len(ids))), f"group {g}: {sorted(ids)}"


def test_unigram_nll_planted_frequencies(spark):
    import math

    from corhist_spark.textops import unigram_nll

    d = _docs(spark, [(1, "a a b"), (2, "b c")])
    # freq: a=2, b=2, c=1; total=5
    got = {r.doc_id: (r.n_tokens, r.mean_nll) for r in unigram_nll(d).collect()}
    # doc 1 tokens a,a,b all have tf=2 -> every term is -ln(2/5)
    want1 = round(-math.log(2 / 5), 6)
    want2 = round((-math.log(2 / 5) + -math.log(1 / 5)) / 2, 6)
    assert got[1] == (3, pytest.approx(want1, abs=1e-6))
    assert got[2] == (2, pytest.approx(want2, abs=1e-6))


def test_substring_decontaminate_planted_spans(spark):
    """Planted exact-substring contamination: a train doc embedding a
    74-char (window+stride-1) verbatim eval run MUST be flagged; a doc
    sharing only word-level overlap must not; span positions merge to
    distinct char counts."""
    from corhist_spark.textops import substring_decontaminate

    ev_text = "E" * 30 + "0123456789" * 12  # 150 chars
    shared = ev_text[40:114]  # 74 chars -> guaranteed detection
    train_rows = [
        (1, "x" * 37 + shared + "y" * 20),  # contaminated mid-doc
        (2, "0123456789 " * 10),            # word overlap only, no 50-char run
        (3, None),
        (4, "z" * 200),                     # clean long doc
    ]
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame([(7, ev_text)], "doc_id long, text string")
    got = {r.doc_id: r for r in substring_decontaminate(tr, ev).collect()}
    assert got[1].contaminated and got[1].n_matched_windows >= 1
    # matched windows cover at most the shared run plus stride slop
    assert 50 <= got[1].n_contaminated_chars <= 74 + 24
    for i in (2, 3, 4):
        assert not got[i].contaminated, i
        assert got[i].n_contaminated_chars == 0


def test_bigram_nll_planted_transitions(spark):
    """Hand-computed add-k bigram NLL: P(w2|w1) = (C(w1 w2)+k) /
    (C(w1 ·)+k·V), with C(w1 ·) the bigram-START count so the
    conditional normalizes; docs shorter than 2 tokens drop out."""
    import math

    from corhist_spark.textops import BIGRAM_ADD_K as k, bigram_nll

    d = _docs(spark, [(1, "a b a b"), (2, "a c"), (3, "x")])
    # bigrams: doc1 (a,b)(b,a)(a,b), doc2 (a,c)
    # C(a,b)=2 C(b,a)=1 C(a,c)=1; starts: C(a·)=3 C(b·)=1; V=4 (a,b,c,x)
    got = {r.doc_id: (r.n_bigrams, r.mean_nll) for r in bigram_nll(d).collect()}
    p_ab = (2 + k) / (3 + k * 4)
    p_ba = (1 + k) / (1 + k * 4)
    p_ac = (1 + k) / (3 + k * 4)
    want1 = round((-math.log(p_ab) * 2 + -math.log(p_ba)) / 3, 6)
    want2 = round(-math.log(p_ac), 6)
    assert got[1] == (3, pytest.approx(want1, abs=1e-6))
    assert got[2] == (1, pytest.approx(want2, abs=1e-6))
    assert 3 not in got  # single-token doc has no transition evidence


def test_source_mixing_temperature_flattening(spark):
    """alpha=0.5 mixing: the big source is downsampled, the small one
    would be upsampled (rate capped at 1.0)."""
    from corhist_spark.textops import source_mixing

    d = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(16)), "big"),
            (2, " ".join(f"b{i}" for i in range(4)), "small"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_mixing(d).collect()}
    # sqrt weights: 4/(4+2), 2/(4+2); budget = 20 tokens
    assert got["big"].weight == pytest.approx(4 / 6, abs=1e-6)
    assert got["small"].weight == pytest.approx(2 / 6, abs=1e-6)
    assert got["big"].rate == pytest.approx((4 / 6) * 20 / 16, abs=1e-6)  # 0.8333
    assert got["small"].rate == 1.0  # 1.667 capped
    assert got["big"].n_tokens == 16 and got["small"].n_docs == 1


def test_source_mixing_empty_source_is_zero_rate(spark):
    """A token-less source must yield (weight 0, rate 0) — not an ANSI
    DIVIDE_BY_ZERO crash."""
    from corhist_spark.textops import source_mixing

    d = spark.createDataFrame(
        [(1, " ".join(f"a{i}" for i in range(8)), "real"), (2, "", "empty"), (3, None, "empty")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_mixing(d).collect()}
    assert got["empty"].n_tokens == 0
    assert got["empty"].weight == 0.0 and got["empty"].rate == 0.0
    assert got["real"].weight == 1.0 and got["real"].rate == 1.0


def test_sketch_variants_match_exact_within_bounds(spark):
    """The 100 TB paths — HyperLogLog count-distinct and t-digest
    percentiles — stay within their error bounds of the exact answers
    the driver oracle pins."""
    from corhist_spark.textops import _token_array, token_cardinality

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r.source: r.n_distinct for r in token_cardinality(docs).collect()}
    toks = docs.select("source", F.explode(_token_array()).alias("tok"))
    approx = {
        r.source: r.n_approx
        for r in toks.groupBy("source")
        .agg(F.approx_count_distinct("tok", rsd=0.02).alias("n_approx"))
        .collect()
    }
    for s, n in exact.items():
        assert abs(approx[s] - n) <= max(3, 0.06 * n), (s, n, approx[s])

    n = F.size(_token_array())
    d = docs.select("source", n.alias("n_toks"))
    ex = {
        r.source: r.p90
        for r in d.groupBy("source").agg(F.percentile("n_toks", F.lit(0.9)).alias("p90")).collect()
    }
    ap = {
        r.source: r.p90
        for r in d.groupBy("source")
        .agg(F.approx_percentile("n_toks", F.lit(0.9), F.lit(10000)).alias("p90"))
        .collect()
    }
    # approx_percentile returns a discrete element while the exact form
    # interpolates; with 25 docs/source adjacent order stats are ~6
    # tokens apart, so the bound covers discretization + sketch error
    for s in ex:
        assert abs(ap[s] - ex[s]) <= max(8.0, 0.1 * ex[s]), (s, ex[s], ap[s])


def test_weighted_sample_matches_python_reference(spark):
    """Efraimidis-Spirakis top-k with deterministic hash uniforms —
    Spark result must equal a pure-Python replication exactly (set
    AND priorities), and longer docs must be overrepresented."""
    import hashlib as _hl
    import math as _m

    from corhist_spark.textops import weighted_sample

    # weights 1..60 (doc d has d tokens); doc 0 is empty -> excluded
    docs = spark.createDataFrame(
        [(d, " ".join(f"w{j}" for j in range(d))) for d in range(61)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["priority"])
        for r in weighted_sample(docs, k=20).collect()
    }
    scored = []
    for d in range(1, 61):
        h = int(_hl.md5(f"ws:{d}".encode()).hexdigest()[:13], 16)
        u = (h + 1) / float(1 << 52)
        scored.append((round(_m.log(u) / d, 9), -d))
    scored.sort(reverse=True)
    want_ids = {-d for _, d in scored[:20]}
    assert set(got) == want_ids
    for pr, negd in scored[:20]:
        assert got[-negd] == (-negd, pr)
    # weight bias: the sampled mean weight must exceed the population
    # mean (30.5) — heavier docs win the exponential race more often
    assert sum(w for w, _ in got.values()) / len(got) > 30.5
    # shuffle-free top-k: TakeOrdered, no global Sort exchange
    plan = weighted_sample(docs, k=20)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_tfidf_terms_vs_python(spark):
    import math as _m

    from corhist_spark.textops import tfidf_terms

    texts = {
        1: "apple banana apple cherry",
        2: "banana banana date",
        3: "apple date date date",
        4: "egg egg egg egg",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["token"]): (r["tf"], r["tfidf"])
        for r in tfidf_terms(docs, top_k=2).collect()
    }
    toks = {d: t.split() for d, t in texts.items()}
    n = len(toks)
    dfm: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            dfm[t] = dfm.get(t, 0) + 1
    want = {}
    for d, ts in toks.items():
        scored = sorted(
            (
                (round(ts.count(t) * _m.log(n / dfm[t]), 6), t)
                for t in set(ts)
            ),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        for s, t in scored:
            want[(d, t)] = (ts.count(t), s)
    assert got == want
    # 'egg' is unique to doc 4 and repeated: its idf = ln(4) tops
    assert got[(4, "egg")][1] == round(4 * _m.log(4.0), 6)


def test_cross_source_dups_planted(spark):
    from corhist_spark.textops import cross_source_dups

    rows = [
        # "shared-1" leaks into all three sources, "shared-2" into a+b;
        # each source also has private content, and exact dups WITHIN a
        # source must not inflate the pair counts (distinct per source)
        (1, "shared-1", "s_a"), (2, "shared-1", "s_b"), (3, "shared-1", "s_c"),
        (4, "shared-2", "s_a"), (5, "shared-2", "s_b"), (6, "shared-2", "s_b"),
        (7, "only-a", "s_a"), (8, "only-c", "s_c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in cross_source_dups(docs).collect()
    }
    assert got == {
        ("s_a", "s_b"): 2,
        ("s_a", "s_c"): 1,
        ("s_b", "s_c"): 1,
    }


def test_bloom_semi_join_no_false_negatives_and_python_exact(spark):
    """Bloom guarantee: every true key passes (no false negatives);
    with a deliberately saturated filter (128 bits, 30 keys * 4
    hashes) false positives occur and must match a pure-Python replay
    bit for bit."""
    import hashlib as _hl

    from corhist_spark.bloom import bloom_bitmap, bloom_member_keys

    keys = [f"k{i}" for i in range(0, 60, 2)]            # 30 member keys
    probe = keys + [f"p{i}" for i in range(200)]         # + 200 non-members
    n_bits, k = 128, 4  # saturated on purpose: ~39 FPs, python-verified

    def pos(key, i):
        return int(_hl.md5(f"bf{i}:{key}".encode()).hexdigest()[:13], 16) % n_bits

    words: dict[int, int] = {}
    for kk in keys:
        for i in range(k):
            p = pos(kk, i)
            words[p // 63] = words.get(p // 63, 0) | (1 << (p % 63))
    want = {
        kk for kk in probe
        if all(words.get(pos(kk, i) // 63, 0) >> (pos(kk, i) % 63) & 1 for i in range(k))
    }
    kdf = spark.createDataFrame([(s,) for s in keys], "kk string")
    pdf = spark.createDataFrame([(s,) for s in probe], "bf_key string")
    bitmap = bloom_bitmap(kdf, "kk", n_bits, k)
    got_words = {r["word"]: r["bits"] for r in bitmap.collect()}
    assert got_words == words  # bit-identical bitmap
    got = {r["bf_key"] for r in bloom_member_keys(pdf, bitmap, n_bits, k).collect()}
    assert got == want
    assert set(keys) <= got            # no false negatives, ever
    assert got - set(keys)             # the saturated filter DOES misfire


def test_new_op_invariants(spark):
    """Cheap structural invariants across the batch-3/4 operators:
    ES top-k nesting, quantile monotonicity across percentiles,
    TF-IDF non-negativity."""
    from corhist_spark.sketches import binned_quantiles
    from corhist_spark.textops import tfidf_terms, weighted_sample

    docs = spark.createDataFrame(
        [(d, " ".join(f"w{(d * 7 + j) % 50}" for j in range(1 + d % 37)))
         for d in range(1, 120)],
        "doc_id long, text string",
    )
    # Efraimidis-Spirakis: the top-k set is a PREFIX of the top-(k+10)
    # ranking — sampling more never changes who was already in
    s10 = {r["doc_id"] for r in weighted_sample(docs, k=10).collect()}
    s20 = {r["doc_id"] for r in weighted_sample(docs, k=20).collect()}
    assert s10 <= s20 and len(s10) == 10 and len(s20) == 20

    # binned quantiles: bins monotone in q, cumulative counts too
    rows = {r["q"]: r for r in binned_quantiles(
        docs.select(F.size(F.split("text", " ")).alias("v"))).collect()}
    assert rows[50]["bin_lo"] <= rows[90]["bin_lo"] <= rows[99]["bin_lo"]
    assert rows[50]["cum_count"] <= rows[90]["cum_count"] <= rows[99]["cum_count"]
    assert rows[99]["total_count"] == 119

    # tf-idf: every reported score is >= 0 (idf = ln(N/df) >= 0 since
    # df <= N) and tf >= 1
    for r in tfidf_terms(docs).collect():
        assert r["tfidf"] >= 0.0 and r["tf"] >= 1


def test_ngram_novelty_planted(spark):
    """Planted originality: a doc repeated verbatim scores 0 novelty,
    a fully unique doc scores 1, a half-copied doc in between; docs
    shorter than n tokens are absent."""
    from corhist_spark.textops import ngram_novelty

    shared = " ".join(f"s{i}" for i in range(8))        # one shared 8-gram
    uniq = " ".join(f"u{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, shared),                 # duplicated below -> novelty 0
            (2, shared),
            (3, uniq),                   # unique -> novelty 1
            (4, shared + " " + uniq),    # mixes both + bridge grams
            (5, "too short"),            # < 8 tokens -> absent
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["novel_frac"]) for r in ngram_novelty(docs).collect()}
    assert 5 not in got
    assert got[1] == (1, 0.0) and got[2] == (1, 0.0)
    # doc 3's single 8-gram also appears inside doc 4 -> shared, 0.0;
    # doc 4 has 9 grams: 'shared' (in 1,2,4), 'uniq' (in 3,4), and 7
    # unique bridge grams -> 7/9
    assert got[3] == (1, 0.0)
    assert got[4] == (9, round(7 / 9, 6))


def test_prefix_jaccard_join_vs_brute_force(spark):
    """Prefix filtering's no-false-negative guarantee: the PPJoin-style
    pair list must equal the brute-force all-pairs jaccard >= 0.6
    exactly (set AND scores) on a mixed corpus — near-dup pairs,
    disjoint docs, a shared boilerplate token (which must never enter
    anyone's prefix: it is the most frequent token)."""
    from corhist_spark.textops import prefix_jaccard_join

    texts = {
        1: "the quick brown fox jumps over lazy dog",
        2: "the quick brown fox jumps over lazy cat",    # ~0.8 vs 1
        3: "the quick brown fox jumps over lazy dog",    # dup of 1
        4: "the completely different tokens here now ok",
        5: "the quick brown fox jumps over happy dog",   # ~0.8 vs 1/3
        6: "the on its own",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["jaccard"])
        for r in prefix_jaccard_join(docs).collect()
    }
    sets = {d: set(t.split()) for d, t in texts.items()}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 1000 >= 600 * union:
                want[(a, b)] = (inter, round(inter / union, 6))
    assert got == want
    assert (1, 3) in got and got[(1, 3)][1] == 1.0   # exact dup found
    assert not any(4 in p or 6 in p for p in got)     # dissimilar absent


def test_span_corruption_reconstruction_and_determinism(spark):
    """Span corruption must be lossless: substituting each target span
    back over its sentinel in the input reproduces the original token
    stream exactly, sentinels number 0..n_spans-1 in order, and the
    mask equals the published md5('sc:<doc>:<g>') % SC_MOD rule.  Also
    pins the zero-shuffle claim (map-only plan, no Exchange)."""
    from corhist_spark.textops import SC_GROUP, SC_MOD, span_corruption

    texts = {
        1: " ".join(f"w{i}" for i in range(30)),   # exact group multiple
        2: " ".join(f"x{i}" for i in range(7)),    # ragged tail group
        3: "solo",                                  # single 1-token group
        4: "",                                      # empty: no groups
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {r.doc_id: r for r in span_corruption(docs).collect()}

    for doc_id, text in texts.items():
        toks = text.split()
        r = out[doc_id]
        n_grp = -(-len(toks) // SC_GROUP)
        mask = [
            int(hashlib.md5(f"sc:{doc_id}:{g}".encode()).hexdigest()[:13], 16)
            % SC_MOD == 0
            for g in range(n_grp)
        ]
        assert r.n_spans == sum(mask)
        # rebuild: walk the input, splice each sentinel's target span in
        spans = {}
        tgt = r.target_text.split()
        i = 0
        while i < len(tgt):
            assert tgt[i].startswith("<extra_id_")
            k = tgt[i]
            i += 1
            body = []
            while i < len(tgt) and not tgt[i].startswith("<extra_id_"):
                body.append(tgt[i])
                i += 1
            spans[k] = body
        rebuilt = []
        for tok in r.input_text.split():
            rebuilt.extend(spans[tok] if tok.startswith("<extra_id_") else [tok])
        assert rebuilt == toks, f"doc {doc_id} not reconstructable"
        # sentinel numbering is 0..n-1 in input order
        sent = [t for t in r.input_text.split() if t.startswith("<extra_id_")]
        assert sent == [f"<extra_id_{k}>" for k in range(r.n_spans)]

    plan = span_corruption(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "span_corruption must stay map-only"


def test_ccnet_buckets_tertile_invariants(spark):
    """Per language: bucket is monotone in mean_nll, and the histogram
    thresholds give head >= ceil(n/3) and head+middle >= ceil(2n/3)
    docs (the threshold bin joins the LOWER bucket by construction)."""
    import math as _math

    from corhist_spark.textops import ccnet_buckets

    rows = []
    # lang 'aa': 9 docs with distinct rarity profiles; lang 'bb': 5
    for i in range(9):
        rows.append((i, "common " * 20 + f"rare{i} " * (i + 1), "aa"))
    for i in range(5):
        rows.append((100 + i, "shared " * 10 + f"odd{i} " * (2 * i + 1), "bb"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = ccnet_buckets(docs).collect()
    rank = {"head": 0, "middle": 1, "tail": 2}
    for lang in ("aa", "bb"):
        sub = sorted((r for r in got if r.lang == lang), key=lambda r: r.mean_nll)
        n = len(sub)
        assert n == (9 if lang == "aa" else 5)
        # monotone: bucket rank never decreases as mean_nll grows
        ranks = [rank[r.bucket] for r in sub]
        assert ranks == sorted(ranks), f"{lang}: buckets not monotone in NLL"
        n_head = sum(1 for r in sub if r.bucket == "head")
        n_mid = sum(1 for r in sub if r.bucket == "middle")
        assert n_head >= _math.ceil(n / 3)
        assert n_head + n_mid >= _math.ceil(2 * n / 3)


def test_normalized_dedup_collapses_variants(spark):
    """Case/punctuation variants of the same content must share a
    normalized class (raw exact dedup keeps them apart), and distinct
    contents must not collapse."""
    from corhist_spark.textops import normalized_dedup

    d = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "The quick, brown FOX!"),
            (3, "the  quick   brown fox"),     # whitespace runs
            (4, "a different document"),
            (5, None),                          # NULL-safe
        ],
        "doc_id long, text string",
    )
    rows = normalized_dedup(d).collect()
    by_keep = {r.keep_doc_id: r for r in rows}
    assert by_keep[1].n_dups == 3 and by_keep[1].n_raw_variants == 3
    assert by_keep[4].n_dups == 1 and by_keep[4].n_raw_variants == 1
    assert 5 in by_keep  # NULL text is its own (null-hash) class


def test_quality_classifier_matches_python_reference(spark):
    """Inference must equal the pure-Python model: same hashed
    features, same md5 weight table, same mean->sigmoid."""
    import math as _math

    from corhist_spark.textops import (
        QC_BUCKETS,
        quality_classifier,
        quality_classifier_weights,
    )

    texts = {1: "alpha beta gamma", 2: "delta", 3: "alpha alpha beta", 4: ""}
    d = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_feats, r.score, r.keep)
        for r in quality_classifier(d, quality_classifier_weights(spark)).collect()
    }

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    want = {}
    for doc_id, text in texts.items():
        toks = text.split()
        if not toks:
            continue  # zero-token docs drop out
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        ws = [(h(f"qw:{h(f) % QC_BUCKETS}") % 2001 - 1000) / 1000.0 for f in feats]
        score = round(1.0 / (1.0 + _math.exp(-sum(ws) / len(ws))), 6)
        want[doc_id] = (len(feats), score, score >= 0.5)
    assert got == want


def test_kmv_source_overlap_exact_on_small_universe(spark):
    """With fewer distinct shingles than k the sketches hold the whole
    universe, so every estimate must be EXACT set arithmetic; the
    two-level top-k must equal the direct per-source top-k."""
    from corhist_spark.sketches import kmv_source_overlap

    # 16-char shingles: use 16+-char tokens so shingle sets are easy
    a = "aaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb"
    b = "bbbbbbbbbbbbbbbb cccccccccccccccc"
    d = spark.createDataFrame(
        [(1, a, "s1"), (2, b, "s2"), (3, a, "s3")],
        "doc_id long, text string, source string",
    )
    rows = {(r.source_a, r.source_b): r for r in kmv_source_overlap(d).collect()}
    assert set(rows) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}

    def shingles(t):
        return {t[i : i + 16] for i in range(max(len(t) - 15, 1))}

    sets = {"s1": shingles(a), "s2": shingles(b), "s3": shingles(a)}
    for (sa, sb), r in rows.items():
        inter = len(sets[sa] & sets[sb])
        union = len(sets[sa] | sets[sb])
        assert r.k_used == union          # under-full: whole universe kept
        assert r.n_common == inter
        assert r.est_union == union       # exact branch
        assert r.est_intersection == (inter * union) // union == inter
        assert abs(r.est_jaccard - round(inter / union, 6)) < 1e-9


def test_blocking_quality_planted(spark):
    """Scorecard must equal hand-computed metrics on a planted sample:
    truth from exact shingle jaccard >= 0.5, candidates a given list
    with one hit, one miss and one false positive."""
    from corhist_spark.textops import blocking_quality

    texts = {
        10: "abcdefghij",
        20: "abcdefghij",          # exact dup of 10 (true pair, jacc 1)
        30: "zzzzzyyyyyxxxxx",     # unrelated
        40: "abcdeXXXXX",          # small overlap with 10/20 (below 0.5)
    }
    d = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def sh(t):
        return {t[i:i + 5] for i in range(max(len(t) - 4, 1))}

    ids = sorted(texts)
    true_pairs = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if 1000 * len(sh(texts[a]) & sh(texts[b]))
        >= 500 * len(sh(texts[a]) | sh(texts[b]))
    }
    assert true_pairs == {(10, 20)}  # the planted geometry
    # candidates: the true pair, plus a false positive
    cand = spark.createDataFrame([(10, 20), (10, 30)], "doc_a long, doc_b long")
    r = blocking_quality(d, cand, sample_mod=10).collect()[0]
    assert (r.n_docs, r.n_true, r.n_cand, r.n_hit) == (4, 1, 2, 1)
    assert r.pairs_completeness == 1.0
    assert r.pairs_quality == 0.5
    assert r.reduction_ratio == round(1 - 2 / 6, 6)
    # empty candidate set: quality scores 1.0 by the P=1 convention
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    r0 = blocking_quality(d, empty, sample_mod=10).collect()[0]
    assert r0.n_cand == 0 and r0.pairs_quality == 1.0 and r0.pairs_completeness == 0.0


# ---- batch 15: zipf fit / collocation pmi / coref chains ----


def test_zipf_fit_matches_python_regression(spark):
    import math

    from corhist_spark.textops import zipf_fit

    # frequencies 8/4/2/1 for tokens a/b/c/d
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    row = zipf_fit(_docs(spark, [(1, text)])).collect()[0]
    assert (row["n_vocab"], row["n_tokens"], row["k_used"]) == (4, 15, 4)
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(n) for n in (8, 4, 2, 1)]
    k = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num, denx, deny = k * sxy - sx * sy, k * sxx - sx * sx, k * syy - sy * sy
    assert row["zipf_slope"] == round(num / denx, 6)
    assert row["zipf_r2"] == round(num * num / (denx * deny), 6)


def test_zipf_fit_uses_distributed_top_k(spark):
    from corhist_spark.textops import zipf_fit

    df = zipf_fit(_docs(spark, [(1, "a b a")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_collocations_matches_hand_pmi(spark):
    import math

    from corhist_spark.textops import collocations

    # 5 docs of "x y" -> bigram (x,y) 5 times, T=10 tokens, B=5 bigrams
    rows = collocations(_docs(spark, [(i, "x y") for i in range(5)])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["tok_a"], r["tok_b"], r["n_pair"]) == ("x", "y", 5)
    # pmi = ln((5/5) * (10/5) * (10/5)) = ln 4
    assert r["pmi"] == round(math.log((5 / 5) * (10 / 5) * (10 / 5)), 6)


def test_collocations_threshold_prunes_rare_pairs(spark):
    from corhist_spark.textops import collocations

    rows = collocations(
        _docs(spark, [(1, "x y"), (2, "x y"), (3, "p q")]), min_pair=2
    ).collect()
    assert [(r["tok_a"], r["tok_b"]) for r in rows] == [("x", "y")]


def test_mention_coref_chain_profile(spark):
    from corhist_spark.textops import mention_coref

    # abcdef corefers (2 mentions), ghijkl is a singleton; short
    # tokens are not mentions at all
    row = mention_coref(
        _docs(spark, [(1, "abcdef tiny abcdef ghijkl")])
    ).collect()[0]
    assert (row["n_mentions"], row["n_chains"], row["max_chain"]) == (3, 1, 2)
    assert row["singleton_ratio"] == 0.5


def test_tokenizer_fertility_buckets_and_ratios(spark):
    from corhist_spark.textops import tokenizer_fertility

    # doc 1: 3/4 stopword tokens -> en; 11 chars over 4 tokens
    # doc 2: no stopwords -> und; 4 chars over 2 tokens
    rows = {
        r["lang_pred"]: r
        for r in tokenizer_fertility(
            _docs(spark, [(1, "the a and abcd"), (2, "zz yy")])
        ).collect()
    }
    en, und = rows["en"], rows["und"]
    assert (en["n_docs"], en["n_tokens"], en["n_chars"]) == (1, 4, 11)
    assert en["chars_per_token"] == 2.75 and en["tokens_per_doc"] == 4.0
    assert (und["n_docs"], und["n_tokens"], und["n_chars"]) == (1, 2, 4)
    assert und["chars_per_token"] == 2.0

    plan = tokenizer_fertility(_docs(spark, [(1, "x")]))._jdf.queryExecution()
    s = plan.executedPlan().toString()
    assert "BatchEvalPython" not in s and "CartesianProduct" not in s


def test_term_burstiness_cf_over_df(spark):
    from corhist_spark.textops import term_burstiness

    rows = {
        r["tok"]: r
        for r in term_burstiness(
            _docs(spark, [(1, "x x y"), (2, "x")])
        ).collect()
    }
    assert (rows["x"]["cf"], rows["x"]["df"], rows["x"]["burstiness"]) == (3, 2, 1.5)
    assert (rows["y"]["cf"], rows["y"]["df"], rows["y"]["burstiness"]) == (1, 1, 1.0)

    df = term_burstiness(_docs(spark, [(1, "x")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_topic_assignment_argmax_and_ties(spark):
    from corhist_spark.textops import topic_assignment

    rows = {
        r["doc_id"]: r
        for r in topic_assignment(
            _docs(
                spark,
                [
                    (1, "scan hash merge join"),   # exec 3 vs rel 1
                    (2, "join scan"),              # 1-1 tie -> execution
                    (3, "verbs only here"),        # no seeds -> other
                    (4, ""),                       # empty -> other, 0.0
                    (5, "table column row join"),  # storage 3 beats rel 1
                ],
            )
        ).collect()
    }
    assert (rows[1]["topic"], rows[1]["n_hits"]) == ("execution", 3)
    assert rows[1]["score"] == 0.75
    assert rows[2]["topic"] == "execution"  # tie -> alphabetically first
    assert (rows[3]["topic"], rows[3]["n_hits"], rows[3]["score"]) == ("other", 0, 0.0)
    assert rows[4]["topic"] == "other"
    assert rows[5]["topic"] == "storage"

    plan = (
        topic_assignment(_docs(spark, [(1, "x")]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # one map-side projection, zero shuffles


def test_nll_spikes_matches_python_windows(spark):
    import math

    from corhist_spark.textops import nll_spikes

    # corpus: "a a b" -> cf(a)=2, cf(b)=1, T=3
    row = nll_spikes(_docs(spark, [(1, "a a b")]), window=2).collect()[0]
    nll_a, nll_b = -math.log(2 / 3), -math.log(1 / 3)
    # full windows: (a,a) and (a,b); pos-2 partial window excluded
    assert row["n_windows"] == 2
    assert row["max_window_nll"] == round((nll_a + nll_b) / 2, 6)


def test_nll_spikes_short_doc_keeps_single_window(spark):
    import math

    from corhist_spark.textops import nll_spikes

    row = nll_spikes(_docs(spark, [(1, "a b")]), window=16).collect()[0]
    assert row["n_windows"] == 1
    assert row["max_window_nll"] == round(
        (-math.log(1 / 2) - math.log(1 / 2)) / 2, 6
    )


def test_oov_rates_against_corpus_head(spark):
    from corhist_spark.textops import oov_rates

    rows = {
        r["doc_id"]: r
        for r in oov_rates(
            _docs(spark, [(1, "x x y"), (2, "y z"), (3, "")]), vocab_k=1
        ).collect()
    }
    # top-1 vocab = x (cf 2, tie vs y broken by token asc)
    assert (rows[1]["n_toks"], rows[1]["n_oov"]) == (3, 1)
    assert rows[1]["oov_rate"] == round(1 / 3, 6)
    assert (rows[2]["n_oov"], rows[2]["oov_rate"]) == (2, 1.0)
    assert (rows[3]["n_toks"], rows[3]["oov_rate"]) == (0, 0.0)


def test_char_entropy_matches_python(spark):
    import math

    from corhist_spark.textops import char_entropy

    rows = {
        r["doc_id"]: r
        for r in char_entropy(
            _docs(spark, [(1, "aab"), (2, "aaaa"), (3, "")])
        ).collect()
    }
    want = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert rows[1]["n_chars"] == 3 and rows[1]["entropy"] == round(want, 6)
    assert rows[2]["entropy"] == 0.0  # single-char doc: -1*ln(1) = 0
    assert (rows[3]["n_chars"], rows[3]["entropy"]) == (0, 0.0)


def test_comention_graph_caps_and_pmi(spark):
    import math

    from corhist_spark.textops import comention_graph

    # aabbbb+ccdddd co-mentioned in 3 docs; eeffff appears alone
    docs = _docs(
        spark,
        [(i, "aabbbb x ccdddd") for i in range(3)] + [(9, "eeffff")],
    )
    rows = comention_graph(docs, min_pair=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["mention_a"], r["mention_b"], r["n_docs_pair"]) == (
        "aabbbb", "ccdddd", 3,
    )
    # pmi = ln((3/3) * (4/3))
    assert r["pmi"] == round(math.log((3 / 3) * (4 / 3)), 6)


def test_weak_labels_votes(spark):
    from corhist_spark.textops import weak_labels

    # 15 tokens, 3 stopword hits (30 >= 15), all counts 1 (share 1/15)
    good = " ".join(["the", "a", "and"] + [f"w{i}" for i in range(12)])
    repetitive = " ".join(["the"] * 12)  # top share 100% -> rep vote fails
    short = "the a and"
    rows = {
        r["doc_id"]: r
        for r in weak_labels(
            _docs(spark, [(1, good), (2, repetitive), (3, short), (4, "")])
        ).collect()
    }
    assert rows[1]["keep"] and rows[1]["n_pass"] == 3
    assert rows[2]["lang_ok"] and rows[2]["len_ok"] and not rows[2]["rep_ok"]
    assert not rows[3]["len_ok"] and not rows[3]["keep"]
    assert rows[4]["n_pass"] == 1 and not rows[4]["keep"]  # 0>=0 lang vote

    plan = (
        weak_labels(_docs(spark, [(1, "x")]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # one map-side projection, zero shuffles


def test_leakage_safe_split_keeps_clusters_together(spark):
    import hashlib

    from corhist_spark.textops import leakage_safe_split

    surv = spark.createDataFrame(
        [(1, 1, False), (2, 1, True), (3, 3, False), (4, 4, False)],
        "doc_id long, survivor long, is_dup boolean",
    )
    rows = {r["doc_id"]: r["split"] for r in leakage_safe_split(surv).collect()}
    # cluster {1, 2} shares a survivor -> identical split
    assert rows[1] == rows[2]
    for doc, s in ((1, 1), (3, 3), (4, 4)):
        h = int(hashlib.md5(f"split:{s}".encode()).hexdigest()[:13], 16) % 10
        assert rows[doc] == ("test" if h == 0 else "train")


def test_split_leakage_audit_counts_crossings(spark):
    import hashlib

    from corhist_spark.textops import split_leakage_audit

    def side(d):
        return int(hashlib.md5(f"split:{d}".encode()).hexdigest()[:13], 16) % 10 == 0

    # find one crossing and one non-crossing pair deterministically
    test_doc = next(d for d in range(1000) if side(d))
    train_a, train_b = [d for d in range(1000) if not side(d)][:2]
    pairs = spark.createDataFrame(
        [(train_a, test_doc), (train_a, train_b)], "doc_a long, doc_b long"
    )
    row = split_leakage_audit(pairs, None).collect()[0]
    assert (row["n_pairs"], row["n_cross"]) == (2, 1)
    assert row["leak_rate"] == 0.5


def test_hash_doc_vectors_match_python(spark):
    import hashlib

    from corhist_spark.textops import hash_doc_vectors

    text = "alpha beta alpha gamma"
    row = hash_doc_vectors(
        _docs(spark, [(1, text), (2, "")])
    ).collect()
    rows = {r["doc_id"]: r for r in row}
    want = [0] * 16
    for tok in text.split():
        h = int(hashlib.md5(f"fh:{tok}".encode()).hexdigest()[:13], 16)
        want[h % 16] += 1 if (h // 16) % 2 == 0 else -1
    assert [rows[1][f"f{i}"] for i in range(16)] == want
    assert all(rows[2][f"f{i}"] == 0 for i in range(16))  # empty doc


def test_source_drift_identical_source_has_zero_drift(spark):
    from corhist_spark.textops import source_drift

    # source A == corpus half 1, source B disjoint vocabulary
    d = spark.createDataFrame(
        [(1, "A", "x y x z"), (2, "B", "p q p r")],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in source_drift(d).collect()}
    # both sources diverge equally from the pooled corpus here
    assert rows["A"]["l1_drift"] == rows["B"]["l1_drift"] > 0
    # one-source corpus: drift exactly 0
    one = spark.createDataFrame(
        [(1, "A", "x y"), (2, "A", "x z")], "doc_id long, source string, text string"
    )
    assert source_drift(one).collect()[0]["l1_drift"] == 0.0


# ---- batch 34: signal correlations / FIM transform ----


def test_signal_correlations_perfect_and_degenerate(spark):
    from corhist_spark.textops import signal_correlations

    # n_chars = 2*n_tok - 1 exactly (single-char tokens) -> r = 1.0;
    # no digits anywhere -> digit_pm has zero variance -> r IS NULL
    docs = _docs(spark, [(i, " ".join(["a"] * k)) for i, k in enumerate([1, 2, 3, 5])])
    rows = {(r.sig_a, r.sig_b): r for r in signal_correlations(docs).collect()}
    assert rows[("n_chars", "n_tok")].r == 1.0
    assert rows[("n_chars", "n_tok")].n == 4
    for k, r in rows.items():
        if "digit_pm" in k:
            assert r.r is None
    assert len(rows) == 6  # 4 signals -> 6 unordered pairs


def test_fim_conserves_tokens_and_split_bounds(spark):
    from corhist_spark.textops import FIM_MIN_TOKENS, fim_pairs

    texts = {
        i: " ".join(f"t{i}w{j}" for j in range(3 + (i % 9))) for i in range(40)
    }
    docs = _docs(spark, list(texts.items()))
    out = {r.doc_id: r for r in fim_pairs(docs).collect()}
    assert len(out) == 40
    n_applied = 0
    for i, text in texts.items():
        toks = text.split()
        r = out[i]
        if r.fim_applied:
            n_applied += 1
            assert len(toks) >= FIM_MIN_TOKENS
            # all three parts non-empty, counts partition the doc
            assert r.n_prefix >= 1 and r.n_middle >= 1 and r.n_suffix >= 1
            assert r.n_prefix + r.n_middle + r.n_suffix == len(toks)
            # PSM rearrangement conserves the token multiset
            body = r.text_out
            assert body.startswith("<PRE> ")
            pre, rest = body[len("<PRE> "):].split(" <SUF> ", 1)
            suf, mid = rest.split(" <MID> ", 1)
            assert sorted(pre.split() + mid.split() + suf.split()) == sorted(toks)
            # deterministic reassembly in PSM order
            assert pre.split() == toks[: r.n_prefix]
            assert mid.split() == toks[r.n_prefix : r.n_prefix + r.n_middle]
            assert suf.split() == toks[r.n_prefix + r.n_middle :]
        else:
            assert r.text_out == text
            assert r.n_prefix == r.n_middle == r.n_suffix == 0
    # the hash-selected half: some applied, some not
    assert 0 < n_applied < 40


def test_fim_is_map_only_and_rerun_deterministic(spark):
    from corhist_spark.textops import fim_pairs

    docs = _docs(spark, [(i, "a b c d e f") for i in range(8)])
    df = fim_pairs(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle at all
    assert "BatchEvalPython" not in plan
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, fim_pairs(docs.repartition(5)).collect()))
    assert a == b  # partitioning-independent (hash-in-place-of-RNG)


# ---- batch 35: session trajectories / packing efficiency ----


def test_user_sessions_partition_events_and_respect_gap(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    out = entry_mod.q_user_sessions(spark, sf).collect()
    # sessions partition the event stream exactly
    assert sum(r.n_events for r in out) == ev.count()
    by_user = {}
    for r in out:
        assert r.duration_s == r.end_s - r.start_s >= 0
        assert 1 <= r.n_event_types <= r.n_events
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.session_id)
        # session ids are dense 1..k and consecutive sessions are
        # separated by MORE than the 30-min gap
        assert [r.session_id for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert b.start_s - a.end_s > 1800


def test_packing_efficiency_buckets_partition_sequences(spark):
    import __spark_entry__ as entry_mod
    from corhist_spark.textops import CHUNK_TOKENS, PACK_GROUPS

    sf = "/root/testdata/sf0.001"
    packed = entry_mod.q_sequence_pack(spark, sf)
    out = entry_mod.q_packing_efficiency(spark, sf).collect()
    assert sum(r.n_seqs for r in out) == packed.count()
    # one final sequence per non-empty pack group
    n_groups = packed.select("pack_group").distinct().count()
    assert sum(r.n_final_seqs for r in out) == n_groups <= PACK_GROUPS
    for r in out:
        assert 0 <= r.fill_bucket <= 4
        # overflow is bounded by width-1 per sequence (chunks are
        # never split)
        assert r.overflow_tokens <= (CHUNK_TOKENS - 1) * r.n_seqs
        if r.fill_bucket == 4:
            assert r.avg_fill_pct >= 100.0


# ---- batch 37: fuzzy decontamination / hard negatives ----


def _split_docs(spark, train_rows, eval_rows):
    tr = _docs(spark, train_rows)
    ev = _docs(spark, eval_rows)
    return tr, ev


# the fixture perturbs by PREFIX DELETION only: the repo's banded
# minhash takes every band's minimum at the SAME arg-min shingle
# (the band transforms are monotone in the shingle hash), so a
# deletion that keeps the min shingle (here ' w07 ' at char 27)
# guarantees the LSH collision while additions could steal the min
_FUZZY_BASE = " ".join(f"w{i:02d}" for i in range(40)) + " "


def test_fuzzy_decontaminate_flags_near_copy_only(spark):
    from corhist_spark.textops import fuzzy_decontaminate

    near = _FUZZY_BASE[: int(len(_FUZZY_BASE) * 0.8)]   # jaccard ~0.795
    other = "totally different words entirely unrelated content here " * 4
    tr, ev = _split_docs(
        spark,
        [(1, near), (2, other)],
        [(7, _FUZZY_BASE)],
    )
    out = {r.doc_id: r for r in fuzzy_decontaminate(tr, ev).collect()}
    assert set(out) == {1, 2}
    assert out[1].contaminated and out[1].max_jaccard >= 0.5
    assert not out[2].contaminated
    # the report covers EVERY train doc, including candidate-free ones
    assert out[2].n_candidates == 0 and out[2].max_jaccard == 0.0


def test_hard_negatives_excludes_duplicates_and_ranks(spark):
    from corhist_spark.textops import hard_negatives

    near = _FUZZY_BASE[: int(len(_FUZZY_BASE) * 0.8)]   # ~0.795 -> excluded
    part = _FUZZY_BASE[: int(len(_FUZZY_BASE) * 0.4)]   # ~0.385 -> negative
    tr, ev = _split_docs(spark, [(1, near), (2, part)], [(7, _FUZZY_BASE)])
    rows = hard_negatives(tr, ev).collect()
    # the near-duplicate is NOT a negative; the partial-overlap doc is
    ids = {(r.query_id, r.neg_id) for r in rows}
    assert (7, 1) not in ids
    assert (7, 2) in ids
    for r in rows:
        assert r.jaccard < 0.5 and r.rank >= 1


# ---- batch 38: quality survivors / source repeat plan ----


def test_quality_survivors_keep_best_not_first(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    qs = {r.doc_id: r for r in entry_mod.q_quality_survivors(spark, sf).collect()}
    ds = {r.doc_id: r for r in entry_mod.q_dedup_survivors(spark, sf).collect()}
    assert set(qs) == set(ds)
    # same clustering: exactly one kept doc per cluster, and the
    # survivor is a member of its own cluster
    by_cluster = {}
    for r in qs.values():
        by_cluster.setdefault(r.cluster, []).append(r)
    for rows in by_cluster.values():
        kept = [r for r in rows if r.is_kept]
        assert len(kept) == 1
        assert kept[0].doc_id == kept[0].survivor
        assert all(r.survivor == kept[0].doc_id for r in rows)
    # the min-doc policy and the quality policy agree on cluster
    # MEMBERSHIP but may disagree on the survivor
    for i, r in qs.items():
        assert (ds[i].survivor == ds[i].doc_id) == (
            ds[i].is_dup is False
        )


def test_source_repeat_factors_plan_arithmetic(spark):
    import __spark_entry__ as entry_mod
    from corhist_spark.textops import MAX_REPEAT_EPOCHS

    rows = entry_mod.q_source_repeat_factors(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_full_epochs <= MAX_REPEAT_EPOCHS
        assert 0 <= r.partial_per_1000 <= 999
        # capped plan never exceeds the raw factor
        assert r.n_full_epochs + r.partial_per_1000 / 1000.0 <= r.raw_factor + 1e-6
    # the mixture must upsample at least one low-resource source
    assert any(r.raw_factor > 1.0 for r in rows)


# ---- batch 39: distant-supervision exports ----


def test_distant_re_pairs_label_only_linked_kg_edges(spark):
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_distant_re_pairs(spark, sf).collect()
    assert rows  # the fixture yields labeled pairs
    el1 = {
        r.mention: r.candidate for r in entry_mod._el_top1(spark, sf).collect()
    }
    tr = {
        (r.subj, r.pred, r.obj)
        for r in entry_mod._typed_kg_edges(spark, sf).distinct().collect()
    }
    for r in rows:
        # entities are exactly the top-1 links of their mentions
        assert el1[r.mention_a] == r.entity_a
        assert el1[r.mention_b] == r.entity_b
        # every labeled pair is backed by a real typed edge in the
        # claimed direction
        if r.direction == "fwd":
            assert (r.entity_a, r.pred, r.entity_b) in tr
        else:
            assert r.direction == "bwd"
            assert (r.entity_b, r.pred, r.entity_a) in tr
        assert r.n_docs_pair >= 3  # comention min support


def test_distant_ner_labels_subset_of_spans(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    labeled = entry_mod.q_distant_ner_labels(spark, sf).collect()
    assert labeled
    spans = {
        (r.doc_id, r.start, r.end, r.surface)
        for r in entry_mod.q_ner_spans(spark, sf).collect()
    }
    el1 = {
        r.mention: r.candidate for r in entry_mod._el_top1(spark, sf).collect()
    }
    for r in labeled:
        assert (r.doc_id, r.start, r.end, r.surface) in spans
        assert el1[r.surface] == r.entity


# ---- batch 41: SOP pairs / hierarchy profile ----


def test_sop_pairs_balance_and_token_identity(spark):
    from corhist_spark.textops import sop_pairs

    # 3 docs x 64 tokens -> 3 consecutive pairs per doc
    docs = _docs(
        spark,
        [(i, " ".join(f"d{i}t{j}" for j in range(64))) for i in range(12)],
    )
    rows = sop_pairs(docs).collect()
    assert len(rows) == 12 * 3
    labels = [r.label for r in rows]
    assert 0 < sum(labels) < len(labels)  # hash split produces both classes
    for r in rows:
        a, b = r.text_a.split(), r.text_b.split()
        doc_toks = [f"d{r.doc_id}t{j}" for j in range(64)]
        lo = r.first_chunk * 16
        in_order = doc_toks[lo : lo + 16] == a and doc_toks[lo + 16 : lo + 32] == b
        swapped = doc_toks[lo : lo + 16] == b and doc_toks[lo + 16 : lo + 32] == a
        # label 1 <=> document order, label 0 <=> swapped
        assert (r.label == 1 and in_order) or (r.label == 0 and swapped)
    # deterministic under repartitioning
    again = sop_pairs(docs.repartition(5)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hierarchy_profile_binary_tree_depths(spark):
    import __spark_entry__ as entry_mod

    rows = {r.depth: r for r in entry_mod.q_hierarchy_profile(
        spark, "/root/testdata/sf0.001").collect()}
    assert rows
    # on the partkey binary tree, depth counts halve going up:
    # each level-d class has d ancestors, and class counts per depth
    # follow the tree shape (roughly doubling with depth)
    depths = sorted(rows)
    assert depths[0] >= 1
    total_classes = sum(r.n_classes for r in rows.values())
    # every class in the closure appears exactly once
    clo = entry_mod.q_subclass_closure(spark, "/root/testdata/sf0.001")
    assert total_classes == clo.select("cls").distinct().count()


# ---- batch 42: MLM masking plan / datasheet ----


def test_mlm_masks_rates_and_actions(spark):
    from corhist_spark.textops import mlm_masks

    docs = _docs(
        spark,
        [(i, " ".join(f"t{j}" for j in range(200))) for i in range(20)],
    )
    rows = mlm_masks(docs).collect()
    n_positions = 20 * 200
    # ~15% selection rate (hash-uniform; generous band)
    assert 0.10 * n_positions < len(rows) < 0.20 * n_positions
    acts = {"mask": 0, "random": 0, "keep": 0}
    for r in rows:
        acts[r.action] += 1
        if r.action == "mask":
            assert r.replacement == "[MASK]"
        elif r.action == "keep":
            assert r.replacement == r.token
        else:
            # random replacement is a real token of the same doc
            assert r.replacement.startswith("t")
        assert 0 <= r.token_idx < 200
    # 80/10/10 shape: mask dominates, both minor actions present
    assert acts["mask"] > acts["random"] > 0
    assert acts["keep"] > 0
    # map-only plan
    df = mlm_masks(docs)
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_datasheet_single_row_consistency(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    row = entry_mod.q_datasheet(spark, sf).collect()[0]
    assert row.n_docs == d.count()
    assert row.n_sources == d.select("source").distinct().count()
    assert 0 <= row.en_per_1000 <= 1000
    assert 0.0 <= row.mean_quality <= 1.0
    assert abs(row.mean_doc_tokens * row.n_docs - row.n_tokens) < 1.0


# ---- batch 44: blocklist filter / FD mining ----


def test_blocklist_filter_counts_and_keep(spark):
    from corhist_spark.textops import blocklist_filter

    docs = _docs(
        spark,
        [
            (1, "fast clean table scan"),
            (2, "slow error slow scan"),
            (3, "drop the drop now"),
        ],
    )
    out = {r.doc_id: r for r in blocklist_filter(docs).collect()}
    assert out[1].keep and out[1].n_blocked_tokens == 0
    assert out[1].first_term is None
    r2 = out[2]
    assert not r2.keep and r2.n_blocked_tokens == 3  # slow x2 + error
    assert r2.n_blocked_terms == 2 and r2.first_term == "error"
    r3 = out[3]
    assert r3.n_blocked_tokens == 2 and r3.first_term == "drop"
    # map-only plan
    df = blocklist_filter(docs)
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_fd_mining_key_determines_everything(spark):
    import __spark_entry__ as entry_mod

    rows = {
        (r.det, r.dep): r
        for r in entry_mod.q_fd_mining(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(rows) == 12  # 4 columns, ordered pairs
    # the primary key determines every other column ...
    for dep in ("o_custkey", "o_orderstatus", "o_orderpriority"):
        assert rows[("o_orderkey", dep)].fd_holds
    # ... and no low-cardinality column determines the key
    for det in ("o_orderstatus", "o_orderpriority"):
        assert not rows[(det, "o_orderkey")].fd_holds
    for r in rows.values():
        assert r.n_pair >= r.n_det  # distinct pairs never fewer


# ---- batch 45: funnel conversion / retention cohorts ----


def test_funnel_rates_invariants(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_funnel_rates(spark, sf).collect()
    assert rows
    sess = entry_mod.q_user_sessions(spark, sf)
    n_sessions = sess.count()
    for r in rows:
        assert r.step_a != r.step_b
        assert 0 < r.n_a_then_b <= r.n_sessions_a <= n_sessions
        assert 0.0 < r.rate <= 1.0
    # A-then-B and B-then-A are disjoint within a session (strict
    # first-occurrence order): their sum can't exceed the sessions
    # containing both steps (bounded by the smaller side)
    by = {(r.step_a, r.step_b): r for r in rows}
    for (a, b), r in by.items():
        rev = by.get((b, a))
        if rev is not None:
            assert r.n_a_then_b + rev.n_a_then_b <= min(
                r.n_sessions_a, rev.n_sessions_a
            )


def test_retention_cohorts_conservation(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    rows = entry_mod.q_retention_cohorts(spark, sf).collect()
    assert rows
    # every event lands in exactly one (cohort, offset) cell
    assert sum(r.n_events for r in rows) == ev.count()
    # offset 0 exists for every cohort and every user appears there
    zero = {r.cohort_day: r for r in rows if r.offset_day == 0}
    assert set(zero) == {r.cohort_day for r in rows}
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in zero.values()) == n_users
    for r in rows:
        assert r.offset_day >= 0 and r.n_users >= 1


# ---- batch 46: preference pairs / trajectory patterns ----


def test_preference_pairs_opposite_halves_and_gap(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_preference_pairs(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.chosen != r.rejected
        assert r.gap_micro == r.chosen_q_micro - r.rejected_q_micro
        assert r.gap_micro >= entry_mod.MIN_PREF_GAP_MICRO
    # opposite-halves pairing: each doc is chosen at most once and
    # rejected at most once per topic
    assert len({(r.topic, r.chosen) for r in rows}) == len(rows)
    assert len({(r.topic, r.rejected) for r in rows}) == len(rows)


def test_trajectory_patterns_support_and_shape(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_trajectory_patterns(spark, sf).collect()
    assert rows
    ev_types = {
        r.event_type
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .select("event_type").distinct().collect()
    }
    for r in rows:
        steps = r.pattern.split(">")
        assert len(steps) == 3 and all(s in ev_types for s in steps)
        assert r.n_occurrences >= entry_mod.TRAJ_MIN_SUPPORT
        assert 1 <= r.n_users <= r.n_occurrences


# ---- batch 47: correction SFT pairs / predicate value drift ----


def test_edit_instruction_pairs_cover_corrections(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    pairs = entry_mod.q_edit_instruction_pairs(spark, sf).collect()
    assert pairs
    corr = entry_mod._eval_corrections(spark, sf)
    # one distinct pair per distinct correction content
    assert len(pairs) <= corr.count()
    for r in pairs:
        assert r.instruction.startswith(f"fix {r.constraint_id} violation on (")
        # response is a sorted '; '-joined list of op(subj,pred,obj)
        stmts = r.response.split("; ")
        assert stmts == sorted(stmts)
        for s in stmts:
            assert s.endswith(")") and s.split("(")[0] in ("add", "del")


def test_predicate_value_drift_bounds_and_symmetric_halves(spark):
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_predicate_value_drift(spark, sf).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tv_ppm <= 1000000  # total variation in [0, 1]
        assert r.t1 > 0 and r.t2 > 0
    # halves partition the add stream
    edits, _r, _s = entry_mod._hist(spark, sf)
    n_adds = edits.filter(F.col("op") == "add").count()
    assert sum(r.t1 + r.t2 for r in rows) == n_adds


# ---- batch 48: water-filling mixture / negative-sampling table ----


def test_mixture_waterfill_level_and_fairness(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_mixture_waterfill(spark, sf).collect()
    assert rows
    budget = rows[0].budget
    level = rows[0].water_level
    total = sum(r.n_tok for r in rows)
    assert budget == total // 2
    # every row carries the same level; alloc = min(n_tok, level)
    for r in rows:
        assert r.budget == budget and r.water_level == level
        assert r.alloc_tok == min(r.n_tok, level)
        assert r.capped == (r.n_tok > level)
    # the budget is met up to integer-DIV slack bounded by the
    # source count, never exceeded
    alloc = sum(r.alloc_tok for r in rows)
    assert 0 <= budget - alloc < len(rows)
    # budget < total, so at least one source must be truncated
    assert any(r.capped for r in rows)
    # max-min fairness: no capped source ends below an uncapped one
    uncapped_max = max((r.alloc_tok for r in rows if not r.capped), default=0)
    for r in rows:
        if r.capped:
            assert r.alloc_tok >= uncapped_max


def test_neg_sampling_table_ranges_and_weights(spark):
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_neg_sampling_table(spark, sf).collect()
    assert rows
    assert all(0 <= r.bucket < entry_mod.NEG_TABLE_BUCKETS for r in rows)
    # per bucket: contiguous disjoint [lo, hi) ranges covering the mass
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r.lo)
        assert rs[0].lo == 0
        for prev, cur in zip(rs, rs[1:]):
            assert cur.lo == prev.hi
        assert rs[-1].hi == rs[0].bucket_mass_micro
        assert all(r.hi - r.lo == r.w_micro for r in rs)
    # ^0.75 weights: sublinear in count, order-preserving
    import math

    for r in rows:
        assert r.w_micro == math.floor(r.cnt**0.75 * 1_000_000)
        assert r.w_micro <= r.cnt * 1_000_000
    # counts reconcile with the corpus token count
    d = spark.read.parquet(f"{sf}/documents.parquet")
    n_tok = d.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != "")))
    ).first()[0]
    assert sum(r.cnt for r in rows) == n_tok


# ---- batch 49: edit-distance verify / vocab coverage curve ----


def test_edit_distance_verify_covers_candidates(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_edit_distance_verify(spark, sf).collect()
    assert rows
    # one verdict per candidate pair, no invented pairs
    cand = {
        (r.doc_a, r.doc_b)
        for r in entry_mod.q_lsh_candidates(spark, sf).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} == cand
    for r in rows:
        assert 0 <= r.edit_dist <= r.max_len
        assert r.dist_per_1000 == (1000 * r.edit_dist) // r.max_len
        assert r.is_dup == (
            r.dist_per_1000 <= entry_mod.EDIT_VERIFY_PER_1000
        )


def test_vocab_coverage_monotone_log_spaced(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        entry_mod.q_vocab_coverage(spark, sf).collect(),
        key=lambda r: r.vocab_size,
    )
    assert rows
    # power-of-two sizes plus the full vocabulary as the last point
    for r in rows[:-1]:
        assert r.vocab_size & (r.vocab_size - 1) == 0
    assert rows[-1].coverage_ppm == 1_000_000
    # coverage and cumulative mass strictly increase; counts
    # non-increasing along the ranking
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens > a.cum_tokens
        assert b.coverage_ppm >= a.coverage_ppm
        assert b.cnt <= a.cnt


# ---- batch 50: inclusion-dependency discovery / LSH recall audit ----


def test_inclusion_deps_finds_fk_structure(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = {
        (r.col_a, r.col_b): r
        for r in entry_mod.q_inclusion_deps(spark, sf).collect()
    }
    assert rows
    # the warehouse's real FK INDs must be discovered
    for a, b in [
        ("nation.n_regionkey", "region.r_regionkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
    ]:
        assert rows[(a, b)].is_ind, (a, b)
        assert rows[(a, b)].containment_ppm == 1_000_000
    # discovery is selective: overlapping-but-not-contained pairs
    # exist (e.g. a key column vs a small attribute domain), so not
    # every reported pair is an IND
    assert any(not r.is_ind for r in rows.values())
    assert not rows[("part.p_partkey", "part.p_size")].is_ind
    # per-row arithmetic invariants
    for r in rows.values():
        assert 0 < r.n_common <= min(r.n_a, r.n_b)
        assert r.containment_ppm == (1_000_000 * r.n_common) // r.n_a
        assert r.is_ind == (r.n_common == r.n_a)


def test_lsh_recall_gate(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_lsh_recall(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.jaccard >= 0.6
    # 8 independent bands at J>=0.6 collide w.p. ~1-0.4^8 per pair —
    # UNCAPPED banding recall must be total; the production path's
    # measured recall is lower exactly by the occupancy cap's cost
    # (the tiny synthetic vocabulary concentrates min-shingles into
    # hot buckets: measured 0.68 capped vs 1.00 uncapped at sf0.001
    # — surfacing that cost is what this audit is FOR)
    recall = sum(1 for r in rows if r.hit) / len(rows)
    assert recall >= 0.5, recall
    from corhist_spark.textops import lsh_candidates

    uncapped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidates(
            entry_mod._signatures(spark, sf), max_bucket=10**9
        ).collect()
    }
    assert all((r.doc_a, r.doc_b) in uncapped for r in rows)


# ---- batch 51: DoReMi-step domain weights / output-shard manifest ----


def test_doremi_weights_update_rule(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = entry_mod.q_doremi_weights(spark, sf).collect()
    assert len(rows) >= 2
    # weights form a distribution (integer-floor sums just under 1e6)
    s = sum(r.weight_ppm for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000
    # the multiplicative update preserves the baseline ORDERING only
    # up to excess: a source with zero excess keeps weight <= its
    # baseline share scaled by the normalizer; any source with
    # positive excess must be upweighted RELATIVE to a zero-excess
    # source (weight/base ratio strictly larger)
    for r in rows:
        assert r.excess_micro >= 0
        assert r.weight_ppm > 0
    zero = [r for r in rows if r.excess_micro == 0]
    pos = [r for r in rows if r.excess_micro > 0]
    if zero and pos:
        worst_zero = max(r.weight_ppm / r.base_share_ppm for r in zero)
        best_pos = min(r.weight_ppm / r.base_share_ppm for r in pos)
        assert best_pos > worst_zero


def test_shard_manifest_two_phase_equals_naive_window(spark):
    import __spark_entry__ as entry_mod
    from pyspark.sql import Window, functions as F

    sf = "/root/testdata/sf0.001"
    got = entry_mod.q_shard_manifest(spark, sf)
    # naive single-window reference on the same input
    d = entry_mod._t(spark, sf, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = t.withColumn("go", F.sum("n_tokens").over(w) - F.col("n_tokens")).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"go DIV {entry_mod.SHARD_TOKEN_BUDGET}").alias("shard_id"),
        F.expr(f"go % {entry_mod.SHARD_TOKEN_BUDGET}").alias("shard_offset"),
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, ref.collect()))
    assert a == b
    # shard structure: per source, shard ids start at 0 and are
    # contiguous; offsets stay under the budget
    rows = sorted(got.collect(), key=lambda r: (r.source, r.doc_id))
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert rs[0].shard_id == 0 and rs[0].shard_offset == 0
        for x in rs:
            assert 0 <= x.shard_offset < entry_mod.SHARD_TOKEN_BUDGET
        ids = [x.shard_id for x in rs]
        assert ids == sorted(ids)
        assert set(range(max(ids) + 1)) == set(ids)


# ---- batch 52: Kneser-Ney continuation statistics ----


def test_kn_continuation_exact_vs_pure_python(spark):
    """Bit-exact equality with a pure-Python KN on a corpus where
    continuation and raw frequency genuinely diverge ('francisco'
    is frequent but always follows 'san')."""
    from corhist_spark.textops import kn_continuation, KN_DISCOUNT_PPM

    docs = [
        (1, "san francisco is in california"),
        (2, "san francisco san francisco bay"),
        (3, "the bay near san francisco"),
        (4, "the city is big"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.w1, r.w2): r for r in kn_continuation(df).collect()}

    # pure-Python reference with the same integer ppm order
    from collections import Counter, defaultdict

    bg = Counter()
    for _, text in docs:
        toks = [t for t in text.split(" ") if t]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    c_w1, n1p_right, n1p_left = Counter(), Counter(), Counter()
    for (a, b), c in bg.items():
        c_w1[a] += c
        n1p_right[a] += 1
        n1p_left[b] += 1
    T = len(bg)
    assert len(got) == T
    for (a, b), c in bg.items():
        r = got[(a, b)]
        assert (r.c_bigram, r.c_w1, r.n1p_right) == (c, c_w1[a], n1p_right[a])
        p_cont = (1_000_000 * n1p_left[b]) // T
        assert r.p_cont_ppm == p_cont
        want = max(c * 1_000_000 - KN_DISCOUNT_PPM, 0) // c_w1[a] + (
            ((KN_DISCOUNT_PPM * n1p_right[a]) // c_w1[a]) * p_cont
        ) // 1_000_000
        assert r.p_kn_ppm == want
    # the KN signature: 'francisco' has high raw count but only ONE
    # left type, so its continuation prob equals that of singletons
    assert got[("san", "francisco")].c_bigram >= 3
    assert got[("san", "francisco")].p_cont_ppm == 1_000_000 // T


def test_kn_plan_stays_jvm_side(spark):
    from corhist_spark.textops import kn_continuation

    df = spark.createDataFrame(
        [(i, "a b c a b d") for i in range(20)], "doc_id long, text string"
    )
    plan = kn_continuation(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ---- batch 53: unique-key discovery ----


def test_key_discovery_verdicts(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    rows = {(r.table_name, r.key_cols): r for r in entry_mod.q_key_discovery(spark, sf).collect()}
    assert len(rows) == len(entry_mod.KEY_CANDIDATES)
    # known primary keys must verify (the synthetic lineitem does NOT
    # make (l_orderkey, l_linenumber) unique — a finding, not a bug)
    assert rows[("orders", "o_orderkey")].is_key
    assert rows[("customer", "c_custkey")].is_key
    assert rows[("events", "event_id")].is_key
    # known non-keys must not, and their ppm must be consistent
    nk = rows[("customer", "c_nationkey")]
    assert not nk.is_key
    assert nk.distinct_ppm == (1_000_000 * nk.n_distinct) // nk.n_rows
    # lattice monotonicity: a superset candidate is at least as
    # distinct as its single-column prefix
    lo = rows[("lineitem", "l_orderkey")]
    comp = rows[("lineitem", "l_orderkey,l_linenumber")]
    assert not lo.is_key and lo.n_distinct < lo.n_rows
    assert comp.n_distinct >= lo.n_distinct


# ---- batch 54: split-conformal thresholds ----


def test_conformal_thresholds_exact_vs_pure_python(spark, tmp_path):
    """Planted corpus with known topics and quality: the engine's
    per-class (k, threshold, coverage) must equal a pure-Python
    split-conformal computation on the same md5 split."""
    import hashlib
    import math
    import pandas as pd
    import __spark_entry__ as entry_mod
    from corhist_spark.textops import TOPIC_SEEDS

    seeds0 = TOPIC_SEEDS[0][1]  # ('scan', 'hash', 'merge', 'sort')
    rows = []
    for i in range(60):
        # vary lexical diversity so quality (and thus s) spreads
        uniq = 2 + (i % 7)
        toks = [seeds0[0]] + [f"w{j % uniq}" for j in range(9)]
        rows.append({"doc_id": i, "text": " ".join(toks),
                     "source": "s", "lang": "en"})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    got = {
        r.topic: r
        for r in entry_mod.q_conformal_thresholds(spark, str(tmp_path)).collect()
    }

    # pure-Python replica
    def split_is_cal(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:13], 16) % 2 == 0

    def q_micro(toks):
        n, u = len(toks), len(set(toks))
        return round(round(min(1.0, n / 50.0) * (u / n), 6) * 1_000_000)

    per_topic = {}
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t]
        # every doc contains one seed of topic 0 -> topic 'execution'
        per_topic.setdefault("execution", []).append(
            (r["doc_id"], -q_micro(toks), split_is_cal(r["doc_id"]))
        )
    alpha = entry_mod.CONFORMAL_ALPHA_PCT
    for topic, docs in per_topic.items():
        cal = sorted((s, d) for d, s, c in docs if c)
        ev = [(d, s) for d, s, c in docs if not c]
        n_cal = len(cal)
        k = min(n_cal, ((n_cal + 1) * (100 - alpha) + 99) // 100)
        thr = cal[k - 1][0]
        cov = (1_000_000 * sum(1 for _, s in ev if s <= thr)) // len(ev)
        r = got[topic]
        assert (r.n_cal, r.k, r.threshold_nc) == (n_cal, k, thr)
        assert (r.n_eval, r.coverage_ppm) == (len(ev), cov)
        # the conformal promise holds on the planted data
        assert r.coverage_ppm >= (100 - alpha) * 10_000 - 100_000


# ---- batch 55: robust per-source median/MAD stats ----


def test_robust_source_stats_exact_vs_pure_python(spark):
    """Planted per-source quality sets: odd and even counts (lower
    median), a zero-MAD degenerate source, and one planted outlier
    that only the MAD gate should flag."""
    from corhist_spark.textops import robust_source_stats, MAD_K

    data = {
        # odd n, clear outlier: med=100, MAD=10, |900-100|=800 > 30
        "a": [90, 100, 110, 120, 900],
        # even n: lower median of [10,20,30,40] = 20
        "b": [40, 10, 30, 20],
        # constant source: MAD = 0 -> every deviation > 0 is an outlier
        "c": [55, 55, 55, 42],
    }
    rows = [
        (f"{s}{i}", s, v)
        for s, vals in data.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, q_micro long")
    got = {r.source: r for r in robust_source_stats(df).collect()}

    def lower_median(vs):
        vs = sorted(vs)
        return vs[(len(vs) + 1) // 2 - 1]

    for s, vals in data.items():
        med = lower_median(vals)
        mad = lower_median([abs(v - med) for v in vals])
        outliers = sum(1 for v in vals if abs(v - med) > MAD_K * mad)
        r = got[s]
        assert (r.n_docs, r.median_q_micro, r.mad_micro) == (len(vals), med, mad)
        assert r.n_outliers == outliers
        assert r.outlier_ppm == (1_000_000 * outliers) // len(vals)
    assert got["a"].n_outliers == 1
    # the zero-MAD source flags its single deviating doc
    assert got["c"].mad_micro == 0 and got["c"].n_outliers == 1


# ---- batch 56: LSH band-parameter sweep ----


def test_lsh_band_tuning_s_curve_semantics(spark):
    """Planted similarity spectrum: near-duplicates must be caught by
    every setting; low-similarity pairs must be caught more by flat
    (r=2) than steep (r=8) banding — the S-curve ordering."""
    from corhist_spark.textops import lsh_band_tuning, LSH_TUNE_SETTINGS

    # doc pairs with high / medium / low character-5-gram overlap
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " x"),                      # near-dup of 1
            (3, "completely different text " + "z " * 18),
            (4, "completely different words " + "z " * 18),  # mid sim to 3
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    rows = {(r.r, r.b): r for r in lsh_band_tuning(docs, pairs).collect()}
    assert set(rows) == set(LSH_TUNE_SETTINGS)
    for (r, b), row in rows.items():
        assert row.n_pairs == 2
        assert 0 <= row.caught_micro <= 2_000_000
        # s50 monotone: steeper r -> higher threshold
    s50s = [rows[s].s50_ppm for s in ((2, 8), (4, 4), (8, 2))]
    assert s50s == sorted(s50s)
    # flat banding catches at least as much expected mass as steep
    assert rows[(2, 8)].caught_micro >= rows[(8, 2)].caught_micro


def test_band_capture_sql_matches_python(spark):
    """The shared square-chain SQL equals the pure-Python S-curve at
    integer ppm for a grid of similarities and all settings."""
    from corhist_spark.textops import band_capture_ppm_sql, LSH_TUNE_SETTINGS

    grid = [0, 1, 137000, 250000, 500000, 600000, 750000, 999999, 1000000]
    df = spark.createDataFrame([(s,) for s in grid], "s_ppm long")
    for r, b in LSH_TUNE_SETTINGS:
        got = {
            row.s_ppm: row.p
            for row in df.selectExpr(
                "s_ppm", band_capture_ppm_sql("s_ppm", r, b) + " AS p"
            ).collect()
        }
        for s in grid:
            x = s / 1_000_000
            want = round((1 - (1 - x**r) ** b) * 1_000_000)
            assert got[s] == want, (r, b, s)


# ---- batch 56: nDCG retrieval eval ----


def test_ndcg_eval_exact_vs_pure_python(spark):
    """Hand-built ranking with known relevance: nDCG must equal the
    pure-Python computation on the shared gain table, including the
    perfect-ranking = 1e6 ppm identity."""
    from corhist_spark.retrieval import ndcg_eval, NDCG_GAIN_MICRO

    scores = spark.createDataFrame(
        [(i, round(1.0 - i * 0.05, 6)) for i in range(1, 13)],
        "doc_id long, bm25 double",
    )
    # relevant docs at ranks 1, 3, 4, 11 (11 is outside top-10)
    rel = spark.createDataFrame(
        [(i, 1 if i in (1, 3, 4, 11) else 0) for i in range(1, 13)],
        "doc_id long, rel int",
    )
    got = {r.k: r for r in ndcg_eval(scores, rel, ks=(5, 10)).collect()}
    for k in (5, 10):
        hits = [i for i in (1, 3, 4, 11) if i <= k]
        dcg = sum(NDCG_GAIN_MICRO[i - 1] for i in hits)
        idcg = sum(NDCG_GAIN_MICRO[: min(k, 4)])
        r = got[k]
        assert (r.n_ranked, r.n_rel_total, r.n_rel_at_k) == (k, 4, len(hits))
        assert (r.dcg_micro, r.idcg_micro) == (dcg, idcg)
        assert r.ndcg_ppm == (1_000_000 * dcg) // idcg
    # perfect ranking: relevant docs occupy the top ranks exactly
    rel_perfect = spark.createDataFrame(
        [(i, 1 if i <= 3 else 0) for i in range(1, 13)],
        "doc_id long, rel int",
    )
    rp = {r.k: r for r in ndcg_eval(scores, rel_perfect, ks=(5,)).collect()}
    assert rp[5].ndcg_ppm == 1_000_000


def test_ndcg_ranking_is_distributed_topk(spark):
    """The ranking stage must plan as TakeOrderedAndProject (a
    distributed top-k), never a global Sort over the scored set."""
    from corhist_spark.retrieval import ndcg_eval

    scores = spark.createDataFrame(
        [(i, float(i % 97) / 97) for i in range(500)], "doc_id long, bm25 double"
    )
    rel = spark.createDataFrame(
        [(i, i % 5 == 0) for i in range(500)], "doc_id long, rel boolean"
    ).select("doc_id", F.col("rel").cast("int").alias("rel"))
    plan = ndcg_eval(scores, rel)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ---- batch 57: PRA path features, loss-masked SFT packing ----


def test_pra_path_features_exact_vs_pure_python(spark):
    """Planted 8-edge graph with one 2-hop path type: precision /
    recall ppm must match the hand computation, and the cardinality
    gate must drop the 2-hop type when the cap is below its exact
    composed-path count."""
    from corhist_spark.fusion import pra_path_features

    edges = spark.createDataFrame(
        [
            ("a", "P0", "b"), ("c", "P0", "d"),
            ("a", "P1", "b"), ("e", "P1", "f"),
            ("a", "P2", "x"), ("c", "P2", "y"),
            ("x", "P3", "b"), ("y", "P3", "z"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {
        (r.path, r.hops): r
        for r in pra_path_features(edges, target="P0").collect()
    }
    # positives {(a,b),(c,d)}; P1 connects {(a,b),(e,f)}; the only
    # composable 2-hop type is P2/P3 with pairs {(a,b),(c,z)}
    expect = {
        ("P1", 1): (2, 1, 500000, 500000),
        ("P2", 1): (2, 0, 0, 0),
        ("P3", 1): (2, 0, 0, 0),
        ("P2/P3", 2): (2, 1, 500000, 500000),
    }
    assert set(rows) == set(expect)
    for k, (n_pairs, n_hits, prec, rec) in expect.items():
        r = rows[k]
        assert (r.n_pairs, r.n_hits, r.prec_ppm, r.rec_ppm) == (
            n_pairs, n_hits, prec, rec,
        ), k
    # the gate works on the EXACT composed-path count (2 for P2/P3):
    # cap 1 excludes it before any enumeration
    gated = pra_path_features(edges, target="P0", path_cap=1).collect()
    assert all(r.hops == 1 for r in gated)


def test_sft_pack_masks_exact_vs_pure_python(spark):
    """Planted examples with known token counts: sequence cuts, mask
    totals and the md5 layout hash must match the pure-Python pack."""
    from corhist_spark.textops import sft_pack_masks

    pairs = spark.createDataFrame(
        [
            ("c1", 0, "fix a b", "add x"),
            ("c1", 2, "fix c", "del y z"),
            ("c2", 4, "fix d e f g", "add q"),
            ("c1", 1, "fix h", "del r"),
            ("c3", 3, "fix i j", "add s t u v w"),
        ],
        "constraint_id string, corr_rev long, instruction string,"
        " response string",
    )
    got = {
        (r.pack_group, r.seq_id): r
        for r in sft_pack_masks(pairs, budget=10, n_groups=2).collect()
    }

    def h(layout):
        return hashlib.md5(layout.encode()).hexdigest()

    # group 0 order: (c1,0) 3+2, (c1,2) 2+3, (c2,4) 5+2 (starts at
    # token 10 -> second sequence); group 1: (c1,1) 2+2, (c3,3) 3+6
    # (starts at 4, overflows the 10-token budget -- never split)
    expect = {
        (0, 0): (2, 10, 5, 5, 500000, h("0:3:2;5:2:3")),
        (0, 1): (1, 7, 5, 2, 285714, h("0:5:2")),
        (1, 0): (2, 13, 5, 8, 615384, h("0:2:2;4:3:6")),
    }
    assert set(got) == set(expect)
    for k, (n_ex, n_tok, n_mask, n_train, ppm, mh) in expect.items():
        r = got[k]
        assert (
            r.n_examples, r.n_tokens, r.n_masked, r.n_trained,
            r.trained_ppm, r.mask_hash,
        ) == (n_ex, n_tok, n_mask, n_train, ppm, mh), k


def test_ul2_plan_exact_vs_pure_python(spark):
    """Planted docs across all three paradigms and the edge sizes:
    paradigm assignment, S-split bounds, integer corruption budgets
    and span counts must match the md5 replication."""
    from corhist_spark.textops import ul2_plan, UL2_MEAN_SPAN, UL2_RATE_PCT

    rows = [(i, " ".join(f"w{j}" for j in range(i % 7 * 10))) for i in range(40)]
    got = {r.doc_id: r for r in ul2_plan(_docs(spark, rows)).collect()}

    def h(doc_id, tag):
        return int(hashlib.md5(f"{doc_id}{tag}".encode()).hexdigest()[:13], 16)

    seen = set()
    for doc_id, text in rows:
        n_tok = len([t for t in text.split(" ") if t])
        b = h(doc_id, ":ul2d") % 4
        den = "R" if b <= 1 else ("S" if b == 2 else "X")
        seen.add(den)
        r = got[doc_id]
        assert (r.denoiser, r.task_token, r.n_tokens) == (den, f"[{den}]", n_tok)
        if den == "S":
            if n_tok >= 2:
                pref = 1 + h(doc_id, ":ul2s") % (n_tok - 1)
                assert 1 <= pref < n_tok
            else:
                pref = n_tok
            corrupt, spans = n_tok - pref, (1 if n_tok - pref > 0 else 0)
        else:
            pref = 0
            corrupt = (n_tok * UL2_RATE_PCT[den]) // 100
            spans = max(1, corrupt // UL2_MEAN_SPAN[den]) if corrupt > 0 else 0
        assert (r.prefix_len, r.n_corrupt, r.n_spans) == (pref, corrupt, spans), doc_id
    assert seen == {"R", "S", "X"}
    # empty docs get zero budgets everywhere
    empty = [r for r in got.values() if r.n_tokens == 0]
    assert empty and all(r.n_corrupt == 0 and r.n_spans == 0 for r in empty)


# ---- batch 59: Feistel epoch permutation, curriculum staging ----


def test_feistel_order_bijective_and_exact(spark):
    """The permutation must be a bijection on the id set per epoch,
    differ between epochs, and match the pure-Python md5 Feistel."""
    from corhist_spark.textops import (
        feistel_order,
        FEISTEL_HALF_BITS,
        FEISTEL_ROUNDS,
    )

    ids = list(range(200)) + [2**31, 2**32 - 1]
    d = spark.createDataFrame([(i, "") for i in ids], "doc_id long, text string")
    got = {}
    for r in feistel_order(d).collect():
        got[(r.epoch, r.doc_id)] = r.perm_key

    mask = (1 << FEISTEL_HALF_BITS) - 1

    def feistel(x, epoch):
        left, right = x >> FEISTEL_HALF_BITS, x & mask
        for r in range(FEISTEL_ROUNDS):
            f = (
                int(
                    hashlib.md5(f"{epoch}:{r}:{right}".encode()).hexdigest()[:13],
                    16,
                )
                & mask
            )
            left, right = right, left ^ f
        return (left << FEISTEL_HALF_BITS) | right

    for (epoch, doc_id), v in got.items():
        assert v == feistel(doc_id, epoch), (epoch, doc_id)
    for epoch in (0, 1):
        keys = [got[(epoch, i)] for i in ids]
        assert len(set(keys)) == len(ids)  # injective on the id set
        assert all(0 <= k < 2**32 for k in keys)
    # epochs genuinely reshuffle
    assert [got[(0, i)] for i in ids] != [got[(1, i)] for i in ids]


def test_curriculum_stages_exact_vs_pure_python(spark):
    """Planted quality ties: difficulty must count STRICTLY higher
    quality docs, stages must follow the competence constants, and
    every doc must appear exactly once."""
    from corhist_spark.textops import (
        curriculum_stages,
        CURRICULUM_COMPETENCE_PM,
    )

    # 10 docs: q = 900k x3 (easiest), 500k x4, 100k x3
    qs = [900000] * 3 + [500000] * 4 + [100000] * 3
    scored = spark.createDataFrame(
        list(enumerate(qs)), "doc_id long, q_micro long"
    )
    got = {r.doc_id: r for r in curriculum_stages(scored).collect()}
    assert len(got) == 10
    n = len(qs)
    for doc_id, q in enumerate(qs):
        higher = sum(1 for x in qs if x > q)
        diff = (1000 * higher) // n
        stage = next(
            (
                t + 1
                for t, c in enumerate(CURRICULUM_COMPETENCE_PM)
                if diff < c
            ),
            4,
        )
        r = got[doc_id]
        assert (r.q_micro, r.difficulty_pm, r.stage) == (q, diff, stage), doc_id
    # the three tiers land in stages 1 (0pm), 1 (300pm), 2 (700pm)
    assert [got[0].stage, got[3].stage, got[7].stage] == [1, 1, 2]


def test_cardinality_qerror_exact_vs_pure_python(spark):
    """Planted correlated graph: the independence estimate must be
    exactly n_a*n_b DIV n_ent, the actual the exact path count, and
    the q-error the integer cross-division (including the
    NULL-on-zero and direction conventions)."""
    from corhist_spark.fusion import cardinality_qerror

    # A-edges fan into m; B-edges leave m (correlated: every A meets
    # every B at m, far above the independence estimate)
    edge_list = (
        [(f"a{i}", "A", "m") for i in range(4)]
        + [("m", "B", f"b{i}") for i in range(3)]
        + [("x", "C", "y")]
    )
    df = spark.createDataFrame(edge_list, "subj string, pred string, obj string")
    got = {(r.pred_a, r.pred_b): r for r in cardinality_qerror(df).collect()}
    ents = {s for s, _, _ in edge_list} | {o for _, _, o in edge_list}
    n_ent = len(ents)
    n = {"A": 4, "B": 3, "C": 1}
    paths = {("A", "B"): 4 * 3}  # all compositions via m
    assert len(got) == 9
    for pa in n:
        for pb in n:
            r = got[(pa, pb)]
            est = (n[pa] * n[pb]) // n_ent
            actual = paths.get((pa, pb), 0)
            assert (r.n_a, r.n_b, r.n_ent, r.est_paths, r.n_paths) == (
                n[pa], n[pb], n_ent, est, actual,
            ), (pa, pb)
            if est > 0 and actual > 0:
                assert r.q_error_ppm == max(
                    (1_000_000 * est) // actual, (1_000_000 * actual) // est
                )
            else:
                assert r.q_error_ppm is None
            assert r.underestimated == (est < actual)
    # the correlated pair is underestimated by the independence model
    assert got[("A", "B")].underestimated


# ---- batch 61: in-context coherent packing, mixing-policy ledger ----


def test_icp_pack_coherence_lift(spark):
    """Planted two-topic corpus in alternating ingest order: the
    topic-coherent ordering must strictly raise adjacent-same-topic
    coherence, and totals must be invariant across orderings."""
    from corhist_spark.textops import icp_pack

    # alternating topics, all docs in pack_group 0 (doc_id % 32 == 0)
    rows = []
    for i in range(8):
        doc_id = i * 32
        seeds = "join join join" if i % 2 == 0 else "poem poem poem"
        rows.append((doc_id, seeds + " " + " ".join(f"w{doc_id}x{j}" for j in range(13))))
    got = icp_pack(_docs(spark, rows), width=16, budget=64).collect()
    by = {}
    for r in got:
        by.setdefault(r.ordering, []).append(r)
    for o in ("ingest", "topic_coherent"):
        assert sum(r.n_chunks for r in by[o]) == 8
        assert sum(r.n_tokens for r in by[o]) == 8 * 16
    def coh(o):
        rs = by[o]
        return sum(r.n_adj_same_topic for r in rs)
    # alternating ingest order: zero same-topic adjacency; coherent
    # order: only the one topic boundary breaks adjacency per sequence
    assert coh("topic_coherent") > coh("ingest")


def test_mix_policy_ledger_exact_vs_pure_python(spark):
    """Three sources with known token counts (incl. one perfect
    square): allocations must match the integer formulas and the
    isqrt correction must be exact."""
    from corhist_spark.textops import mix_policy_ledger, MIX_BUDGET_TOKENS
    import math

    # token counts: s0 -> 100 (perfect square), s1 -> 50, s2 -> 7
    def doc(i, src, n):
        return (i, src, " ".join("w" for _ in range(n)))

    d = spark.createDataFrame(
        [doc(0, "s0", 100), doc(1, "s1", 50), doc(2, "s2", 7)],
        "doc_id long, source string, text string",
    )
    got = {(r.policy, r.source): r for r in mix_policy_ledger(d).collect()}
    n = {"s0": 100, "s1": 50, "s2": 7}
    sq = {s: math.isqrt(v) for s, v in n.items()}
    b = MIX_BUDGET_TOKENS
    t_all, sq_all = sum(n.values()), sum(sq.values())
    assert len(got) == 9
    for s, v in n.items():
        assert got[("uniform", s)].alloc_tokens == b // 3
        assert got[("proportional", s)].alloc_tokens == (b * v) // t_all
        assert got[("sqrt_damped", s)].alloc_tokens == (b * sq[s]) // sq_all
        for p in ("uniform", "proportional", "sqrt_damped"):
            r = got[(p, s)]
            assert r.n_tokens == v
            assert r.repeat_pm == (1000 * r.alloc_tokens) // v
    # sqrt damping over-repeats the small source less than uniform but
    # more than proportional
    assert (
        got[("proportional", "s2")].repeat_pm
        < got[("sqrt_damped", "s2")].repeat_pm
        < got[("uniform", "s2")].repeat_pm
    )


def test_dawid_skene_step_exact_and_flips(spark):
    """Planted ensemble with one labeler anti-correlated with the
    majority: the integer naive-Bayes re-vote must match the pure
    Python replication and flip at least one pattern."""
    from corhist_spark.fusion import (
        dawid_skene_step,
        DS_CLAMP_LO,
        DS_CLAMP_HI,
    )

    # lang/len mostly agree (the real signal); rep votes almost
    # randomly and is wrong on a big block, so DS should discount it
    rows = []
    i = 0
    def add(n, lang, ln, rep):
        nonlocal i
        for _ in range(n):
            rows.append((i, lang, ln, rep)); i += 1
    add(40, True, True, True)
    add(25, True, True, False)   # rep disagrees with strong pair
    add(20, False, False, False)
    add(10, False, False, True)  # rep disagrees again
    add(5, True, False, True)
    votes = spark.createDataFrame(
        rows, "doc_id long, lang_ok boolean, len_ok boolean, rep_ok boolean"
    )
    got = {
        (r.lang_ok, r.len_ok, r.rep_ok): r
        for r in dawid_skene_step(votes).collect()
    }

    # pure-Python replication
    from collections import Counter
    pats = Counter((l, n, p) for _, l, n, p in rows)
    maj = {k: int(sum(k) * 2 >= 3) for k in pats}
    n1 = sum(v for k, v in pats.items() if maj[k] == 1)
    n0 = sum(v for k, v in pats.items() if maj[k] == 0)
    clamp = lambda x: min(DS_CLAMP_HI, max(DS_CLAMP_LO, x))
    p1, p0 = {}, {}
    for j in range(3):
        p1[j] = clamp(1000 * sum(v for k, v in pats.items() if maj[k] == 1 and k[j]) // n1)
        p0[j] = clamp(1000 * sum(v for k, v in pats.items() if maj[k] == 0 and k[j]) // n0)
    prior = clamp(1000 * n1 // (n1 + n0))
    flipped_any = False
    for k, n in pats.items():
        s1 = prior
        s0 = 1000 - prior
        for j in range(3):
            s1 *= p1[j] if k[j] else 1000 - p1[j]
            s0 *= p0[j] if k[j] else 1000 - p0[j]
        corrected = int(s1 >= s0)
        r = got[k]
        assert (r.n_docs, r.majority_label, r.score1, r.score0,
                r.corrected_label, r.flipped) == (
            n, maj[k], s1, s0, corrected, corrected != maj[k]), k
        flipped_any |= corrected != maj[k]
    assert len(got) == len(pats)


# ---- batch 63: Poisson bootstrap, Borda rank aggregation ----


def test_poisson_bootstrap_exact_vs_pure_python(spark):
    """Hash-weight draws and weighted means must match the md5
    replication exactly, and the empirical weight distribution must
    be Poisson(1)-shaped (mean ~1)."""
    from corhist_spark.textops import (
        poisson_bootstrap,
        BOOTSTRAP_B,
        POISSON1_T52,
    )

    scored = spark.createDataFrame(
        [(i, (i * 37) % 1000001) for i in range(300)],
        "doc_id long, q_micro long",
    )
    got = {r.b: r for r in poisson_bootstrap(scored).collect()}

    def w(doc_id, b):
        u = int(
            hashlib.md5(f"{doc_id}:boot:{b}".encode()).hexdigest()[:13], 16
        )
        for k, t in enumerate(POISSON1_T52):
            if u < t:
                return k
        return len(POISSON1_T52)

    assert set(got) == set(range(BOOTSTRAP_B))
    total_w = 0
    for b in range(BOOTSTRAP_B):
        ws = [(w(i, b), (i * 37) % 1000001) for i in range(300)]
        n_eff = sum(x for x, _ in ws)
        total_w += n_eff
        mean = sum(x * q for x, q in ws) // n_eff if n_eff else None
        r = got[b]
        assert (r.n_docs, r.n_eff, r.mean_q_micro) == (300, n_eff, mean), b
    # Poisson(1): average weight ~1 (loose band, deterministic draws)
    avg = total_w / (300 * BOOTSTRAP_B)
    assert 0.85 < avg < 1.15


def test_borda_quality_rank_exact_vs_pure_python(spark):
    """Planted signals with deliberate rank disagreements and ties:
    per-signal strictly-better counts and the per-mille Borda score
    must match pure Python."""
    from corhist_spark.textops import borda_quality_rank, BORDA_SIGNALS

    rows = [
        # doc_id, q_micro, n_tok, ttr_pm  (doc 0 best quality but
        # shortest; doc 3 ties doc 2 on quality)
        (0, 900, 5, 100),
        (1, 500, 50, 900),
        (2, 700, 20, 500),
        (3, 700, 30, 500),
        (4, 100, 40, 700),
    ]
    d = spark.createDataFrame(rows, "doc_id long, q_micro long, n_tok long, ttr_pm long")
    got = {r.doc_id: r for r in borda_quality_rank(d).collect()}
    n = len(rows)
    cols = {s: i + 1 for i, s in enumerate(BORDA_SIGNALS)}
    for doc in rows:
        better = {
            s: sum(1 for o in rows if o[cols[s]] > doc[cols[s]])
            for s in BORDA_SIGNALS
        }
        total = sum(better.values())
        pm = (1000 * (3 * (n - 1) - total)) // (3 * (n - 1))
        r = got[doc[0]]
        for s in BORDA_SIGNALS:
            assert getattr(r, f"b_{s}") == better[s], (doc[0], s)
        assert r.borda_pm == pm, doc[0]
    # the tie pair shares every count on the tied signal
    assert got[2].b_q_micro == got[3].b_q_micro == 1


# ---- batch 64: two-stage retrieval re-rank, CV fold audit ----


def test_rerank_eval_semantics(spark):
    """Planted candidates where BM25 misranks but embeddings cluster
    the relevant docs: the re-rank must beat the baseline nDCG, and
    both rows must share the candidate set and idcg."""
    from corhist_spark.retrieval import rerank_eval

    # 12 docs: BM25 puts doc 0 on top (relevant); docs 1-5 irrelevant
    # but high BM25; docs 6-9 relevant with low BM25.  Embeddings:
    # relevant docs all equal doc 0's vector, irrelevant orthogonal.
    scores = spark.createDataFrame(
        [(i, round(1.0 - 0.01 * i, 6)) for i in range(12)],
        "doc_id long, bm25 double",
    )
    rel_ids = {0, 6, 7, 8, 9}
    emb = spark.createDataFrame(
        [
            (i, [1.0, 0.0] if i in rel_ids else [0.0, 1.0])
            for i in range(12)
        ],
        "vec_id long, embedding array<float>",
    )
    rel = spark.createDataFrame(
        [(i, 1 if i in rel_ids else 0) for i in range(12)],
        "doc_id long, rel int",
    )
    got = {
        r.ranking: r
        for r in rerank_eval(scores, emb, rel, n_candidates=12, ks=(10,)).collect()
    }
    base, rr = got["bm25_baseline"], got["cosine_reranked"]
    assert base.k == rr.k == 10
    assert base.n_rel_total == rr.n_rel_total == 5
    assert base.idcg_micro == rr.idcg_micro
    # baseline top-10 misses none... doc 0 plus 6-9 are at ranks
    # 1,7,8,9,10; reranked puts all five relevant docs first
    assert rr.n_rel_at_k == 5 and base.n_rel_at_k == 5
    assert rr.dcg_micro > base.dcg_micro
    assert rr.ndcg_ppm == 1_000_000
    assert base.ndcg_ppm < 1_000_000


def test_cv_fold_audit_exact_vs_pure_python(spark):
    """Fold assignment and deviation must match the md5 replication,
    folds must partition each class, and dev_pm must be exact."""
    from corhist_spark.textops import cv_fold_audit, CV_FOLDS

    labeled = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(200)],
        "doc_id long, topic string",
    )
    got = {(r.fold, r.topic): r for r in cv_fold_audit(labeled).collect()}

    from collections import Counter
    want = Counter()
    for i in range(200):
        t = "a" if i % 3 else "b"
        f = int(hashlib.md5(f"{i}:cv".encode()).hexdigest()[:13], 16) % CV_FOLDS
        want[(f, t)] += 1
    totals = Counter()
    for (f, t), n in want.items():
        totals[t] += n
    assert set(got) == set(want)
    for k, n in want.items():
        r = got[k]
        ct = totals[k[1]]
        assert (r.n_docs, r.class_total) == (n, ct), k
        assert r.dev_pm == (1000 * abs(CV_FOLDS * n - ct)) // ct, k
    # every class fully partitioned across folds
    for t in ("a", "b"):
        assert sum(n for (f, tt), n in want.items() if tt == t) == totals[t]


def test_pareto_skyline_matches_bruteforce(spark):
    """The histogram+window skyline must equal the N^2 dominance
    definition exactly, including tie groups (equal points never
    dominate each other) and duplicated frontier points."""
    from corhist_spark.textops import pareto_skyline

    rows = [
        # doc_id, q_micro, n_tok (unused), ttr_pm
        (0, 900, 1, 100),
        (1, 900, 1, 400),   # same q as 0, higher t -> dominates 0
        (2, 700, 1, 400),   # dominated by 1 (>= both, > on q)
        (3, 700, 1, 700),
        (4, 500, 1, 700),   # dominated by 3
        (5, 500, 1, 900),
        (6, 500, 1, 900),   # exact tie with 5 -> both on frontier
        (7, 100, 1, 50),    # dominated by everything above on q? no:
                            # needs >= both; dominated by 5/6 etc.
        (8, 950, 1, 50),    # global max q -> frontier
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, q_micro long, n_tok long, ttr_pm long"
    )
    got = sorted(r.doc_id for r in pareto_skyline(d).collect())

    def dominated(a):
        return any(
            b[1] >= a[1] and b[3] >= a[3] and (b[1] > a[1] or b[3] > a[3])
            for b in rows
            if b[0] != a[0]
        )

    want = sorted(r[0] for r in rows if not dominated(r))
    assert got == want == [1, 3, 5, 6, 8]


def test_benford_audit_exact(spark):
    """Planted digit distribution: exact counts, per-mille math, the
    <1 exclusion, and zero-count digits materialized with n_vals=0."""
    from corhist_spark.textops import benford_audit, BENFORD_PM

    vals = (
        [("a", float(v)) for v in [1.2, 19.0, 150.0, 2.5, 3.0, 0.4]]
        + [("b", 9999.99)]
    )
    d = spark.createDataFrame(vals, "src string, price double")
    got = {
        (r.grp, r.digit): r
        for r in benford_audit(d, "src", "price").collect()
    }
    assert len(got) == 18  # 2 groups x 9 digits, zero counts included
    # group a: 0.4 excluded; digits 1,1,1,2,3 -> n=5
    assert got[("a", 1)].n_vals == 3 and got[("a", 1)].n_total == 5
    assert got[("a", 2)].n_vals == 1 and got[("a", 3)].n_vals == 1
    assert got[("a", 9)].n_vals == 0 and got[("a", 9)].n_total == 5
    assert got[("a", 1)].obs_pm == 600
    assert got[("a", 1)].exp_pm == BENFORD_PM[0] == 301
    assert got[("a", 1)].dev_pm == 600 - 301
    assert got[("b", 9)].n_vals == 1 and got[("b", 9)].obs_pm == 1000
    assert got[("b", 1)].n_vals == 0 and got[("b", 1)].dev_pm == -301
    assert sum(BENFORD_PM) == 1000


def test_cusum_changepoints_exact_vs_pure_python(spark):
    """Planted daily series with a level shift and a gap day: the
    window-closed-form CUSUM must equal the textbook recurrence
    S_t = max(0, S_{t-1} + y_t), the gap day must appear zero-filled,
    and the alarm must fire after the shift and not before."""
    import datetime

    from corhist_spark.textops import (
        cusum_changepoints,
        CUSUM_H_MULT,
        CUSUM_SLACK_DIV,
    )

    # type "a": 10/day for 6 days, then 40/day for 4 days (shift);
    # day 3 missing entirely (zero-fill).  type "b": flat 5/day.
    rows = []
    eid = 0
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    for d in range(10):
        if d != 3:
            for _ in range(10 if d < 6 else 40):
                rows.append((eid, base + datetime.timedelta(days=d), "a"))
                eid += 1
        for _ in range(5):
            rows.append((eid, base + datetime.timedelta(days=d), "b"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = {
        (r.event_type, r.day): r
        for r in cusum_changepoints(df).collect()
    }
    assert len(got) == 20  # 2 types x 10 spine days
    assert got[("a", "2024-03-04")].n_events == 0  # zero-filled gap

    # pure-Python recurrence per type
    for t, counts in (
        ("a", [10, 10, 10, 0, 10, 10, 40, 40, 40, 40]),
        ("b", [5] * 10),
    ):
        mean_milli = (1000 * sum(counts)) // len(counts)
        k_milli = mean_milli // CUSUM_SLACK_DIV
        s = 0
        for d, n in enumerate(counts):
            s = max(0, s + 1000 * n - mean_milli - k_milli)
            day = (base + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
            r = got[(t, day)]
            assert r.n_events == n, (t, day)
            assert r.cusum_milli == s, (t, day, r.cusum_milli, s)
            assert r.alarm == (s > CUSUM_H_MULT * mean_milli), (t, day)
    # shape: alarm fires for "a" after the shift, never for "b"
    assert not got[("a", "2024-03-06")].alarm
    assert got[("a", "2024-03-09")].alarm or got[("a", "2024-03-10")].alarm
    assert not any(got[("b", f"2024-03-{d:02d}")].alarm for d in range(1, 11))


def test_sorted_neighborhood_exact_vs_pure_python(spark):
    """Planted records with shared prefixes: the explode-rank window
    join must produce exactly the textbook SNM pairs (per pass: sort
    by key within block, pair each record with its w successors),
    and n_passes must count the passes that proposed the pair."""
    from corhist_spark.textops import (
        sorted_neighborhood,
        SNM_BLOCK_LEN,
        SNM_KEY_LEN,
        SNM_WINDOW,
    )

    texts = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),   # exact dup of 1
        (3, "alpha beta zeta"),
        (4, "alphabet soup recipe"),
        (5, "bravo charlie delta"),
        (6, "bravo charlie echo"),
        (7, "zz"),                        # short: pass-2 key empty
        (8, ""),                          # empty: no keys at all
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.n_passes
        for r in sorted_neighborhood(d).collect()
    }

    import re

    want = {}
    for p in range(2):
        recs = []
        for i, t in texts:
            norm = re.sub("[^a-z0-9]", "", t.lower())
            k = norm[p * SNM_KEY_LEN : (p + 1) * SNM_KEY_LEN]
            if k:
                recs.append((k[:SNM_BLOCK_LEN], k, i))
        by_blk = {}
        for blk, k, i in recs:
            by_blk.setdefault(blk, []).append((k, i))
        for blk, rows in by_blk.items():
            rows.sort()
            for a in range(len(rows)):
                for b in range(a + 1, min(a + 1 + SNM_WINDOW, len(rows))):
                    pair = tuple(sorted((rows[a][1], rows[b][1])))
                    want[pair] = want.get(pair, 0) + 1
    assert got == want
    # sanity: the exact dup pair is found, the empty doc pairs with
    # nothing, and at least one pair is proposed by both passes
    assert (1, 2) in got
    assert not any(8 in p for p in got)
    assert max(got.values()) == 2


def test_analyze_column_stats_exact(spark):
    """Planted frame with nulls and dup values: exact NDV, null
    counts, fixed-point numeric bounds and string length stats."""
    from corhist_spark.textops import analyze_column_stats

    d = spark.createDataFrame(
        [
            (10, 1.25, "AA", None),
            (10, 2.50, "B", "2024-01-02 00:00:00"),
            (30, None, None, "2024-01-02 00:00:00"),
        ],
        "k long, x double, s string, t string",
    ).withColumn("t", F.col("t").cast("timestamp"))
    got = {
        r.column_name: r
        for r in analyze_column_stats(
            d, int_cols=("k",), cents_cols=("x",), str_cols=("s",),
            ts_cols=("t",),
        ).collect()
    }
    assert set(got) == {"k", "x", "s", "t"}
    k = got["k"]
    assert (k.n_rows, k.n_nulls, k.ndv) == (3, 0, 2)
    assert (k.min_num, k.max_num) == (10, 30)
    assert (k.min_str, k.max_str) == ("10", "30")
    assert k.avg_len_milli == 2000
    x = got["x"]
    assert (x.n_rows, x.n_nulls, x.ndv) == (3, 1, 2)
    assert (x.min_num, x.max_num) == (125, 250)
    s = got["s"]
    assert (s.n_rows, s.n_nulls, s.ndv) == (3, 1, 2)
    assert s.min_num is None and s.max_num is None
    assert (s.min_str, s.max_str) == ("AA", "B")
    assert s.avg_len_milli == 1500
    t = got["t"]
    assert (t.n_rows, t.n_nulls, t.ndv) == (3, 1, 1)


def test_k_anonymity_audit_exact(spark):
    """Planted QI groups: one safe group (k=5, l=2), one small group
    (k=2) and one l=1 group — the per-nation summary must count each
    exactly."""
    from corhist_spark.textops import k_anonymity_audit

    cust = spark.createDataFrame(
        [
            # nation 0: 5 customers in one QI cell (seg A, band 1)
            *[(i, 0, "A", 1500.0) for i in range(5)],
            # nation 0: 2 customers in a second cell (seg B, band 0)
            (5, 0, "B", 100.0),
            (6, 0, "B", 900.0),
            # nation 1: 3 customers, one cell, all same sensitive
            (7, 1, "A", 2000.0),
            (8, 1, "A", 2100.0),
            (9, 1, "A", 2900.0),
        ],
        "c_custkey long, c_nationkey int, c_mktsegment string,"
        " c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(i, i % 10, "1-URGENT" if i % 10 < 3 else "5-LOW")
         for i in range(10)]
        + [(100, 7, "5-LOW")],  # nation-1 cell stays single-valued? no:
        # custkeys 7,8,9 -> '5-LOW'; the extra order keeps it 5-LOW too
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    got = {r.nation: r for r in k_anonymity_audit(
        cust, orders, k=5).collect()}
    # nation 0: cell (A,1) has customers 0-4 -> orders 0-4 (5 rows,
    # priorities URGENT x3 + LOW x2 -> l=2, k=5); cell (B,0) has
    # custkeys 5,6 -> 2 rows both LOW -> k=2 (below), l=1
    n0 = got[0]
    assert (n0.n_groups, n0.min_k, n0.n_rows) == (2, 2, 7)
    assert (n0.rows_below_k, n0.risk_pm) == (2, 285)  # 2000*... 2/7
    assert (n0.min_l, n0.groups_l1) == (1, 1)
    # nation 1: one cell (A,2), custkeys 7,8,9 -> orders 7,9,100 ...
    # custkey 8 gets order 8? order 8: o_custkey = 8 -> yes. 4 rows
    # (orders 7,8,9 + 100), all 5-LOW -> k=4 < 5, l=1
    n1 = got[1]
    assert (n1.n_groups, n1.min_k, n1.n_rows) == (1, 4, 4)
    assert (n1.rows_below_k, n1.risk_pm) == (4, 1000)
    assert (n1.min_l, n1.groups_l1) == (1, 1)


def test_roc_auc_exact_vs_pair_counting(spark):
    """Planted scores with heavy ties: the rank-sum AUC must equal
    the brute-force pair definition P(s+ > s-) + 0.5 P(s+ = s-),
    including perfect, inverted and single-class groups."""
    from corhist_spark.textops import roc_auc

    rows = [
        # grp 'a': mixed with ties across classes
        ("a", 10, 1), ("a", 10, 0), ("a", 20, 1), ("a", 5, 0),
        ("a", 20, 0), ("a", 20, 1), ("a", 1, 0),
        # grp 'b': perfect separation
        ("b", 100, 1), ("b", 100, 1), ("b", 50, 0),
        # grp 'c': inverted
        ("c", 1, 1), ("c", 9, 0),
        # grp 'd': single class -> NULL auc
        ("d", 7, 1), ("d", 8, 1),
    ]
    d = spark.createDataFrame(rows, "grp string, sc long, lab int")
    got = {r.grp: r for r in roc_auc(
        d, group_col="grp", score_expr="sc", label_expr="lab = 1"
    ).collect()}

    from collections import defaultdict

    by = defaultdict(lambda: ([], []))
    for g, s, l in rows:
        by[g][l].append(s)
    for g, (neg, pos) in by.items():
        r = got[g]
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        if not pos or not neg:
            assert r.auc_micro is None
            continue
        u = sum(
            1.0 if sp > sn else (0.5 if sp == sn else 0.0)
            for sp in pos for sn in neg
        )
        import math

        assert r.auc_micro == math.floor(
            1e6 * u / (len(pos) * len(neg))
        ), g
    assert got["b"].auc_micro == 1000000
    assert got["c"].auc_micro == 0


def test_luby_mis_exact_vs_pure_python(spark):
    """Planted graph (path + triangle + isolated-pair + hub star):
    the bounded-round Spark MIS must equal a pure-Python Luby replica
    using the same md5 priorities, and must satisfy the MIS
    invariants (independence, domination)."""
    import hashlib

    from corhist_spark.graph import luby_mis, MIS_ROUNDS

    raw = [
        ("n1", "n2"), ("n2", "n3"), ("n3", "n4"),   # path
        ("t1", "t2"), ("t2", "t3"), ("t3", "t1"),   # triangle
        ("p1", "p2"),                                # isolated edge
        ("h", "s1"), ("h", "s2"), ("h", "s3"), ("h", "s4"),  # star
        ("n1", "n1"),                                # self-loop: dropped
        ("n2", "n1"),                                # reverse dup
    ]
    d = spark.createDataFrame(raw, "src string, dst string")
    got = {r.node: (r.status, r["round"]) for r in luby_mis(d).collect()}

    adj = {}
    for s, t in raw:
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    active = set(adj)
    want = {}
    for r in range(1, MIS_ROUNDS + 1):
        def key(n):
            h = int(hashlib.md5(f"mis:{n}#{r}".encode())
                    .hexdigest()[:13], 16)
            return f"{h:016d}|{n}"
        winners = {
            n for n in active
            if all(key(n) < key(u) for u in adj[n] & active)
        }
        dominated = {
            u for n in winners for u in adj[n] & active
        } - winners
        for n in winners:
            want[n] = ("in_mis", r)
        for n in dominated:
            want[n] = ("dominated", r)
        active -= winners | dominated
    for n in active:
        want[n] = ("undecided", None)
    assert got == want
    # invariants: no edge inside the MIS; every dominated node has an
    # in_mis neighbor; with 6 rounds this graph fully decides
    mis = {n for n, (s, _) in got.items() if s == "in_mis"}
    assert not any(
        s in mis and t in mis for s, t in raw if s != t
    )
    for n, (s, _) in got.items():
        if s == "dominated":
            assert adj[n] & mis, n
    assert all(s != "undecided" for s, _ in got.values())


def test_equidepth_hist_exact(spark):
    """Planted skewed column: the weighted-NTILE closure must keep
    duplicate masses unsplit, bucket counts exact, and bounds tight."""
    from corhist_spark.textops import equidepth_hist

    # column k: value 1 x6, 2 x1, 3 x1 -> with B=4: cum(1)=6 ->
    # bucket ceil(4*6/8)=3; cum(2)=7 -> ceil(28/8)=4; cum(3)=8 -> 4
    d = spark.createDataFrame(
        [(1, 0.10)] * 6 + [(2, 0.20), (3, None)],
        "k long, x double",
    )
    got = {
        (r.column_name, r.bucket): (r.lo, r.hi, r.n_rows, r.ndv)
        for r in equidepth_hist(
            d, int_cols=("k",), cents_cols=("x",), n_buckets=4
        ).collect()
    }
    assert got[("k", 3)] == (1, 1, 6, 1)
    assert got[("k", 4)] == (2, 3, 2, 2)
    assert set(c for c, _ in got) == {"k", "x"}
    # x: NULL dropped -> 7 rows: 10-cents x6 (cum 6 -> ceil(24/7)=4),
    # 20-cents x1 (cum 7 -> 4): one merged bucket
    assert got[("x", 4)] == (10, 20, 7, 2)
    assert ("x", 1) not in got and ("x", 3) not in got


def test_streaming_sessions_gap_and_watermark(spark, tmp_path):
    """Planted event times: 30-min-gap merging and the 5-min
    watermark suppression of the tail session, via the real
    streaming engine run to completion."""
    import datetime as dt

    from corhist_spark.streaming import session_window_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [
        # user a: events at 0, 10, 39 min -> gaps 10 and 29 both < 30
        # => ONE session [0, 39+30)
        ("a", t(0)), ("a", t(10)), ("a", t(39)),
        # user a: event at 100 min -> gap 61 >= 30 => new session,
        # end 130 < watermark? wm = 300 - 5 = 295 -> emitted
        ("a", t(100)),
        # user b: session at 250..260 -> end 290 <= 295: emitted
        ("b", t(250)), ("b", t(260)),
        # user b: event at 293 -> end 323 > 295: SUPPRESSED
        ("b", t(293)),
        # user d: EXACTLY 30-min gap — session_window merges touching
        # windows (next start == prev end), so ONE session [0, 60)
        ("d", t(0)), ("d", t(30)),
        # the watermark anchor
        ("c", t(300)),
    ]
    df = spark.createDataFrame(rows, "entity string, ts timestamp")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src).select(
        F.date_trunc("second", "ts").alias("ts"), "entity"
    )
    ck = str(tmp_path / "ck")
    q = (
        session_window_counts(stream, checkpoint_dir=ck)
        .queryName("ssw_test")
        .start()
    )
    q.awaitTermination()
    got = {
        (r.entity, r.session_start.minute + 60 * r.session_start.hour,
         r.session_end.minute + 60 * r.session_end.hour, r.n)
        for r in spark.table("ssw_test").collect()
    }
    want = {
        ("a", 0, 69, 3),
        ("a", 100, 130, 1),
        ("b", 250, 290, 2),
        ("d", 0, 60, 2),
    }
    assert got == want  # c's own session (end 330) and b@293 suppressed


def test_zorder_layout_exact_vs_pure_python(spark):
    """Planted 2-D clustered data: the full audit output must match a
    pure-Python Morton recomputation, and the Z layout must dominate
    the linear layout on rows scanned for the planted box."""
    from corhist_spark.textops import (
        zorder_layout,
        ZORDER_BITS,
        ZORDER_BOX,
        ZORDER_FILE_BITS,
    )
    import datetime as dt

    # x in 0..1023, y = a day index correlated in blocks so both
    # layouts get non-trivial zone maps
    rows = []
    for i in range(1024):
        x = i
        y = (i * 37) % 512
        rows.append((x, dt.datetime(2024, 1, 1) + dt.timedelta(days=y)))
    d = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")
    got = {r.layout: r for r in zorder_layout(d).collect()}

    b, fb = ZORDER_BITS, ZORDER_FILE_BITS
    top = (1 << b) - 1
    x0, x1, y0, y1 = ZORDER_BOX
    xs = [x for x, _ in rows]
    ys = [(i * 37) % 512 for i in range(1024)]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    # epoch-day shift cancels in (y - min_y)

    def morton(xq, yq):
        z = 0
        for i in range(b):
            z += ((xq >> i) & 1) << (2 * i + 1)
            z += ((yq >> i) & 1) << (2 * i)
        return z

    files = {"zorder": {}, "linear": {}}
    for x, y in zip(xs, ys):
        xq = (top * (x - mnx)) // max(1, mxx - mnx)
        yq = (top * (y - mny)) // max(1, mxy - mny)
        hit = x0 <= xq <= x1 and y0 <= yq <= y1
        for name, f in (
            ("zorder", morton(xq, yq) >> (2 * b - fb)),
            ("linear", xq >> (b - fb)),
        ):
            s = files[name].setdefault(f, [1 << 20, -1, 1 << 20, -1, 0, 0])
            s[0] = min(s[0], xq); s[1] = max(s[1], xq)
            s[2] = min(s[2], yq); s[3] = max(s[3], yq)
            s[4] += 1; s[5] += int(hit)
    for name, f in files.items():
        read = [
            s for s in f.values()
            if s[0] <= x1 and s[1] >= x0 and s[2] <= y1 and s[3] >= y0
        ]
        r = got[name]
        assert r.n_files == len(f)
        assert r.files_read == len(read)
        assert r.rows_read == sum(s[4] for s in read)
        assert r.n_match == sum(s[5] for s in f.values())
        assert r.amp_pm == (1000 * r.rows_read) // max(1, r.n_match)
    assert got["zorder"].rows_read < got["linear"].rows_read


def test_boruvka_mst_exact_vs_kruskal(spark):
    """Planted multi-component graph: the bounded-round Boruvka forest
    must equal the Kruskal MST under the same md5 weights (weights are
    a strict total order, so the MST is unique)."""
    import hashlib

    from corhist_spark.graph import boruvka_mst, MST_W_MOD

    raw = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
        ("a", "c"),                                      # chord
        ("e", "f"), ("f", "g"), ("g", "e"),              # triangle
        ("h", "i"),                                      # lone edge
        ("b", "a"), ("a", "a"),                          # dup + loop
    ]
    d = spark.createDataFrame(raw, "src string, dst string")
    got = {(r.a, r.b, r.w) for r in boruvka_mst(d).collect()}

    def w(a, b):
        a, b = min(a, b), max(a, b)
        return int(
            hashlib.md5(f"w:{a}|{b}".encode()).hexdigest()[:13], 16
        ) % MST_W_MOD

    canon = {(min(s, t), max(s, t)) for s, t in raw if s != t}
    # Kruskal with union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = set()
    for a, b in sorted(canon, key=lambda e: (w(*e), e)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            want.add((a, b, w(a, b)))
    assert got == want
    # forest spans: |edges| = |nodes| - |components| (3 components)
    nodes = {n for e in canon for n in e}
    assert len(got) == len(nodes) - 3


def test_gini_index_exact_vs_pairwise(spark):
    """Planted length distributions incl. ties, all-equal and
    singleton groups: the sorted-cumulative block form must equal the
    brute-force pairwise definition sum|xi-xj| / (2 n^2 mu)."""
    from corhist_spark.textops import gini_index

    groups = {
        "s1": [10, 10, 10],          # all equal -> 0
        "s2": [0, 0, 100],           # extreme
        "s3": [5],                   # singleton -> 0
        "s4": [1, 2, 2, 3, 8, 8],    # ties
        "s5": [0, 0],                # zero mass -> NULL
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    d = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.grp: r for r in gini_index(d).collect()}
    for g, vals in groups.items():
        r = got[g]
        assert r.n_docs == len(vals)
        assert r.total_mass == sum(vals)
        if sum(vals) == 0:
            assert r.gini_micro is None
            continue
        n = len(vals)
        s = sum(abs(x - y) for x in vals for y in vals)
        want = (1_000_000 * s) // (2 * n * sum(vals))
        # block form: floor of the same rational
        assert r.gini_micro == want, g
    assert got["s1"].gini_micro == 0
    assert got["s3"].gini_micro == 0


def test_ks_drift_exact_vs_pure_python(spark):
    """Planted distributions: KS vs a brute-force two-sample CDF
    comparison, including identical (0), disjoint (1e6) and tied
    sources."""
    from corhist_spark.textops import ks_drift

    groups = {
        "a": [1, 2, 3, 4, 5, 6, 7, 8],
        "b": [1, 2, 3, 4, 5, 6, 7, 8],      # same as corpus-ish
        "c": [101, 102, 103],               # disjoint high
        "d": [1, 1, 1, 8, 8, 8],            # ties
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    d = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.grp: r for r in ks_drift(d).collect()}

    allv = [v for vals in groups.values() for v in vals]
    domain = sorted(set(allv))
    for g, vals in groups.items():
        rest = [v for gg, vv in groups.items() if gg != g for v in vv]
        ns, nr = len(vals), len(rest)
        dmax = max(
            abs(
                sum(1 for x in vals if x <= v) * nr
                - sum(1 for x in rest if x <= v) * ns
            )
            for v in domain
        )
        want = (1_000_000 * dmax) // (ns * nr)
        assert got[g].n_docs == ns
        assert got[g].ks_ppm == want, g
    assert got["c"].ks_ppm == 1_000_000


def test_compaction_plan_exact(spark):
    """Planted key ranges: tier assignment, fan-in-4 task grouping
    and next-tier range-overlap counting, vs a hand computation."""
    from corhist_spark.textops import (
        compaction_plan,
        COMPACT_FILE_KEYS as FK,
    )

    rows = []
    # files 0..5: small (tier 0, < 1024 rows); file 6: 2000 rows
    # (tier 1) overlapping nothing below; keys stay inside file ranges
    for f in range(6):
        rows += [(f * FK + i % 100,) for i in range(500)]
    rows += [(6 * FK + i % 3000,) for i in range(2000)]
    d = spark.createDataFrame(rows, "l_orderkey long")
    got = {(r.tier, r.task): r for r in compaction_plan(d).collect()}
    # tier 0: 6 files -> tasks of 4 + 2; tier 1: 1 file -> 1 task
    t00 = got[(0, 0)]
    assert (t00.n_files, t00.rows_in) == (4, 2000)
    assert t00.lo == 0 and t00.hi == 3 * FK + 99
    t01 = got[(0, 1)]
    assert (t01.n_files, t01.rows_in) == (2, 1000)
    t10 = got[(1, 0)]
    assert (t10.n_files, t10.rows_in) == (1, 2000)
    # tier-0 tasks do not overlap the tier-1 file (its range starts
    # at 6*FK); the tier-1 task has no tier-2 files
    assert t00.next_tier_overlaps == 0
    assert t01.next_tier_overlaps == 0
    assert t10.next_tier_overlaps == 0
    # planted overlap: add a tier-1 file spanning into tier-0's range
    rows2 = rows + [(i % (2 * FK),) for i in range(1500)]
    d2 = spark.createDataFrame(rows2, "l_orderkey long")
    got2 = {(r.tier, r.task): r for r in compaction_plan(d2).collect()}
    # files 0 and 1 now hold 500+750=1250ish rows each -> tier 1;
    # recompute expectations structurally instead: every returned task
    # must satisfy the overlap definition
    tiered = {}
    for (t, k), r in got2.items():
        tiered.setdefault(t, []).append(r)
    import itertools

    all_rows = list(itertools.chain.from_iterable(tiered.values()))
    assert all(r.n_files >= 1 for r in all_rows)
    assert sum(r.rows_in for r in all_rows) == len(rows2)


def test_kcenter_coreset_exact_vs_pure_python(spark):
    """Planted 2-D embeddings: the Spark greedy k-center must equal a
    pure-Python Gonzalez run (same quantization, same tie-breaks),
    including selection distances and assignment counts."""
    from corhist_spark.similarity import kcenter_coreset, KCENTER_K

    pts = [
        (0, [0.0, 0.0]), (1, [0.01, 0.0]), (2, [1.0, 0.0]),
        (3, [1.0, 1.0]), (4, [0.0, 1.0]), (5, [0.5, 0.5]),
        (6, [0.52, 0.5]), (7, [0.0, 0.98]), (8, [0.25, 0.75]),
        (9, [0.8, 0.2]), (10, [0.1, 0.1]), (11, [0.9, 0.9]),
    ]
    d = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = {r.rank: r for r in kcenter_coreset(d).collect()}

    import math

    q = {
        i: [math.floor(float(np_x := __import__("numpy").float32(x)) * 1000)
            for x in v]
        for i, v in pts
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    centers = [(1, 0, 0)]
    mind = {i: d2(q[i], q[0]) for i, _ in pts}
    for r in range(2, KCENTER_K + 1):
        mx = max(mind.values())
        nxt = min(i for i, m in mind.items() if m == mx)
        centers.append((r, nxt, mx))
        for i in mind:
            mind[i] = min(mind[i], d2(q[i], q[nxt]))
    counts = {}
    for i, _ in pts:
        best = min(
            (d2(q[i], q[c]) * 16 + rk) for rk, c, _ in centers
        )
        counts[best % 16] = counts.get(best % 16, 0) + 1
    for rk, cid, seld in centers:
        r = got[rk]
        assert (r.center_id, r.sel_d2) == (cid, seld), rk
        assert r.n_assigned == counts.get(rk, 0), rk


def test_wasserstein_drift_exact_vs_quantile_coupling(spark):
    """Planted distributions: the CDF-integral form must equal the
    independent quantile-coupling computation (each side replicated
    to the common n_src*n_rest grid)."""
    from corhist_spark.textops import wasserstein_drift

    groups = {
        "a": [1, 2, 3, 4],
        "b": [11, 12, 13],        # shifted by 10
        "c": [1, 1, 4, 4],        # tie-heavy
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    d = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.grp: r for r in wasserstein_drift(d).collect()}
    for g, vals in groups.items():
        rest = [v for gg, vv in groups.items() if gg != g for v in vv]
        ns, nr = len(vals), len(rest)
        a = sorted(v for v in vals for _ in range(nr))
        b = sorted(v for v in rest for _ in range(ns))
        s = sum(abs(x - y) for x, y in zip(a, b))
        want = (1000 * s) // (ns * nr)
        assert got[g].n_docs == ns
        assert got[g].w1_milli == want, g
    assert got["b"].w1_milli > got["a"].w1_milli


def test_fs_pattern_audit_exact(spark):
    """Planted docs: recompute the pattern table in Python from the
    engine's own SNM pairs (the pair generator is pinned by its own
    test) and check observed/expected/lift integer arithmetic."""
    from corhist_spark.textops import (
        fs_pattern_audit,
        sorted_neighborhood,
        FS_BAND,
    )

    rows = [
        (1, "alpha beta gamma one", "en", "s1", 150),
        (2, "alpha beta gamma two", "en", "s1", 160),
        (3, "alpha beta delta", "de", "s2", 150),
        (4, "alphabet soup here", "en", "s2", 260),
        (5, "bravo charlie delta", "de", "s1", 255),
        (6, "bravo charlie echo", "de", "s1", 152),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = {r.pattern: r for r in fs_pattern_audit(d).collect()}
    pairs = [
        (r.doc_a, r.doc_b)
        for r in sorted_neighborhood(d).select("doc_a", "doc_b").collect()
    ]
    attr = {i: (l, s, c // FS_BAND) for i, _, l, s, c in rows}
    vecs = [
        tuple(int(attr[a][k] == attr[b][k]) for k in range(3))
        for a, b in pairs
    ]
    n = len(vecs)
    al = sum(v[0] for v in vecs)
    asx = sum(v[1] for v in vecs)
    ab = sum(v[2] for v in vecs)
    from collections import Counter

    cnt = Counter(4 * v[0] + 2 * v[1] + v[2] for v in vecs)
    assert set(got) == set(cnt)
    for p, c in cnt.items():
        r = got[p]
        assert r.n_pairs == c
        obs = (1_000_000 * c) // n
        gl, gs, gb = (p >> 2) & 1, (p >> 1) & 1, p & 1
        exp = (
            ((1_000_000 * (al if gl else n - al)) // n
             * (asx if gs else n - asx)) // n
            * (ab if gb else n - ab)
        ) // n
        assert (r.obs_ppm, r.exp_ppm) == (obs, exp), p
        assert r.lift_pm == (1000 * obs) // max(1, exp), p


def test_pseudonymize_audit_collisions(spark):
    """Tiny token space forces collisions; the audit must count them
    and price the excess join rows exactly."""
    import hashlib

    from corhist_spark.textops import pseudonymize_audit

    cust = spark.createDataFrame(
        [(i,) for i in range(40)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(i, i % 40) for i in range(100)], "o_orderkey long, o_custkey long"
    )
    got = pseudonymize_audit(cust, orders, token_mod=7).collect()[0]

    def tok(k):
        return int(
            hashlib.md5(f"pseud:{k}".encode()).hexdigest()[:13], 16
        ) % 7

    toks = {k: tok(k) for k in range(40)}
    n_tokens = len(set(toks.values()))
    assert got.n_keys == 40
    assert got.n_tokens == n_tokens
    assert got.n_collisions == 40 - n_tokens
    assert got.join_rows_raw == 100
    from collections import Counter

    ccnt = Counter(toks.values())
    ocnt = Counter(toks[i % 40] for i in range(100))
    want_tok_join = sum(ocnt[t] * ccnt[t] for t in ocnt)
    assert got.join_rows_tok == want_tok_join
    assert got.excess_rows == want_tok_join - 100
    # default 2^52 space: collision-free on this corpus
    clean = pseudonymize_audit(cust, orders).collect()[0]
    assert clean.n_collisions == 0 and clean.excess_rows == 0


def test_neyman_allocation_exact(spark):
    """Planted strata: high-variance stratum gets the seats; seats
    always sum to the budget; singleton stratum weighs zero."""
    import math

    from corhist_spark.textops import neyman_allocation

    groups = {
        "flat": [100] * 50,            # zero variance -> w 0
        "wild": [0, 200] * 25,         # high variance
        "mid": [90, 110] * 25,
        "solo": [5],                   # singleton -> w 0
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    d = spark.createDataFrame(rows, "lang string, n_chars long")
    got = {r.stratum: r for r in neyman_allocation(d, budget=100).collect()}

    w = {}
    for g, vals in groups.items():
        n = len(vals)
        if n <= 1:
            w[g] = 0
            continue
        vh = n * sum(v * v for v in vals) - sum(vals) ** 2
        w[g] = math.floor(math.sqrt(n * vh / (n - 1)))
    wt = sum(w.values())
    base = {g: (100 * w[g]) // wt for g in w}
    rem = {g: (100 * w[g]) % wt for g in w}
    leftover = 100 - sum(base.values())
    order = sorted(w, key=lambda g: (-rem[g], g))
    alloc = dict(base)
    for g in order[:leftover]:
        alloc[g] += 1
    for g in groups:
        assert got[g].w_h == w[g], g
        assert got[g].n_alloc == alloc[g], g
    assert sum(r.n_alloc for r in got.values()) == 100
    assert got["wild"].n_alloc > got["mid"].n_alloc
    assert got["flat"].n_alloc == 0 and got["solo"].n_alloc == 0


def test_randomization_test_detects_planted_gap(spark):
    """A strong planted quality gap must be significant (p at the
    add-one floor); a null corpus must not be."""
    from corhist_spark.textops import randomization_test, RT_PERMS

    # strong signal: even sources all-alpha, odd sources all-digits
    strong = [
        (i, "abcdefghij" if i % 2 == 0 else "0123456789",
         f"src{i % 2}", 10)
        for i in range(400)
    ]
    d = spark.createDataFrame(
        strong, "doc_id long, text string, source string, n_chars long"
    )
    r = randomization_test(d).collect()[0]
    assert r.p_ppm == 1_000_000 // (RT_PERMS + 1)  # floor: nothing >= obs
    # null: identical text everywhere -> X_obs = 0, every perm >= it
    null = [(i, "abc123", f"src{i % 4}", 6) for i in range(400)]
    d0 = spark.createDataFrame(
        null, "doc_id long, text string, source string, n_chars long"
    )
    r0 = randomization_test(d0).collect()[0]
    assert r0.x_obs == 0
    assert r0.p_ppm == 1_000_000


def test_pq_audit_exact_vs_pure_python(spark):
    """Planted vectors: codebook from the first 16 ids, per-subspace
    argmin with tie-breaks, reconstruction error — vs a pure-Python
    replica."""
    import math

    import numpy as np

    from corhist_spark.similarity import pq_audit, PQ_CODES, PQ_SUBSPACES

    rng_vals = [
        [((i * 31 + j * 7) % 19 - 9) / 10.0 for j in range(8)]
        for i in range(40)
    ]
    d = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng_vals)],
        "vec_id long, embedding array<float>",
    )
    got = {r.m: r for r in pq_audit(d).collect()}

    q = [
        [math.floor(float(np.float32(x)) * 1000) for x in v]
        for v in rng_vals
    ]
    sub = 8 // PQ_SUBSPACES
    per = {}
    for m in range(PQ_SUBSPACES):
        codes = {c: q[c][m * sub:(m + 1) * sub] for c in range(PQ_CODES)}
        stats = {}
        for i in range(40):
            sv = q[i][m * sub:(m + 1) * sub]
            best = min(
                sum((a - b) ** 2 for a, b in zip(sv, cv)) * PQ_CODES + c
                for c, cv in codes.items()
            )
            code, d2 = best % PQ_CODES, best // PQ_CODES
            n, e = stats.get(code, (0, 0))
            stats[code] = (n + 1, e + d2)
        per[m] = stats
    for m, stats in per.items():
        r = got[m]
        assert r.n_vectors == 40
        assert r.codes_used == len(stats)
        assert r.top_code_pm == (1000 * max(n for n, _ in stats.values())) // 40
        assert r.total_sq_err == sum(e for _, e in stats.values())


def test_did_estimator_recovers_planted_effect(spark):
    """Planted treatment effect: treated users' values jump by +5.00
    post-midpoint; the DiD must recover ~5e6 micro-cents exactly
    under the floor arithmetic."""
    import datetime as dt

    from corhist_spark.textops import did_estimator

    rows = []
    base = dt.datetime(2024, 1, 1)
    for i in range(400):
        u = i % 10                      # users 0..9; even = treated
        day = i % 20                    # days 0..19; mid -> post at 10?
        ts = base + dt.timedelta(days=day)
        y = 10.0
        if u % 2 == 0 and day >= 10:
            y += 5.0                    # the planted effect
        rows.append((i, ts, u, y))
    d = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    r = did_estimator(d).collect()[0]
    # midpoint of [day0, day19] = day 9.5 -> post = days 10..19;
    # outcome unit is micro-CENTS: +5.00 value = 500 cents = 5e8
    assert r.n_t1_p0 == r.n_t1_p1 == r.n_t0_p0 == r.n_t0_p1 == 100
    assert r.m_t0_p1 - r.m_t0_p0 == 0
    assert r.did_micro == 500_000_000


def test_loso_valuation_exact(spark):
    """Planted sources with one bad apple: removal of the low-quality
    source must raise the corpus mean (delta < 0), and all integer
    arithmetic must match a hand computation."""
    from corhist_spark.textops import loso_valuation

    rows = (
        [(i, "abcdefghij", "good", 10) for i in range(30)]
        + [(100 + i, "0123456789", "bad", 10) for i in range(10)]
    )
    d = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    got = {r.grp: r for r in loso_valuation(d).collect()}
    # quality: good docs 1000, bad docs 0; corpus mean = 750 per-mille
    assert got["good"].mean_with_micro == (10**6 * 30000) // 40
    assert got["bad"].mean_without_micro == (10**6 * 30000) // 30
    assert got["bad"].delta_micro < 0     # removing bad raises mean
    assert got["good"].delta_micro > 0    # removing good lowers mean
    assert got["good"].share_pm == 750 and got["bad"].share_pm == 250


def test_streaming_enrich_left_join_and_misses(spark, tmp_path):
    """Planted events with a key missing from the dim: the stream-
    static left join must keep the row in the '<miss>' bucket, and
    only watermark-finalized windows are emitted."""
    import datetime as dt

    from corhist_spark.streaming import enriched_window_counts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=1), 1),   # window 0, dim A
        (base + dt.timedelta(minutes=2), 2),   # window 0, dim B
        (base + dt.timedelta(minutes=3), 99),  # window 0, MISS
        (base + dt.timedelta(minutes=11), 1),  # window 10, dim A
        (base + dt.timedelta(minutes=30), 1),  # anchor; its own window
    ]
    df = spark.createDataFrame(rows, "ts timestamp, key long")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    dim = spark.createDataFrame(
        [(1, "A"), (2, "B")], "key long, label string"
    )
    stream = spark.readStream.schema(df.schema).parquet(src)
    ck = str(tmp_path / "ck")
    q = (
        enriched_window_counts(stream, dim, checkpoint_dir=ck)
        .queryName("sen_test")
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start.minute, r.label): r.n
        for r in spark.table("sen_test").collect()
    }
    # watermark = 30min - 5min = 25min: window [0,10) and [10,20)
    # finalize; [30,40) does not
    assert got == {(0, "A"): 1, (0, "B"): 1, (0, "<miss>"): 1, (10, "A"): 1}


def test_theilsen_trend_exact_vs_pure_python(spark):
    """Planted series with an outlier day: Theil-Sen must report the
    robust slope (OLS would not), matching a pure-Python lower
    median over all pairs."""
    import datetime as dt

    from corhist_spark.textops import theilsen_trend

    base = dt.datetime(2024, 1, 1)
    # type 'up': counts 1,2,3,...,8 per day (slope 1), with day 4
    # spiked to 50 (outlier); type 'flat': constant 3
    rows = []
    for day in range(8):
        n = 50 if day == 4 else day + 1
        for k in range(n):
            rows.append((f"e{day}_{k}", base + dt.timedelta(days=day), "up"))
        for k in range(3):
            rows.append((f"f{day}_{k}", base + dt.timedelta(days=day), "flat"))
    d = spark.createDataFrame(rows, "eid string, ts timestamp, event_type string")
    got = {r.event_type: r for r in theilsen_trend(d).collect()}

    import math

    for typ in ("up", "flat"):
        counts = [
            (50 if day == 4 else day + 1) if typ == "up" else 3
            for day in range(8)
        ]
        pairs = [
            (counts[j] - counts[i], j - i)
            for i in range(8) for j in range(i + 1, 8)
        ]
        pairs.sort(key=lambda p: (p[0] / p[1], p[0], p[1]))
        num, den = pairs[(len(pairs) + 1) // 2 - 1]
        want = math.floor(1000.0 * num / den)
        assert got[typ].n_pairs == len(pairs)
        assert got[typ].slope_milli == want, typ
    assert got["flat"].slope_milli == 0
    assert 0 < got["up"].slope_milli <= 2000  # robust to the spike


def test_encoding_advisor_exact(spark):
    """Planted layout: a constant column advises RLE, a low-card
    shuffled column advises DICT, a unique wide column advises
    PLAIN... (byte models recomputed by hand)."""
    from corhist_spark.textops import encoding_advisor, ENC_RLE_OVERHEAD

    rows = []
    for i in range(64):
        rows.append(
            (i, 1, "AAAA" if i < 32 else "BBBB", f"v{i % 4}", 10**14 + i)
        )
    d = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_returnflag string,"
        " l_linestatus string, l_suppkey long",
    )
    got = {
        r.column_name: r
        for r in encoding_advisor(
            d, cols=("l_returnflag", "l_linestatus", "l_suppkey")
        ).collect()
    }
    rf = got["l_returnflag"]           # two long runs: RLE (ties go RLE)
    assert (rf.n_runs, rf.ndv) == (2, 2)
    assert rf.rle_bytes == 2 * (4 + ENC_RLE_OVERHEAD)
    assert rf.dict_bytes == 2 * 4 + (64 * 1 + 7) // 8
    assert rf.advice == "rle"
    ls = got["l_linestatus"]           # v0..v3 cycling: 64 runs
    assert (ls.n_runs, ls.ndv) == (64, 4)
    assert ls.dict_bytes == 4 * 2 + (64 * 2 + 7) // 8
    assert ls.advice == "dict"
    sk = got["l_suppkey"]              # unique 15-digit values
    assert (sk.ndv, sk.n_runs) == (64, 64)
    assert sk.plain_bytes == 64 * 15
    assert sk.advice == "plain"


def test_assortativity_exact_vs_pure_python(spark):
    """Planted star (negative mixing) and clique (zero variance edge
    case avoided by mixing): exact moment sums vs pure Python."""
    import math

    from corhist_spark.graph import assortativity

    raw = [
        ("h", "s1"), ("h", "s2"), ("h", "s3"), ("h", "s4"),  # star
        ("x", "y"), ("y", "z"), ("z", "x"),                  # triangle
        ("x", "h"),                                          # bridge
    ]
    d = spark.createDataFrame(raw, "src string, dst string")
    r = assortativity(d).collect()[0]

    canon = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in canon] + [
        (deg[b], deg[a]) for a, b in canon
    ]
    m = len(pairs)
    sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
    want = math.floor(
        1e6 * (m * sxy - sx * sy)
        / (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy))
    )
    assert r.n_edges == m
    assert r.r_micro == want
    assert r.r_micro < 0  # star + bridge: disassortative


def test_brier_decomposition_calibrated_vs_uninformative(spark):
    """A perfectly calibrated planted forecast has REL ~ 0 and RES ~
    UNC; a constant forecast has RES = 0 and REL = its squared bias."""
    from corhist_spark.textops import brier_decomposition

    # calibrated: score 0 docs never positive, score 1000 docs always
    # positive (parity aligned with text)
    rows = (
        [(i, "0123456789", "src1", 10) for i in range(50)]     # p=0, lab 0
        + [(i + 100, "abcdefghij", "src0", 10) for i in range(50)]  # p=1M lab 1
    )
    d = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    r = brier_decomposition(d).collect()[0]
    assert r.base_ppm == 500000
    assert r.rel_ppm == 0
    assert r.res_ppm == r.unc_ppm == 250000
    assert r.brier_ppm == 0
    # uninformative: every doc scores 500 per-mille, labels half/half
    rows2 = [
        (i, "abcde01234", f"src{i % 2}", 10) for i in range(100)
    ]
    d2 = spark.createDataFrame(
        rows2, "doc_id long, text string, source string, n_chars long"
    )
    r2 = brier_decomposition(d2).collect()[0]
    assert r2.res_ppm == 0
    assert r2.rel_ppm == 0          # forecast 500k = hit rate 500k
    assert r2.brier_ppm == r2.unc_ppm == 250000


def test_k_truss_exact_vs_pure_python(spark):
    """Planted clique + pendant tree: the 4-truss keeps exactly the
    clique edges (support 2+ inside K4), peels everything tree-ish,
    matching a pure-Python peel to fixpoint."""
    from corhist_spark.graph import k_truss, TRUSS_K, TRUSS_ROUNDS
    from itertools import combinations

    nodes = ["k1", "k2", "k3", "k4"]
    raw = list(combinations(nodes, 2))          # K4: every edge support 2
    raw += [("k1", "t1"), ("t1", "t2"), ("t2", "t3")]   # pendant path
    raw += [("p1", "p2"), ("p2", "p3"), ("p3", "p1")]   # triangle: sup 1
    d = spark.createDataFrame(raw, "src string, dst string")
    got = {(r.a, r.b): r.support for r in k_truss(d).collect()}

    edges = {tuple(sorted(e)) for e in raw}
    for _ in range(TRUSS_ROUNDS):
        sup = {e: 0 for e in edges}
        nds = {n for e in edges for n in e}
        adj = {n: set() for n in nds}
        for a, b in edges:
            adj[a].add(b); adj[b].add(a)
        for a, b in edges:
            for c in adj[a] & adj[b]:
                sup[(a, b)] += 1
        edges = {e for e in edges if sup[e] >= TRUSS_K - 2}
    # final support on the surviving subgraph
    sup = {e: 0 for e in edges}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in edges:
        sup[(a, b)] = len(adj[a] & adj[b])
    assert got == sup
    assert set(got) == {tuple(sorted(e)) for e in combinations(nodes, 2)}
    assert all(s == 2 for s in got.values())


def test_slo_burn_alert_logic(spark):
    """Planted error bursts: a 1-hour spike alone must NOT page (long
    window dilutes it); a sustained 6-hour burn must."""
    import datetime as dt

    from corhist_spark.textops import slo_burn

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(12):
        n_err = 0
        if h == 2:
            n_err = 50        # one-hour spike: 50% errors
        if 6 <= h < 12:
            n_err = 5         # sustained 5% burn for 6 hours
        for k in range(100):
            typ = "error" if k < n_err else "click"
            rows.append((eid, base + dt.timedelta(hours=h, seconds=k), typ))
            eid += 1
    d = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {int(r.hour % 24): r for r in slo_burn(d).collect()}
    # hour 2: short burn = 50% / 1% = 50x = 50000pm, but long window
    # (hours 0-2) = 50/300 -> ~16.6% -> 16666ppm/1% = 16.6x: BOTH over
    # 2x -> fires. Adjust expectation: the spike DOES page under 2x2.
    assert out[2].alert
    # hour 4: short window clean (0 errors) -> no alert even though
    # the long window still carries the spike
    assert not out[4].alert
    # hour 11: sustained 5% burn -> short 5x, long 5x -> alert
    assert out[11].short_burn_pm == 5000
    assert out[11].long_burn_pm == 5000
    assert out[11].alert
    # hour 0: clean
    assert not out[0].alert


def test_seasonal_profile_strength(spark):
    """A perfectly weekly series has strength ~1e6; a flat series has
    strength 0; the worst-residual day is the planted anomaly."""
    import datetime as dt

    from corhist_spark.textops import seasonal_profile

    base = dt.datetime(2024, 1, 1)   # di 0
    rows = []
    eid = 0
    for day in range(28):
        # 'weekly': count = 10 + dow*5 (pure weekly cycle), except a
        # planted anomaly spike on day 13
        n_w = 10 + (day % 7) * 5 + (30 if day == 13 else 0)
        for _ in range(n_w):
            rows.append((eid, base + dt.timedelta(days=day), "weekly")); eid += 1
        for _ in range(20):
            rows.append((eid, base + dt.timedelta(days=day), "flat")); eid += 1
    d = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {r.event_type: r for r in seasonal_profile(d).collect()}
    w, f = got["weekly"], got["flat"]
    assert f.strength_ppm == 0          # no dev at all -> clamped 0/0 path
    assert w.worst_resid_day == 13      # the planted spike
    assert w.strength_ppm > 700_000     # cycle explains most variance
    assert f.best_dow_mean_deci == f.worst_dow_mean_deci == 200
    assert w.n_days == 28


def test_learned_index_audit_exact(spark):
    """A dense sequential file fits with epsilon 0; a planted
    heavy-tail file needs a real window; slope matches rows/key."""
    from corhist_spark.textops import learned_index_audit

    rows = []
    # file 0: keys 0..99, one row each -> perfect line, eps 0
    for k in range(100):
        rows.append((k,))
    # file 1: keys 4096..4195, but key 4100 holds 200 rows (CDF step)
    for k in range(4096, 4196):
        for _ in range(200 if k == 4100 else 1):
            rows.append((k,))
    d = spark.createDataFrame(rows, "l_orderkey long")
    got = {r.file_id: r for r in learned_index_audit(d).collect()}
    f0 = got[0]
    assert (f0.n_keys, f0.n_rows) == (100, 100)
    assert f0.max_err_rows == 0
    assert f0.slope_micro == 1_000_000   # one row per key
    f1 = got[1]
    assert (f1.n_keys, f1.n_rows) == (100, 299)
    assert f1.max_err_rows >= 50         # the step breaks the line


def test_selectivity_audit_uniform_is_accurate(spark):
    """On a uniform column the histogram estimate must be near-exact
    (q-error ~1.0); a planted point-mass predicate shows real error."""
    from corhist_spark.textops import selectivity_audit

    rows = []
    for i in range(4096):
        # extendedprice uniform over [0, 40.96); quantity: 90% mass
        # at one point, tail uniform
        rows.append((i / 100.0, 5.0 if i % 10 else i / 100.0))
    d = spark.createDataFrame(rows, "l_extendedprice double, l_quantity double")
    got = {
        (r.column_name, r.pred): r for r in selectivity_audit(d).collect()
    }
    for (c, p), r in got.items():
        assert r.true_rows > 0, (c, p)
        if c == "l_extendedprice":
            # uniform: estimate within ~2% of truth
            assert r.q_error_milli <= 1050, (c, p, r)
    # every predicate of both columns is present (5 x 2 rows)
    assert len(got) == 10


def test_rrf_fusion_exact_vs_pure_python(spark):
    """Planted rankers with partial overlap: the fused top list must
    equal a pure-Python RRF@N computation including integer scaling."""
    from corhist_spark.retrieval import rrf_fusion, RRF_K, RRF_OUT, RRF_TOPN

    rows = []
    for i in range(300):
        # quality rank ~ i asc on doc 0.., length rank reversed-ish
        text = "a" * (300 - i) + "0" * i      # alpha ratio decreasing
        rows.append((i, text, "src0", 300))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    got = [(r.fused_rank, r.doc_id, r.rrf_scaled)
           for r in rrf_fusion(d).orderBy("fused_rank").collect()]

    q = {i: (1000 * (300 - i)) // 300 for i in range(300)}
    ln = {i: 300 for i in range(300)}
    def ranks(score):
        order = sorted(range(300), key=lambda i: (-score[i], i))[:RRF_TOPN]
        return {doc: 1000000 // (RRF_K + r + 1) for r, doc in enumerate(order)}
    fused = {}
    for contrib in (ranks(q), ranks(ln)):
        for doc, c in contrib.items():
            fused[doc] = fused.get(doc, 0) + c
    order = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_OUT]
    want = [(r + 1, doc, s) for r, (doc, s) in enumerate(order)]
    assert got == want


def test_media_phash_exact_vs_pure_python(spark):
    """Planted payload refs: the packed byte-histogram signature and
    the collision grouping must match a pure-Python replica; anagram
    refs collide (same byte multiset), distinct-histogram refs do
    not."""
    from corhist_spark.multimodal import (
        media_phash,
        media_spans,
        PHASH_BUCKETS,
        PHASH_BITS_PER,
    )
    from pyspark.sql import functions as SF

    spans = spark.createDataFrame(
        [
            ("d1", 0, "image", "abcdefgh"),
            ("d2", 0, "image", "hgfedcba"),     # anagram -> same sig
            ("d3", 0, "audio", "abcdefgi"),     # different histogram
            ("d4", 0, "audio", "abcdefgh"),     # exact dup of d1
        ],
        "doc_id string, span_idx int, kind string, media_ref string",
    )
    got = {r.sig: (r.n_payloads, r.n_docs)
           for r in media_phash(media_spans(spans)).collect()}

    def sig(ref):
        hist = [0] * PHASH_BUCKETS
        for byte in ref.encode():
            hist[byte % PHASH_BUCKETS] += 1
        s = 0
        for i, c in enumerate(hist):
            s |= min(c, 15) << (PHASH_BITS_PER * i)
        return s

    assert sig("abcdefgh") == sig("hgfedcba")
    assert sig("abcdefgh") != sig("abcdefgi")
    assert got == {sig("abcdefgh"): (3, 3)}


def test_quantile_normalize_mapping(spark):
    """A hot-scored source maps down onto corpus quantiles: its
    maximum maps to the corpus maximum, medians align, and the
    mapping is monotone."""
    from corhist_spark.textops import quantile_normalize

    rows = (
        [("hot", v) for v in (100, 200, 300, 400)]
        + [("cold", v) for v in (1, 2, 3, 4)]
    )
    d = spark.createDataFrame(rows, "source string, n_chars long")
    got = {(r.grp, r.val): r.norm_val
           for r in quantile_normalize(d).collect()}
    # hot's top value (pos 4/4) -> corpus max 400; hot's min (pos 1/4)
    # -> corpus value at rank ceil(8/4)=2 -> 2
    assert got[("hot", 400)] == 400
    assert got[("hot", 100)] == 2
    assert got[("cold", 4)] == 400
    assert got[("cold", 1)] == 2
    # monotone within each source
    for g in ("hot", "cold"):
        vals = sorted(v for gg, v in got if gg == g)
        norms = [got[(g, v)] for v in vals]
        assert norms == sorted(norms)


def test_q5_q10_plans_broadcast_and_take_ordered(spark):
    """Plan shape for the TPC-H pair: the dimension joins broadcast
    (never sort-merge a 25-row nation), Q10's top-20 compiles to
    TakeOrderedAndProject (distributed top-k, no global sort)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_q5", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    sf = "/root/testdata/sf0.001"
    q5 = entry.queries()["local_supplier_volume"](spark, sf)
    p5 = q5._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p5
    assert "CartesianProduct" not in p5
    q10 = entry.queries()["returned_item_report"](spark, sf)
    p10 = q10._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p10
    assert "CartesianProduct" not in p10
    # semantic spot checks: revenue positive, ranks contiguous
    rows = q10.collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.revenue_scaled > 0 for r in rows)


def test_denial_constraints_planted_violations(spark):
    """Planted dirty rows: each rule catches exactly its violations;
    clean rules report zero with the row present."""
    import datetime as dt

    from corhist_spark.textops import denial_constraints

    base = dt.datetime(2024, 1, 10)
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.05, base + dt.timedelta(days=5), 3.0),
            (1, -5.0, 0.05, base + dt.timedelta(days=5), 3.0),   # neg price
            (2, 100.0, 1.5, base + dt.timedelta(days=5), 3.0),   # bad disc
            (2, 100.0, 0.05, base - dt.timedelta(days=20), 3.0), # early ship
            (2, 100.0, 0.05, base + dt.timedelta(days=5), 3.25), # frac qty
        ],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_shipdate timestamp, l_quantity double",
    )
    o = spark.createDataFrame(
        [(1, base), (2, base)], "o_orderkey long, o_orderdate timestamp"
    )
    got = {r.rule: r for r in denial_constraints(li, o).collect()}
    assert got["negative_price"].n_violations == 1
    assert got["discount_range"].n_violations == 1
    assert got["ship_before_order"].n_violations == 1
    assert got["qty_not_integral"].n_violations == 1
    assert all(r.n_rows == 5 for r in got.values())
    assert got["negative_price"].violation_ppm == 200000


def test_cube_profile_levels(spark):
    """The cube covers all four grouping levels with consistent
    totals."""
    from corhist_spark.textops import cube_profile

    d = spark.createDataFrame(
        [(1, "s1", "en", 10), (2, "s1", "de", 20), (3, "s2", "en", 30)],
        "doc_id long, source string, lang string, n_chars long",
    )
    rows = cube_profile(d).collect()
    by = {(r.source, r.lang): r for r in rows}
    assert by[("<all>", "<all>")].n_docs == 3
    assert by[("<all>", "<all>")].total_chars == 60
    assert by[("s1", "<all>")].n_docs == 2
    assert by[("<all>", "en")].total_chars == 40
    assert by[("s1", "en")].n_docs == 1
    assert by[("<all>", "<all>")].gid == 3
    assert by[("s1", "en")].gid == 0
    assert by[("s1", "<all>")].gid == 1   # lang aggregated -> LSB
    assert by[("<all>", "en")].gid == 2
    assert len(rows) == 1 + 2 + 2 + 3     # all, 2 srcs, 2 langs, 3 pairs


def test_merkle_manifest_exact_and_sensitive(spark):
    """The root matches a pure-Python fold, is insensitive to input
    row order, and flips on any single-document content change."""
    import hashlib

    from corhist_spark.textops import merkle_manifest, MERKLE_LEVELS

    rows = [(i, f"text {i}", "s1", 10) for i in range(5)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    got = merkle_manifest(d).collect()[0]

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    level = [md5(f"{i}:{md5(f'text {i}')}") for i in range(5)]
    for _ in range(MERKLE_LEVELS):
        nxt = []
        for i in range(0, len(level), 2):
            if i + 1 < len(level):
                nxt.append(md5(level[i] + level[i + 1]))
            else:
                nxt.append(level[i])
        level = nxt
    assert (got.n_docs, got.root) == (5, level[0])
    # order-insensitive
    d2 = spark.createDataFrame(
        list(reversed(rows)),
        "doc_id long, text string, source string, n_chars long",
    )
    assert merkle_manifest(d2).collect()[0].root == got.root
    # content-sensitive
    rows3 = rows[:2] + [(2, "text 2 CHANGED", "s1", 10)] + rows[3:]
    d3 = spark.createDataFrame(
        rows3, "doc_id long, text string, source string, n_chars long"
    )
    assert merkle_manifest(d3).collect()[0].root != got.root


def test_txn_conflicts_first_writer_wins(spark):
    """Planted overlapping write sets: conflicts and the first-writer
    resolution counted exactly."""
    import datetime as dt

    from corhist_spark.textops import txn_conflicts

    base = dt.datetime(2024, 1, 1)
    # users 0,1 written by BOTH batches; user 2 only even; user 3 only
    # odd. Even batch writes user 0 EARLIER, odd writes user 1 earlier.
    rows = [
        (0, base + dt.timedelta(minutes=1), 0),    # even, u0 early
        (1, base + dt.timedelta(minutes=9), 0),    # odd,  u0 late
        (2, base + dt.timedelta(minutes=8), 1),    # even, u1 late
        (3, base + dt.timedelta(minutes=2), 1),    # odd,  u1 early
        (4, base + dt.timedelta(minutes=3), 2),    # even only
        (5, base + dt.timedelta(minutes=4), 3),    # odd only
    ]
    d = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    r = txn_conflicts(d).collect()[0]
    assert (r.n_keys_a, r.n_keys_b) == (3, 3)
    assert r.n_conflicts == 2
    assert (r.a_wins, r.b_wins) == (1, 1)


def test_knn_filtered_semantics(spark):
    """Filtered top-k must equal brute force over ONLY the labeled
    subset — a post-filtered unfiltered top-k would differ on the
    planted layout."""
    import math

    from corhist_spark.similarity import knn_filtered

    # queries 0,1; label-1 corpus vectors are FAR from the queries,
    # label-0 vectors are near: post-filtering an unfiltered top-3
    # would return nothing, the correct filtered search returns the
    # far label-1 vectors.
    pts = [
        (0, [1.0, 0.0], 0), (1, [0.99, 0.1], 0),
        (2, [0.98, 0.05], 0), (3, [0.97, 0.2], 0),   # near, label 0
        (10, [0.0, 1.0], 1), (11, [0.1, 1.0], 1),
        (12, [-0.2, 1.0], 1), (13, [0.2, 0.9], 1),   # far, label 1
    ]
    d = spark.createDataFrame(
        pts, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r.query_id, r.rn): (r.neighbor_id, r.sim)
        for r in knn_filtered(d, label=1, k=3, n_queries=2).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num / (math.sqrt(sum(x * x for x in a))
                   * math.sqrt(sum(x * x for x in b))), 3
        )

    for qid in (0, 1):
        qv = dict((i, v) for i, v, _ in pts)[qid]
        cands = sorted(
            ((cos(qv, v), -i) for i, v, l in pts if l == 1),
            reverse=True,
        )[:3]
        for rn, (sim, negi) in enumerate(cands, 1):
            nid, s = got[(qid, rn)]
            assert nid == -negi and abs(s - sim) < 1e-9, (qid, rn)
    # every returned neighbor is label 1
    assert all(nid >= 10 for nid, _ in got.values())


def test_good_turing_exact(spark):
    """Planted token counts: freq-of-freq, r*, and mass match hand
    arithmetic (classic GT sanity: r*_1 relates singletons to
    doubletons)."""
    from corhist_spark.textops import good_turing

    # tokens: 'a' x1, 'b' x1, 'c' x1 (N1=3); 'd' x2 (N2=1); 'e' x4
    rows = [(1, "a b c d d e e e e")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.r: r for r in good_turing(d).collect()}
    assert got[1].n_r == 3 and got[2].n_r == 1 and got[4].n_r == 1
    # r*=...: r=1: (2 * N2)/N1 = 2/3 -> 666 milli
    assert got[1].r_star_milli == (1000 * 2 * 1) // 3
    # r=2: next r is 4, not 3 -> NULL
    assert got[2].r_star_milli is None
    assert got[4].r_star_milli is None
    # masses: N=9 tokens; r=1 mass 3/9, r=2 mass 2/9, r=4 mass 4/9
    assert got[1].mass_ppm == (10**6 * 3) // 9
    assert got[2].mass_ppm == (10**6 * 2) // 9
    assert got[4].mass_ppm == (10**6 * 4) // 9


def test_nextevent_eval_exact(spark):
    """Planted transitions: hit@1 counts transitions into the
    top-popular type; MRR floors per transition."""
    import datetime as dt

    from corhist_spark.textops import nextevent_eval

    base = dt.datetime(2024, 1, 1)
    # popularity: X x6, Y x4, Z x2 -> ranks X=1, Y=2, Z=3
    seq = ["X", "Y", "X", "Z", "X", "Y", "X", "Y", "X", "Z", "X", "Y"]
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, t) for i, t in enumerate(seq)
    ]
    d = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r.prev_type: r for r in nextevent_eval(d).collect()}
    # transitions from X: -> Y,Z,Y,Y,Z,Y (6): hits(next==X)=0
    assert got["X"].n_transitions == 6
    assert got["X"].hit1_pm == 0
    # from Y: -> X,X,X (3): all hit
    assert got["Y"].n_transitions == 3
    assert got["Y"].hit1_pm == 1000
    assert got["Y"].mrr_milli == 1000
    # from X MRR: nexts are Y(rank2) x4, Z(rank3) x2:
    # (4*500 + 2*333) // 6 = 2666 // 6 = 444
    assert got["X"].mrr_milli == (4 * 500 + 2 * 333) // 6


def test_synthetic_marginals_contract(spark):
    """A strongly dependent planted table: marginal TVDs stay small,
    real joint TVD is large, synthetic joint TVD collapses."""
    from corhist_spark.textops import synthetic_marginals

    # perfect dependence: status == priority group
    rows = [(i, "A" if i % 2 == 0 else "B",
             "P1" if i % 2 == 0 else "P2") for i in range(400)]
    d = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_orderpriority string"
    )
    got = {r.metric: r.tvd_ppm for r in synthetic_marginals(d).collect()}
    # joint real: cells (1/2,1/2,0,0) vs products (all 1/4):
    # sum|diff| = 1 -> TVD = 1/2 = 500000
    assert got["joint_tvd_real"] == 500_000
    # synthetic: dependence destroyed (sampling noise only)
    assert got["joint_tvd_synth"] < 100_000
    # marginals preserved up to hash-sampling noise
    assert got["marginal_tvd:o_orderstatus"] < 100_000
    assert got["marginal_tvd:o_orderpriority"] < 100_000


def test_dim_energy_exact(spark):
    """Planted vectors with one dominant dimension: energy order,
    shares and cumulative curve match hand sums."""
    from corhist_spark.similarity import dim_energy

    pts = [
        (0, [0.0, 0.5, 0.0]), (1, [0.001, -0.5, 0.1]),
        (2, [0.0, 0.5, -0.1]), (3, [0.001, -0.5, 0.2]),
    ]
    d = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = {r.dim: r for r in dim_energy(d).collect()}
    import math

    import numpy as np

    # quantize through float32 exactly as the stored column does
    q = [
        [math.floor(float(np.float32(x)) * 1000) for x in v]
        for _, v in pts
    ]
    vn = []
    for dim in range(3):
        xs = [row[dim] for row in q]
        vn.append(len(xs) * sum(x * x for x in xs) - sum(xs) ** 2)
    tv = sum(vn)
    den = max(1, tv // 10**6)
    for dim in range(3):
        assert got[dim].var_num == vn[dim]
        assert got[dim].energy_ppm == vn[dim] // den
    assert got[1].energy_rank == 1           # dominant dim
    assert got[1].cum_energy_ppm == vn[1] // den


def test_design_effect_extremes(spark):
    """Identical values within each source but different across ->
    ICC ~1, DEFF ~ group size; fully mixed values -> ICC ~0."""
    from corhist_spark.textops import design_effect

    clustered = [("s%d" % g, 100 * (g + 1)) for g in range(4)
                 for _ in range(25)]
    d1 = spark.createDataFrame(clustered, "source string, n_chars long")
    r1 = design_effect(d1).collect()[0]
    assert r1.ssw == 0
    assert r1.icc_ppm > 990_000
    assert r1.deff_milli > 24_000           # ~1 + 24*1.0

    mixed = [("s%d" % (i % 4), 100 * (i % 4 + 1)) for i in range(100)]
    # same values rotated across sources -> groups identical
    mixed = [("s%d" % (i % 4), 100 * ((i // 4) % 4 + 1))
             for i in range(100)]
    d2 = spark.createDataFrame(mixed, "source string, n_chars long")
    r2 = design_effect(d2).collect()[0]
    assert r2.icc_ppm < 50_000
    assert r2.deff_milli < 2_000


def test_window_profile_ntile_semantics(spark):
    """12 docs in one source: NTILE(10) puts the 2 remainder rows in
    tiles 1 and 2 (sizes 2,2,1,...,1) — pinned."""
    from corhist_spark.textops import window_profile

    rows = [(i, "s1", (i + 1) * 10) for i in range(12)]
    d = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r.decile: r for r in window_profile(d).collect()}
    assert got[1].n_docs == 2 and got[2].n_docs == 2
    assert all(got[k].n_docs == 1 for k in range(3, 11))
    assert got[1].lo == 10 and got[1].hi == 20
    assert got[10].lo == got[10].hi == 120


def test_time_to_event_exact(spark):
    """Planted funnel: delays and censoring counted exactly; a
    purchase BEFORE the first view does not count as conversion."""
    import datetime as dt

    from corhist_spark.textops import time_to_event

    base = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, uid, typ):
        return (eid, base + dt.timedelta(minutes=minutes), uid, typ)

    rows = [
        ev(1, 0, 1, "view"), ev(2, 10, 1, "purchase"),     # delay 600
        ev(3, 0, 2, "view"), ev(4, 40, 2, "purchase"),     # delay 2400
        ev(5, 0, 3, "view"),                               # censored
        ev(6, 0, 4, "purchase"), ev(7, 10, 4, "view"),     # censored
        ev(8, 0, 5, "click"),                              # not at risk
        ev(9, 0, 6, "view"), ev(10, 20, 6, "purchase"),    # delay 1200
        ev(11, 30, 6, "purchase"),                         # later ignored
    ]
    d = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = time_to_event(d).collect()[0]
    assert r.n_risk == 5            # users 1,2,3,4,6 saw a view
    assert r.n_converted == 3
    assert r.censor_pm == (1000 * 2) // 5
    # delays sorted: 600, 1200, 2400
    assert (r.p25_s, r.p50_s, r.p75_s) == (600, 1200, 2400)
