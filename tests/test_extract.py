"""Extraction pipeline tests: span-sequence invariant (BASELINE.json
per-row gate), mention detection vs an inline regex oracle, triple
emission, canonicalization remap, multimodal plumbing."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from corhist_spark.canonicalize import canonicalize_triples, connected_components
from corhist_spark.extract import (
    aggregate_triples,
    explode_spans,
    extract_mentions,
    extract_triples,
    reassemble_spans,
)
from corhist_spark.multimodal import extract_media_features, media_spans


def test_span_sequence_equality(spark, sdf):
    """Per-row invariant: explode -> reassemble preserves (kind, text,
    media_ref, order) exactly."""
    docs = sdf["documents"]
    back = reassemble_spans(explode_spans(docs))
    orig = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans] for r in docs.collect()}
    got = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans] for r in back.collect()}
    assert got == orig


def test_mention_detection_matches_regex_oracle(spark, sdf, corpus):
    got = {}
    for r in extract_mentions(explode_spans(sdf["documents"])).collect():
        got[(r.doc_id, r.span_idx)] = [(m.entity, m.start) for m in r.mentions]
    rx = re.compile(r"\bQ\d+\b")
    for rec in corpus["documents"].to_dict("records"):
        for i, s in enumerate(rec["spans"]):
            if s["kind"] != "text":
                continue
            want = [(m.group(0), m.start()) for m in rx.finditer(s["text"])]
            assert got.get((rec["doc_id"], i), []) == want


def test_triples_shape_and_scores(spark, sdf):
    t = extract_triples(sdf["documents"])
    rows = t.collect()
    assert rows, "no triples extracted"
    for r in rows[:200]:
        assert r.subj.startswith("Q") and r.obj.startswith("Q") and r.pred.startswith("P")
        assert 0.0 < r.score <= 1.0
    agg = aggregate_triples(t)
    assert agg.count() <= len(rows)


def test_canonicalize_remaps_triples(spark, sdf):
    comps = connected_components(sdf["sameas_edges"])
    # every member of a component maps to its lexicographic min
    by_node = {r.node: r.component for r in comps.collect()}
    assert by_node, "no components"
    for n, c in by_node.items():
        assert c <= n
    t = aggregate_triples(extract_triples(sdf["documents"]))
    remapped = canonicalize_triples(t, comps)
    rows = remapped.collect()
    for r in rows:
        assert by_node.get(r.subj, r.subj) == r.subj  # already canonical


def test_multimodal_features(spark, sdf):
    media = media_spans(explode_spans(sdf["documents"]))
    feats = extract_media_features(media)
    rows = feats.collect()
    assert rows, "no media spans in fixture"
    for r in rows[:50]:
        assert r.kind in ("image", "audio", "table")
        assert len(r.feature_hash) == 32 and r.n_bytes > 0


def test_frame_sampling(spark, sdf):
    """Frame sampler: every 2nd 4-byte frame, hashes match a direct
    Python slice of the same payload bytes."""
    import hashlib

    from corhist_spark.multimodal import media_spans, sample_frames
    from corhist_spark.extract import explode_spans

    media = media_spans(explode_spans(sdf["documents"]))
    payloads = {
        (r.doc_id, r.span_idx): bytes(r.payload) for r in media.collect()
    }
    rows = sample_frames(media).collect()
    assert rows, "no frames sampled"
    seen = set()
    for r in rows:
        b = payloads[(r.doc_id, r.span_idx)]
        assert r.frame_idx % 2 == 0
        frame = b[r.frame_idx * 4:(r.frame_idx + 1) * 4]
        assert r.frame_hash == hashlib.md5(frame).hexdigest()
        seen.add((r.doc_id, r.span_idx, r.frame_idx))
    # completeness: every expected frame index is present
    for key, b in payloads.items():
        for i in range(0, len(b) // 4, 2):
            assert (key[0], key[1], i) in seen


def test_frame_sampling_multibyte_payload(spark):
    """Byte-correctness on non-ASCII payloads: frames are sliced from
    the UTF-8 BYTES, not characters (the driver oracle constrains its
    derived input to ASCII only because DuckDB lacks blob substring —
    the engine itself must be byte-exact for any payload)."""
    import hashlib

    from corhist_spark.multimodal import sample_frames

    ref = "naïveté-xyz"  # 11 chars, 13 utf-8 bytes -> 3 frames, keep 0 and 2
    b = ref.encode("utf-8")
    media = spark.createDataFrame(
        [("d1", 0, "image", ref, bytearray(b))],
        "doc_id string, span_idx int, kind string, media_ref string, payload binary",
    )
    rows = {r.frame_idx: r.frame_hash for r in sample_frames(media).collect()}
    assert set(rows) == {0, 2}
    assert rows[0] == hashlib.md5(b[0:4]).hexdigest()
    assert rows[2] == hashlib.md5(b[8:12]).hexdigest()


def test_el_candidates_commonness_and_rank(spark):
    import hashlib

    from corhist_spark.extract import el_candidates

    mentions = spark.createDataFrame([("abcdef",), ("zzzzzz",)], "mention string")
    pop = spark.createDataFrame(
        [(f"Q{i}", (i + 1) * 10) for i in range(7)], "entity string, n_triples long"
    )
    got = el_candidates(mentions, pop, id_space=7).collect()

    def cand(m, k):
        h = int(hashlib.md5(f"{m}:{k}".encode()).hexdigest()[:13], 16) % 7
        return f"Q{h}"

    for m in ("abcdef", "zzzzzz"):
        expect = sorted({cand(m, k) for k in range(3)})
        rows = sorted(
            [r for r in got if r["mention"] == m], key=lambda r: r["cand_rank"]
        )
        assert sorted(r["candidate"] for r in rows) == expect
        # rank order = popularity desc; commonness sums to ~1
        pops = [r["n_triples"] for r in rows]
        assert pops == sorted(pops, reverse=True)
        assert abs(sum(r["commonness"] for r in rows) - 1.0) < 1e-5


def test_retrieval_triplets_drops_collisions(spark):
    import hashlib

    from corhist_spark.textops import retrieval_triplets

    pairs = spark.createDataFrame([(0, 1), (2, 3)], "doc_a long, doc_b long")
    got = {(r["anchor"], r["positive"]): r["negative"]
           for r in retrieval_triplets(pairs, id_space=10).collect()}
    for (a, b), n in got.items():
        h = int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:13], 16) % 10
        assert n == h and n not in (a, b)

    plan = (
        retrieval_triplets(pairs, 10)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # one map-side projection, zero shuffles


def test_ner_spans_offsets_reconstruct_surface(spark):
    from corhist_spark.extract import ner_spans

    text = "abcdef xy ghijklm"
    rows = ner_spans(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()
    got = [(r["start"], r["end"], r["surface"]) for r in rows]
    assert sorted(got) == [(1, 7, "abcdef"), (11, 18, "ghijklm")]
    for s, e, surf in got:
        assert text[s - 1 : e - 1] == surf  # substr coordinates hold
