"""Multimodal span handling: media payloads are opaque binary columns
with typed metadata; decode / feature-extraction are Arrow-batched
stubs (image/audio libraries are not available in this environment —
the Spark-side plumbing, schemas and batch shapes are real and tested;
the decoders raise or produce deterministic fakes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("kind", StringType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("kind", StringType()),
        StructField("media_ref", StringType()),
        StructField("feature_hash", StringType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def media_spans(spans: DataFrame) -> DataFrame:
    """Non-text spans with a deterministic fake payload (the media_ref
    bytes) standing in for fetched binary content.  In production this
    column is read from the object store by ref."""
    return spans.filter(F.col("kind") != "text").select(
        "doc_id",
        "span_idx",
        "kind",
        "media_ref",
        F.encode("media_ref", "utf-8").alias("payload"),
    )


def decode_media(payload: bytes, kind: str) -> bytes:
    """STUB: real image/audio decode (PIL/torchaudio/ffmpeg) is not
    available in this container (absence re-verified rounds 2-5:
    PIL/cv2/soundfile all unimportable)."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not "
        "present in this environment; extract_media_features uses a "
        "deterministic fake instead"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas.  The 'feature' is a deterministic hash of the payload
    (a stand-in for an embedding); batch shape and schema match what a
    real extractor would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "span_idx", "kind", "media_ref"]].copy()
            out["feature_hash"] = pdf["payload"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()
            )
            out["n_bytes"] = pdf["payload"].map(len).astype("int32")
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 4, every: int = 2) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas: treat the
    payload as a sequence of ``frame_bytes``-byte frames and keep every
    ``every``-th one, emitting (doc_id, span_idx, frame_idx,
    frame_hash).  Real video frame extraction (ffmpeg) is not available
    in this container — the frame slicing, per-row fan-out inside an
    Arrow batch, and output schema ARE the production plumbing; only
    the codec behind the byte slices is faked."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for doc_id, span_idx, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["payload"]
            ):
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, every):
                    frame = b[i * frame_bytes:(i + 1) * frame_bytes]
                    out_rows.append(
                        {
                            "doc_id": doc_id,
                            "span_idx": int(span_idx),
                            "frame_idx": i,
                            "frame_hash": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                out_rows,
                columns=["doc_id", "span_idx", "frame_idx", "frame_hash"],
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


PHASH_BUCKETS = 16
PHASH_BITS_PER = 4

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("sig", LongType()),
    ]
)


def media_phash(media: DataFrame) -> DataFrame:
    """Perceptual-hash-style media dedup over the BINARY payload
    column: the signature is 16 nibbles, each the (capped-at-15)
    count of payload bytes falling in one mod-16 byte bucket — a
    byte-histogram sketch playing the role a real pHash/DCT signature
    would (the decode behind it stays honestly stubbed, see
    `decode_media`; the Arrow byte-level processing, signature
    packing and collision grouping ARE the production plumbing).
    Payloads whose signatures collide are near-duplicate candidates.

    Returns collision groups: (sig, n_payloads, n_docs) for every
    signature shared by >= 2 payloads.

    Scale shape: one mapInPandas pass (Arrow batches, numpy byte
    histogram per row), then a signature-keyed aggregate — the
    dedup join is hash-grouped, never pairwise."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % PHASH_BUCKETS, minlength=PHASH_BUCKETS)
                sig = 0
                for i, c in enumerate(hist):
                    sig |= min(int(c), 15) << (PHASH_BITS_PER * i)
                sigs.append(sig)
            out = pdf[["doc_id", "span_idx", "media_ref"]].copy()
            out["sig"] = pd.Series(sigs, index=pdf.index, dtype="int64")
            yield out

    signed = media.mapInPandas(run, schema=PHASH_SCHEMA)
    return (
        signed.groupBy("sig")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_payloads") >= 2)
    )
