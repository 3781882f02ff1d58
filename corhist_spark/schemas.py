"""Explicit StructType schemas for every table in the pipeline.

Mirrors FIXTURES.md; the RDF data model of the reference
(`corhist/.../dataset/ConstraintViolationCorrection.java:15-26`,
`Constraint.java:8-24`) is flattened into typed columns — objects stay
N-Triples-style lexical strings plus an ``obj_kind`` tag so equality
semantics match the reference's Value.equals exactly.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

# input_hint shape: interleaved text + media documents.
DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
    ]
)

REVISIONS = StructType(
    [
        StructField("rev_id", LongType(), False),
        StructField("entity", StringType(), False),
        StructField("parent_rev_id", LongType(), True),
        StructField("author", StringType(), False),
        StructField("based_on_rev_id", LongType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

EDITS = StructType(
    [
        StructField("rev_id", LongType(), False),
        StructField("op", StringType(), False),  # 'add' | 'del'
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("obj_kind", StringType(), False),
    ]
)

CONSTRAINTS = StructType(
    [
        StructField("constraint_id", StringType(), False),
        StructField("property", StringType(), False),
        StructField("type", StringType(), False),
        StructField("params", MapType(StringType(), ArrayType(StringType())), False),
    ]
)

SAMEAS_EDGES = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
    ]
)

SUBCLASS_EDGES = StructType(
    [
        StructField("cls", StringType(), False),
        StructField("parent", StringType(), False),
    ]
)

CORRECTION_STMT = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("op", StringType(), False),  # 'add' | 'del'
    ]
)

CORRECTIONS = StructType(
    [
        StructField("constraint_id", StringType(), False),
        StructField("corr_rev", LongType(), False),
        StructField("target_subj", StringType(), False),
        StructField("target_pred", StringType(), False),
        StructField("target_obj", StringType(), False),
        StructField("correction", ArrayType(CORRECTION_STMT), False),
    ]
)

# Constraint-type QIDs (registry at
# `corhist/.../dataset/ConstraintViolationCorrectionLookup.java:25-38`).
TYPE_SINGLE = "Q19474404"
TYPE_UNIQUE = "Q21502410"
TYPE_INVERSE = "Q21510855"
TYPE_SYMMETRIC = "Q21510862"
TYPE_TYPE = "Q21503250"
TYPE_VALUE_TYPE = "Q21510865"
TYPE_TARGET_CLAIM = "Q21510864"
TYPE_ITEM = "Q21503247"
TYPE_CONFLICT = "Q21502838"
TYPE_ONE_OF = "Q21510859"
TYPE_FORMAT = "Q21502404"

# Parameter qualifier PIDs
# (`corhist/.../dataset/QueriesForConstraintCorrectionsBuilder.java:10-20`).
PARAM_ITEM = "P2305"
PARAM_PROPERTY = "P2306"
PARAM_CLASS = "P2308"
PARAM_RELATION = "P2309"
PARAM_REGEX = "P1793"

INSTANCE_OF = "P31"
SUBCLASS_OF = "P279"
REL_INSTANCE = "Q21503252"
REL_SUBCLASS = "Q21514624"
REL_INSTANCE_OR_SUBCLASS = "Q30208840"

SAME_AS = "sameAs"

MAX_REV = (1 << 62)  # stand-in for +infinity in validity intervals
