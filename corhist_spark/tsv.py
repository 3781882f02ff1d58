"""Corrections TSV sink/source — the reference's interchange format
(`corhist/.../dataset/ConstraintViolationCorrection.java:77-86` write,
`:28-52` read): tab-separated
``constraintId  corrRev  targetS  targetP  targetO  ->  (s p o graph)*``
with one 4-tuple per correction statement.

The reference serializes RDF terms as N-Triples; our lexical model
writes entity ids bare and wraps everything else in the same
``<...>`` / ``"..."`` conventions so round-tripping is loss-free.
Escaping covers tab/newline/backslash (the characters the TSV framing
needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ADD_GRAPH = "history:addition"
DEL_GRAPH = "history:deletion"


def _esc(col):
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), r"\t", r"\\t"), r"\n", r"\\n"
    )


def _unesc(col):
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, r"\\n", "\n"), r"\\t", "\t"), r"\\\\", r"\\"
    )


def corrections_to_tsv(corrections: DataFrame) -> DataFrame:
    """-> single-column DataFrame of TSV lines (write with text())."""
    stmt_cols = F.transform(
        F.col("correction"),
        lambda s: F.concat_ws(
            "\t",
            _esc(s["subj"]),
            _esc(s["pred"]),
            _esc(s["obj"]),
            F.when(s["op"] == "add", F.lit(ADD_GRAPH)).otherwise(F.lit(DEL_GRAPH)),
        ),
    )
    line = F.concat_ws(
        "\t",
        _esc(F.col("constraint_id")),
        F.col("corr_rev").cast("string"),
        _esc(F.col("target_subj")),
        _esc(F.col("target_pred")),
        _esc(F.col("target_obj")),
        F.lit("->"),
        F.concat_ws("\t", stmt_cols),
    )
    return corrections.select(line.alias("value"))


def corrections_from_tsv(lines: DataFrame) -> DataFrame:
    """Inverse of corrections_to_tsv (tab split + 4-tuple regrouping,
    mirroring `read()`'s (parts.length - 6) / 4 loop)."""
    p = F.split(F.col("value"), "\t")
    n_stmts = ((F.size(p) - 6) / 4).cast("int")
    stmts = F.transform(
        F.sequence(F.lit(0), n_stmts - 1),
        lambda i: F.struct(
            _unesc(F.element_at(p, 4 * i + 7)).alias("subj"),
            _unesc(F.element_at(p, 4 * i + 8)).alias("pred"),
            _unesc(F.element_at(p, 4 * i + 9)).alias("obj"),
            F.when(F.element_at(p, 4 * i + 10) == ADD_GRAPH, F.lit("add"))
            .otherwise(F.lit("del"))
            .alias("op"),
        ),
    )
    return lines.select(
        _unesc(F.element_at(p, 1)).alias("constraint_id"),
        F.element_at(p, 2).cast("long").alias("corr_rev"),
        _unesc(F.element_at(p, 3)).alias("target_subj"),
        _unesc(F.element_at(p, 4)).alias("target_pred"),
        _unesc(F.element_at(p, 5)).alias("target_obj"),
        F.array_sort(stmts).alias("correction"),
    )
