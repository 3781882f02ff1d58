"""Wikibase value serialization for all six value kinds
(`corhist/.../game/SimpleValueSerializer.java:20-64`), driven by the
``obj_kind`` column of the lexical data model (SURVEY §1.1 row 9):

  iri         -> {"id": ...}                       (entity-id value)
  string      -> plain string
  langString  -> {"language", "text"}   lexical form: text@lang
  dateTime    -> {"time", "timezone", "before", "after", "precision",
                  "calendarmodel"}      lexical: iso8601|precision|calendar
  coords      -> {"latitude", "longitude", "precision", "globe"}
                                        lexical: lat|lon|precision|globe
  quantity    -> {"amount", "unit"}     lexical: amount|unit

Pure column expressions (split + to_json on typed structs) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def serialize_value(obj, obj_kind):
    """-> JSON string column mirroring SimpleValueSerializer.

    Optional lexical parts use ``F.get`` (NULL past the end), NOT
    ``getItem`` — under Spark 4 ANSI mode an out-of-bounds getItem
    RAISES, which made the documented defaults (precision 11,
    Gregorian calendar, unit "1") unreachable for short lexical forms
    like ``+2024-01-01T00:00:00Z``."""
    part = F.split(obj, r"\|")
    entity = F.to_json(F.struct(obj.alias("id")))
    plain = F.to_json(F.struct(obj.alias("value")))  # wrapped for JSON framing
    lang = F.to_json(
        F.struct(
            F.regexp_extract(obj, "@([a-zA-Z-]+)$", 1).alias("language"),
            F.regexp_replace(obj, "@[a-zA-Z-]+$", "").alias("text"),
        )
    )
    date = F.to_json(
        F.struct(
            F.get(part, 0).alias("time"),
            F.lit(0).alias("timezone"),
            F.lit(0).alias("before"),
            F.lit(0).alias("after"),
            F.coalesce(F.get(part, 1).cast("int"), F.lit(11)).alias("precision"),
            F.coalesce(F.get(part, 2), F.lit("Q1985727")).alias("calendarmodel"),
        )
    )
    coords = F.to_json(
        F.struct(
            F.get(part, 0).cast("double").alias("latitude"),
            F.get(part, 1).cast("double").alias("longitude"),
            F.coalesce(F.get(part, 2).cast("double"), F.lit(0.000001)).alias("precision"),
            F.coalesce(F.get(part, 3), F.lit("Q2")).alias("globe"),
        )
    )
    quantity = F.to_json(
        F.struct(
            F.get(part, 0).alias("amount"),
            F.coalesce(F.get(part, 1), F.lit("1")).alias("unit"),
        )
    )
    return (
        F.when(obj_kind == "iri", entity)
        .when(obj_kind == "langString", lang)
        .when(obj_kind == "dateTime", date)
        .when(obj_kind == "coords", coords)
        .when(obj_kind == "quantity", quantity)
        .otherwise(plain)
    )


def parse_entity_id(col):
    """Q/P/L id extraction (`SimpleValueSerializer.java:122-133`)."""
    return F.regexp_extract(col, r"([QPL]\d+)$", 1)
