"""Edit synthesis: correction statement sets -> MediaWiki wb* actions.

Transcribes `corhist/.../game/WikidataEditBuilder.java:32-132`:
- 1 statement: addition -> wbcreateclaim, deletion -> wbremoveclaims
- 2 statements (1 add + 1 del, same subject+predicate, different
  object) -> wbsetclaimvalue (replacement)
- anything else -> unsupported (NULL edit)

The reference resolves claim GUIDs from the entity's statement nodes
and requires exactly one match (`:78-88,114-117`); our flat triple
model synthesizes the deterministic GUID ``<entity>$<md5 of s|p|o>``
instead, and an optional statement-node table can be joined upstream
when the full p/ps layout is modeled.

Everything is pure column expressions (when/struct/to_json) — one
narrow projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _value_json(obj_col):
    """Wikibase value JSON for entity-id vs string values (subset of
    `game/SimpleValueSerializer.java:20-64`)."""
    is_entity = obj_col.rlike("^[QPL][0-9]+$")
    ent = F.to_json(
        F.struct(
            F.lit("wikibase-entityid").alias("type"),
            F.struct(obj_col.alias("id")).alias("value"),
        )
    )
    lit = F.to_json(F.struct(F.lit("string").alias("type"), obj_col.alias("value")))
    return F.when(is_entity, ent).otherwise(lit)


def _guid(subj, pred, obj):
    return F.concat(subj, F.lit("$"), F.md5(F.concat_ws("|", subj, pred, obj)))


def build_edits(corrections: DataFrame) -> DataFrame:
    """corrections(..., correction array<struct<subj,pred,obj,op>>) ->
    + edit struct<action:string, params:map<string,string>> (NULL when
    the diff shape is unsupported)."""
    c = F.col("correction")
    adds = F.filter(c, lambda s: s["op"] == "add")
    dels = F.filter(c, lambda s: s["op"] == "del")
    one = F.element_at(c, 1)
    a1 = F.element_at(adds, 1)
    d1 = F.element_at(dels, 1)

    create = F.struct(
        F.lit("wbcreateclaim").alias("action"),
        F.map_from_arrays(
            F.array(F.lit("entity"), F.lit("property"), F.lit("snaktype"), F.lit("value")),
            F.array(one["subj"], one["pred"], F.lit("value"), _value_json(one["obj"])),
        ).alias("params"),
    )
    remove = F.struct(
        F.lit("wbremoveclaims").alias("action"),
        F.map_from_arrays(
            F.array(F.lit("claim")),
            F.array(_guid(one["subj"], one["pred"], one["obj"])),
        ).alias("params"),
    )
    replace = F.struct(
        F.lit("wbsetclaimvalue").alias("action"),
        F.map_from_arrays(
            F.array(F.lit("claim"), F.lit("snaktype"), F.lit("value")),
            F.array(
                _guid(d1["subj"], d1["pred"], d1["obj"]),
                F.lit("value"),
                _value_json(a1["obj"]),
            ),
        ).alias("params"),
    )
    edit = (
        F.when((F.size(c) == 1) & (one["op"] == "add"), create)
        .when((F.size(c) == 1) & (one["op"] == "del"), remove)
        .when(
            (F.size(c) == 2)
            & (F.size(adds) == 1)
            & (F.size(dels) == 1)
            & (a1["subj"] == d1["subj"])
            & (a1["pred"] == d1["pred"])
            & (a1["obj"] != d1["obj"]),
            replace,
        )
    )
    return corrections.withColumn("edit", edit)
