"""Edit synthesis: correction statement sets -> MediaWiki wb* actions.

Transcribes `corhist/.../game/WikidataEditBuilder.java:32-132`:
- 1 statement: addition -> wbcreateclaim, deletion -> wbremoveclaims
- 2 statements (1 add + 1 del, same subject+predicate, different
  object) -> wbsetclaimvalue (replacement)
- anything else -> unsupported (NULL edit)

Claim GUIDs: when a statement-node snapshot is supplied (the p:/ps:
layout game.py models), the GUID is resolved like `getGuids`
(`WikidataEditBuilder.java:134-142`): entity --p:prop--> statement
node --ps:prop--> value, localName's first '-' replaced by '$', and
the edit is dropped (NULL) unless EXACTLY one statement matches
(`:78-88,114-117`).  Without a snapshot the deterministic fallback
GUID ``<entity>$<md5 of s|p|o>`` keeps offline parity runs executable.

Everything is pure column expressions plus (when resolving) one
equi-join against the statement-node table keyed on the deleted
triple — no per-row Python anywhere.
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


def _munge_guid(stmt_col):
    """Statement-node localName -> claim GUID: first '-' becomes '$'
    (`WikidataEditBuilder.java:141` replaceFirst)."""
    pos = F.instr(stmt_col, "-")
    return F.when(
        pos > 0,
        F.concat(
            F.substring(stmt_col, F.lit(1), pos - 1),
            F.lit("$"),
            F.substring(stmt_col, pos + 1, F.length(stmt_col)),
        ),
    ).otherwise(stmt_col)


def statement_nodes_from_snapshot(snapshot: DataFrame) -> DataFrame:
    """(subj, pred, obj) snapshot with 'p:'/'ps:' pred prefixes ->
    (entity, prop, value, guid): the entity -p:-> node -ps:-> value
    walk of `getGuids`."""
    p = snapshot.filter(F.col("pred").startswith("p:")).select(
        F.col("subj").alias("entity"),
        F.expr("substr(pred, 3)").alias("prop"),
        F.col("obj").alias("stmt"),
    )
    ps = snapshot.filter(F.col("pred").startswith("ps:")).select(
        F.col("subj").alias("ps_stmt"),
        F.expr("substr(pred, 4)").alias("ps_prop"),
        F.col("obj").alias("value"),
    )
    return (
        p.join(ps, (F.col("stmt") == F.col("ps_stmt")) & (F.col("prop") == F.col("ps_prop")))
        .select("entity", "prop", "value", _munge_guid(F.col("stmt")).alias("guid"))
        .distinct()
    )


def build_edits(corrections: DataFrame, statement_nodes: DataFrame | None = None) -> DataFrame:
    """corrections(..., correction array<struct<subj,pred,obj,op>>) ->
    + edit struct<action:string, params:map<string,string>> (NULL when
    the diff shape is unsupported, or — with a snapshot — when the
    deleted claim does not resolve to exactly one GUID)."""
    c = F.col("correction")
    adds = F.filter(c, lambda s: s["op"] == "add")
    dels = F.filter(c, lambda s: s["op"] == "del")
    one = F.element_at(c, 1)
    a1 = F.element_at(adds, 1)
    d1 = F.element_at(dels, 1)

    # the deleted statement whose GUID a remove/replace needs
    del_stmt = F.when((F.size(c) == 1) & (one["op"] == "del"), one).when(
        (F.size(c) == 2) & (F.size(adds) == 1) & (F.size(dels) == 1), d1
    )
    df = corrections.withColumn("_del_stmt", del_stmt)

    if statement_nodes is None:
        guid_del = F.when(
            F.col("_del_stmt").isNotNull(),
            _guid(F.col("_del_stmt.subj"), F.col("_del_stmt.pred"), F.col("_del_stmt.obj")),
        )
        df = df.withColumn("_guid", guid_del)
    else:
        # exactly-one-match requirement of `getGuids` callers
        sn = statement_nodes.groupBy("entity", "prop", "value").agg(
            F.count(F.lit(1)).alias("_n_guid"), F.min("guid").alias("_g")
        )
        df = df.join(
            sn,
            (F.col("_del_stmt.subj") == F.col("entity"))
            & (F.col("_del_stmt.pred") == F.col("prop"))
            & (F.col("_del_stmt.obj") == F.col("value")),
            "left",
        ).withColumn("_guid", F.when(F.col("_n_guid") == 1, F.col("_g")))
        df = df.drop("entity", "prop", "value", "_n_guid", "_g")

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
            F.array(F.lit("claim")), F.array(F.col("_guid"))
        ).alias("params"),
    )
    replace = F.struct(
        F.lit("wbsetclaimvalue").alias("action"),
        F.map_from_arrays(
            F.array(F.lit("claim"), F.lit("snaktype"), F.lit("value")),
            F.array(F.col("_guid"), F.lit("value"), _value_json(a1["obj"])),
        ).alias("params"),
    )
    edit = (
        F.when((F.size(c) == 1) & (one["op"] == "add"), create)
        .when((F.size(c) == 1) & (one["op"] == "del") & F.col("_guid").isNotNull(), remove)
        .when(
            (F.size(c) == 2)
            & (F.size(adds) == 1)
            & (F.size(dels) == 1)
            & (a1["subj"] == d1["subj"])
            & (a1["pred"] == d1["pred"])
            & (a1["obj"] != d1["obj"])
            & F.col("_guid").isNotNull(),
            replace,
        )
    )
    return df.withColumn("edit", edit).drop("_del_stmt", "_guid")
