"""Human-readable edit messages for game tiles.

Transcribes `corhist/.../game/EditDescriber.java:39-103`:

- wbcreateclaim   -> ``Add statement (<entity>, <prop>, <value>)``
- wbremoveclaims  -> ``Remove <a href='<WDS><guid>'>statement</a>
                     (<subj>, <prop>, <value>)``
- wbsetclaimvalue -> ``Edit <a href='<WDS><guid>'>statement</a>
                     (<subj>, <prop>, <old value>). Setting value to:
                     <new value>``

The reference renders values through the live ``wbformatvalue`` API and
falls back to ``value.toString()`` when the call fails
(`EditDescriber.java:105-119`); this sandbox has no network, so the
fallback path IS the behavior — entity ids render as themselves and
string literals render as their text, deterministically.

The removed/edited statement is resolved from the statement-node table
(offline stand-in for the ``wbgetclaims`` call of
`EditDescriber.getStatement:74-92`); when the GUID cannot be resolved
the message is NULL, mirroring StatementNotFoundException ->
Optional.empty which drops the tile
(`ConstraintCorrectionsGame.java` buildTile).

Pure column expressions plus one equi-join on the claim GUID.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Vocabulary.WDS_NAMESPACE of the reference (public Wikidata namespace)
WDS_NAMESPACE = "http://www.wikidata.org/entity/statement/"


def _render_value_json(v):
    """Offline `formatValue` fallback: entity ids render as the id,
    string literals as their text (SimpleValueSerializer JSON shapes
    produced by edits_out._value_json)."""
    return F.coalesce(
        F.get_json_object(v, "$.value.id"), F.get_json_object(v, "$.value"), v
    )


def _triple_text(subj, pred, obj):
    return F.concat(F.lit("("), subj, F.lit(", "), pred, F.lit(", "), obj, F.lit(")"))


def _stmt_link(guid):
    return F.concat(F.lit("<a href='" + WDS_NAMESPACE), guid, F.lit("'>statement</a>"))


def describe_edits(edits: DataFrame, statement_nodes: DataFrame | None = None) -> DataFrame:
    """edits(..., edit struct<action,params>) -> + message string.

    ``statement_nodes`` is the (entity, prop, value, guid) table of
    edits_out.statement_nodes_from_snapshot; required to render
    remove/replace messages (their statement text comes from the
    resolved claim, `EditDescriber.java:59-72`)."""
    action = F.col("edit.action")
    params = F.col("edit.params")
    claim = params["claim"]

    if statement_nodes is not None:
        sn = statement_nodes.select(
            F.col("guid").alias("_sn_guid"),
            F.col("entity").alias("_sn_entity"),
            F.col("prop").alias("_sn_prop"),
            F.col("value").alias("_sn_value"),
        ).dropDuplicates(["_sn_guid"])
        df = edits.join(sn, claim == F.col("_sn_guid"), "left")
    else:
        df = (
            edits.withColumn("_sn_guid", F.lit(None).cast("string"))
            .withColumn("_sn_entity", F.lit(None).cast("string"))
            .withColumn("_sn_prop", F.lit(None).cast("string"))
            .withColumn("_sn_value", F.lit(None).cast("string"))
        )

    resolved = F.col("_sn_guid").isNotNull()
    stmt_text = _triple_text(F.col("_sn_entity"), F.col("_sn_prop"), F.col("_sn_value"))

    create_msg = F.concat(
        F.lit("Add statement "),
        _triple_text(params["entity"], params["property"], _render_value_json(params["value"])),
    )
    remove_msg = F.when(
        resolved,
        F.concat(F.lit("Remove "), _stmt_link(claim), F.lit(" "), stmt_text),
    )
    replace_msg = F.when(
        resolved,
        F.concat(
            F.lit("Edit "),
            _stmt_link(claim),
            F.lit(" "),
            stmt_text,
            F.lit(". Setting value to: "),
            _render_value_json(params["value"]),
        ),
    )
    message = (
        F.when(action == "wbcreateclaim", create_msg)
        .when(action == "wbremoveclaims", remove_msg)
        .when(action == "wbsetclaimvalue", replace_msg)
    )
    return df.withColumn("message", message).drop(
        "_sn_guid", "_sn_entity", "_sn_prop", "_sn_value"
    )
