"""Salted-join equivalence on the fixture's hot-entity cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from corhist_spark.fixtures import HOT_ENTITY
from corhist_spark.skew import hot_keys, salted_join


def test_hot_key_detected(spark, sdf):
    adds = sdf["edits"].filter(F.col("op") == "add")
    hot = {r.obj for r in hot_keys(adds, "obj", threshold_share=0.05).collect()}
    assert HOT_ENTITY in hot  # the planted Q5-analog cluster


def test_salted_join_equals_plain_join(spark, sdf):
    adds = sdf["edits"].filter(F.col("op") == "add").select("subj", "pred", "obj")
    dim = spark.createDataFrame(
        [(HOT_ENTITY, "hot"), ("Q5000", "cold"), ("Q900", "class")],
        "obj string, label string",
    )
    plain = {(r.subj, r.pred, r.obj, r.label) for r in adds.join(dim, "obj").collect()}
    salted = {
        (r.subj, r.pred, r.obj, r.label)
        for r in salted_join(adds, dim, "obj", n_salts=4).collect()
    }
    assert salted == plain and plain
