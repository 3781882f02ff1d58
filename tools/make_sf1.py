#!/usr/bin/env python
"""Deterministic sf1 tier: 10x the driver's sf0.1 testdata.

The driver generates sf{0.001,0.01,0.1} only; the 100-TB design claims
deserve at least one measured decade of scale beyond the bench tier
(VERDICT r4 ask 2).  This script synthesises sf1 AS TEN DISJOINT
ID-SHIFTED WORLDS of sf0.1 — no external data, no randomness, fully
reproducible:

- events: event_id/user_id shifted per copy (10 disjoint edit-history
  worlds; the derived-history joins stay internally consistent, ts kept
  so event-time density grows 10x like a real throughput increase).
- documents: doc_id shifted; every token of copies 1-9 is prefixed with
  a copy marker so the corpora are genuinely DISTINCT (verbatim copies
  would turn the dedup benchmarks into a measurement of 10-way
  duplicate collapse instead of 10x scale).
- embeddings: vec_id shifted; a small deterministic per-copy offset is
  added componentwise so vectors are distinct while the space geometry
  is preserved.  Copy 0 keeps ids 0..9, so the fixed query set of the
  ANN benchmarks is unchanged.
- TPC-H dims/facts: key-shifted copies (customer/orders/lineitem etc.)
  so FK joins resolve within each world; region/nation (global tiny
  dims) pass through verbatim.

Usage: python tools/make_sf1.py [src_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/.sf1 (gitignored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from corhist_spark.session import get_spark

COPIES = 10
SHIFT = 10_000_000  # key offset per copy; far above any sf0.1 key


def _shifted(df: DataFrame, k: int, keys: list[str]) -> DataFrame:
    out = df
    for c in keys:
        out = out.withColumn(c, (F.col(c) + F.lit(k * SHIFT)).cast(df.schema[c].dataType))
    return out


def scale_table(name: str, df: DataFrame) -> DataFrame:
    if name in ("region", "nation"):
        return df  # global tiny dims: shared across worlds
    parts = []
    for k in range(COPIES):
        if name == "events":
            parts.append(_shifted(df, k, ["event_id", "user_id"]))
        elif name == "documents":
            d = _shifted(df, k, ["doc_id"])
            if k > 0:
                d = d.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), r"(\S+)", f"c{k}$1"),
                ).withColumn("n_chars", F.length("text"))
            parts.append(d)
        elif name == "embeddings":
            e = _shifted(df, k, ["vec_id"])
            if k > 0:
                e = e.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + F.lit(k * 0.011)).cast("double"),
                    ),
                )
            parts.append(e)
        elif name == "customer":
            # c_nationkey stays — nation is a shared global dim
            parts.append(_shifted(df, k, ["c_custkey"]))
        elif name == "supplier":
            parts.append(_shifted(df, k, ["s_suppkey"]))
        elif name == "part":
            parts.append(_shifted(df, k, ["p_partkey"]))
        elif name == "orders":
            parts.append(_shifted(df, k, ["o_orderkey", "o_custkey"]))
        elif name == "lineitem":
            parts.append(_shifted(df, k, ["l_orderkey", "l_partkey", "l_suppkey"]))
        else:
            parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sf1"
    spark = get_spark("make-sf1", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    os.makedirs(dst, exist_ok=True)
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        df = spark.read.parquet(f"{src}/{name}.parquet")
        out = scale_table(name, df)
        # single file per table, mirroring the driver layout (<t>.parquet)
        tmp = f"{dst}/_tmp_{name}"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(f"{tmp}/{part}", f"{dst}/{name}.parquet")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        print(name, out.count())


if __name__ == "__main__":
    main()
