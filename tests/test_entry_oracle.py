"""Mirror of the driver's correctness harness: run every
`__spark_entry__.queries()` entry on sf0.01 and compare row-for-row
against its `oracle_sql()` via DuckDB (columns sorted by name, rows
sorted, exact value equality)."""

from __future__ import annotations

import math
import os
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 9) if not math.isnan(v) else "nan")
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    if name not in ORACLES:
        pytest.skip("rows-only query (no SQL oracle)")
    got = QUERIES[name](spark, SF_DIR).toPandas()
    con = _duck()
    want = con.sql(ORACLES[name]).df()
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, want.columns)), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    want.columns = [c.lower() for c in want.columns]
    got.columns = [c.lower() for c in got.columns]
    g, w = _normalize(got), _normalize(want)
    assert len(g) == len(w), f"{name}: row count {len(g)} vs oracle {len(w)}"
    mismatches = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{g[mismatches[0]]} vs {w[mismatches[0]]}"
    )
