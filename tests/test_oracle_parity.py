"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, column
names, and order-insensitive values. Runs at sf0.001 (fast); the driver
runs the same comparison at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    """Order-insensitive canonical form, tolerant to int/float repr."""
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if isinstance(row, dict) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    if v == int(v):
                        v = int(v)
            if isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, sf_dir, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = qfn(spark, sf_dir)
    cols = sorted(sdf.columns)
    srows = [r.asDict() for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0
        return
    con = duck_con(sf_dir)
    ddf = con.execute(sql).fetchdf()
    dcols = sorted(ddf.columns.tolist())
    assert cols == dcols, f"{name}: columns {cols} != oracle {dcols}"
    drows = ddf.to_dict("records")
    got = normalize(srows, cols)
    want = normalize(drows, cols)
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    assert got == want, f"{name}: value mismatch\nspark[:3]={got[:3]}\nduck[:3]={want[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"label", "n_mentions", "n_docs"}
