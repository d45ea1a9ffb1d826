"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against its oracle_sql() via DuckDB —
row count + column names + order-insensitive value multiset."""

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (np.floating,)):
        return f"{float(v):.6g}"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


ORACLE_QUERIES = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    qdf = E.queries()[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in qdf.columns]
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = ddb.execute(E.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    sr = _rowset(spark_cols, spark_rows)
    dr = _rowset(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_all_queries_have_entries():
    qs = E.queries()
    for name in E.oracle_sql():
        assert name in qs, f"oracle without query: {name}"
    assert len(qs) >= 20


def test_registry_stays_inside_driver_window():
    """The driver records exactly the FIRST 50 queries() entries; a 51st
    would silently push the oldest oracled gate out of the recorded
    coverage (ADVICE r4). Enforce the window and that every oracled key
    sits inside it."""
    qs = E.queries()
    assert len(qs) <= 50, f"queries() has {len(qs)} entries; driver records only 50"
    window = set(list(qs)[:50])
    outside = [k for k in E.oracle_sql() if k not in window]
    assert not outside, f"oracled gates outside the recorded window: {outside}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_dtypes_match_oracle(spark, ddb, name):
    """Dtype-KIND parity (the r1 a6 failure was DuckDB HUGEINT surfacing as
    a non-integer pandas dtype while values matched): the pandas frames the
    driver hashes must agree in numpy kind per column. Width differences
    (int32 vs int64) are benign — text_features hash-matched in r1 with
    F.size's int32 against DuckDB len()'s int64 — but int-vs-float/object
    is exactly the a6 failure mode."""
    spdf = E.queries()[name](spark, SF_DIR).toPandas()
    ddf = ddb.execute(E.oracle_sql()[name]).fetchdf()
    s_dtypes = {c.lower(): spdf[c].dtype for c in spdf.columns}
    d_dtypes = {c.lower(): ddf[c].dtype for c in ddf.columns}
    assert set(s_dtypes) == set(d_dtypes)
    for c in s_dtypes:
        s, d = np.dtype(s_dtypes[c]), np.dtype(d_dtypes[c])
        assert s.kind == d.kind, (name, c, s, d)
