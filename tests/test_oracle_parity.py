"""Mirror of the driver's correctness gate: run every `queries()` entry in
Spark AND its `oracle_sql()` in DuckDB over the same parquet tables; compare
row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

from tests.conftest import SF_DIR

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{ORACLE_SF_DIR}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _all_query_names():
    # main registry (the 50 driver-gated entries) PLUS the extended
    # mirror-only registry (superseded twins) — the mirror checks everything
    from jsonschema_valid_spark.driver_queries import all_oracle_sql, all_queries

    q = all_queries()
    o = all_oracle_sql()
    return sorted(q), q, o


NAMES, _Q, _O = _all_query_names()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    fn = _Q[name]
    sdf = fn(spark, ORACLE_SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if name not in _O:
        pytest.skip(f"{name}: no oracle (rows-only check); rows={len(srows)}")

    con = _duck()
    cur = con.execute(_O[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={scols} duck={dcols}")
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}")
    sn, dn = _norm_rows(scols, srows), _norm_rows(dcols, drows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, f"{name}: first differing row #{i}: spark={a} duck={b}"
