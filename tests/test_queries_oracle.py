"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry against its DuckDB ``oracle_sql()``
twin at sf0.001 and require identical row-count + column names + values
(order-insensitive, exact after both sides' rounding)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_SMALL, t)}.parquet'"
        )
    return con


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return round(v, 9)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLED = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries().keys()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, ducks, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = ducks.sql(entry_mod.oracle_sql()[name])
    dcols = list(rel.columns)
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _canon(srows, scols) == _canon(drows, dcols), f"{name}: values differ"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_SMALL)
    assert df.columns
    assert df.count() >= 0
