"""Golden-output layer: every registered query with an oracle must match
DuckDB on sf0.001 (the driver runs the same comparison at sf0.01).

This is stricter than the reference's own tests, which only assert
"pipeline ran / files exist / score in [0,1]" (SURVEY.md §5).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from big_data_lab_three_spark.queries import load_all

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


QUERIES = sorted(load_all().items())


@pytest.mark.parametrize("name,q", QUERIES, ids=[n for n, _ in QUERIES])
def test_query_matches_oracle(name, q, spark, sf_dir, oracle):
    sdf = q.spark(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        assert len(s_rows) >= 0  # rows-only check: query must execute
        return

    res = oracle.execute(q.oracle)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert canon(s_cols, s_rows) == canon(d_cols, d_rows)
