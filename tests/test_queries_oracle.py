"""Golden-output layer: every registered query with an oracle must match
DuckDB on sf0.001 (the driver runs the same comparison at sf0.01).

This is stricter than the reference's own tests, which only assert
"pipeline ran / files exist / score in [0,1]" (SURVEY.md §5).
"""

from __future__ import annotations

import duckdb
import pytest

from big_data_lab_three_spark.oracle_compare import (
    compare,
    register_oracle_views,
)
from big_data_lab_three_spark.queries import load_all


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, sf_dir)
    return con


QUERIES = sorted(load_all().items())


@pytest.mark.parametrize("name,q", QUERIES, ids=[n for n, _ in QUERIES])
def test_query_matches_oracle(name, q, spark, sf_dir, oracle):
    sdf = q.spark(spark, sf_dir)

    if q.oracle is None:
        assert len(sdf.collect()) >= 0  # rows-only: query must execute
        return

    problems, _ = compare(sdf, oracle.execute(q.oracle))
    assert not problems, "; ".join(problems)
