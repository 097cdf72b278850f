"""Golden-output layer: every registered query with an oracle must match
DuckDB on sf0.001 (the driver runs the same comparison at sf0.01).

This is stricter than the reference's own tests, which only assert
"pipeline ran / files exist / score in [0,1]" (SURVEY.md §5).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pyarrow as pa
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
    if isinstance(v, datetime.datetime):
        # before datetime.date: datetime is a date subclass
        return "ts:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "date:" + v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


# --- typed column signatures -------------------------------------------------
# The driver's correctness gate hashes TYPED values (Arrow-level), so a
# DuckDB HUGEINT column whose ints equal Spark's BIGINTs still mismatches.
# Mapping both engines' schemas into one tag space makes the local gate
# exactly as strict, so local green predicts driver green.

def spark_type_tag(dt):
    from pyspark.sql import types as ST

    if isinstance(dt, ST.LongType):
        return "int64"
    if isinstance(dt, ST.IntegerType):
        return "int32"
    if isinstance(dt, ST.ShortType):
        return "int16"
    if isinstance(dt, ST.DoubleType):
        return "float64"
    if isinstance(dt, ST.FloatType):
        return "float32"
    if isinstance(dt, ST.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, ST.DateType):
        return "date"
    if isinstance(dt, (ST.TimestampType, ST.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, ST.StringType):
        return "string"
    if isinstance(dt, ST.BooleanType):
        return "bool"
    if isinstance(dt, ST.ArrayType):
        return f"list<{spark_type_tag(dt.elementType)}>"
    return dt.simpleString()


def arrow_type_tag(t):
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_tag(t.value_type)}>"
    return str(t)


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

    tbl = oracle.execute(q.oracle).arrow()
    d_cols = [c.lower() for c in tbl.column_names]
    d_rows = [
        tuple(row[c] for c in tbl.column_names) for row in tbl.to_pylist()
    ]

    assert sorted(s_cols) == sorted(d_cols)

    s_types = {
        c.lower(): spark_type_tag(f.dataType)
        for c, f in zip(sdf.columns, sdf.schema.fields)
    }
    d_types = {
        c.lower(): arrow_type_tag(f.type)
        for c, f in zip(tbl.column_names, tbl.schema)
    }
    assert s_types == d_types, (
        "typed schema mismatch (driver hashes typed values): "
        f"{ {c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]} }"
    )

    assert len(s_rows) == len(d_rows)
    assert canon(s_cols, s_rows) == canon(d_cols, d_rows)
