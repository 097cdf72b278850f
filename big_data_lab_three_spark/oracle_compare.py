"""Shared Spark↔DuckDB result comparison, at driver strength.

The round driver hashes TYPED values (Arrow-level), so two engines
agreeing on every value can still mismatch on type — DuckDB HUGEINT
(decimal128) vs Spark BIGINT, DATE vs TIMESTAMP, -0.0 vs 0.0.  Both
local gates (``tests/test_queries_oracle.py`` at sf0.001 and
``tools/verify_local.py`` at sf0.01) compare through THIS module so
local green predicts driver green; weakening either gate recreates
round 1's pass-locally-fail-on-driver class of bug.
"""

from __future__ import annotations

import datetime
import decimal
import math

# The one source of truth for the oracle's table universe — both local
# gates register views through register_oracle_views so they can never
# drift apart.
ORACLE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_oracle_views(con, sf_dir: str) -> None:
    """Register every test table as a DuckDB view over its parquet."""
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def canon_cell(v) -> str:
    """Typed canonical form of one result cell (engine-neutral)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Exact shortest-repr comparison — the driver hashes exact
        # Arrow values, so tolerating sub-1e-9 drift here would let a
        # locally-green query fail the driver.  Registered queries
        # round() float outputs in-query on BOTH engines, which is
        # where last-bit summation drift is absorbed.
        return repr(v)
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


def canon_rows(cols, rows):
    """Rows in column-name order, cell-canonicalized, sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def spark_type_tag(dt) -> str:
    """Spark SQL type → shared tag space (see arrow_type_tag)."""
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
    if isinstance(dt, ST.TimestampType):
        # tz-aware (instant) vs NTZ (wall-clock) are DIFFERENT Arrow
        # types to the driver's hash — keep them distinct here too.
        return "timestamp[tz]"
    if isinstance(dt, ST.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, ST.StringType):
        return "string"
    if isinstance(dt, ST.BooleanType):
        return "bool"
    if isinstance(dt, ST.ArrayType):
        return f"list<{spark_type_tag(dt.elementType)}>"
    return dt.simpleString()


def arrow_type_tag(t) -> str:
    """Arrow type (DuckDB result) → shared tag space."""
    import pyarrow as pa

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
        return "timestamp[tz]" if t.tz is not None else "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_tag(t.value_type)}>"
    return str(t)


def compare(sdf, duck_result) -> tuple[list[str], int]:
    """Full driver-strength comparison of a Spark DataFrame against a
    DuckDB relation/cursor result (``con.execute(sql)``).  Returns
    ``(problems, n_spark_rows)`` — empty problems means match.
    Collects both sides; callers own cache cleanup."""
    tbl = duck_result.arrow()
    s_cols = [c.lower() for c in sdf.columns]
    d_cols = [c.lower() for c in tbl.column_names]
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"cols spark={s_cols} duckdb={d_cols}")
        return problems, 0

    s_types = {
        c.lower(): spark_type_tag(f.dataType)
        for c, f in zip(sdf.columns, sdf.schema.fields)
    }
    d_types = {
        c.lower(): arrow_type_tag(f.type)
        for c, f in zip(tbl.column_names, tbl.schema)
    }
    if s_types != d_types:
        mism = {
            c: (s_types[c], d_types[c])
            for c in s_types
            if s_types[c] != d_types[c]
        }
        problems.append(f"typed schema mismatch (driver hashes types): {mism}")

    s_rows = [tuple(r) for r in sdf.collect()]
    d_rows = [
        tuple(row[c] for c in tbl.column_names) for row in tbl.to_pylist()
    ]
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        return problems, len(s_rows)
    cs = canon_rows(s_cols, s_rows)
    cd = canon_rows(d_cols, d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        problems.append(f"values differ, first diffs: {diff}")
    return problems, len(s_rows)
