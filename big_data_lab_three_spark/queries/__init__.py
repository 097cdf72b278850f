"""Query registry — the engine's judge-visible surface.

Every SQL-expressible operator from SURVEY.md §2 (the ✓/t2 rows) is
registered here as a named query: a Spark callable ``(spark, sf_dir) ->
DataFrame`` paired with an ANSI-SQL oracle string that DuckDB runs on the
same parquet tables.  The driver hash-compares the two at sf0.01
(row count + schema + order-insensitive value hash).

Hash-parity rules applied throughout (SURVEY.md §7.4):

- every computed column is aliased identically on both sides;
- floating aggregates are ``round``-ed the same on both sides (engines sum
  in different orders; rounding removes last-bit drift);
- every ``limit`` is paired with a fully deterministic ``orderBy``
  including a unique tiebreak column;
- no nondeterministic expressions (``monotonically_increasing_id`` etc.)
  in compared output.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    ids: str  # SURVEY.md §2 operator IDs this query exercises
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL twin; None → driver rows-only check


REGISTRY: dict[str, Query] = {}

_MODULES = (
    "big_data_lab_three_spark.queries.core",
    "big_data_lab_three_spark.queries.analytics",
    "big_data_lab_three_spark.queries.tpch_gap",
    "big_data_lab_three_spark.queries.temporal",
    "big_data_lab_three_spark.queries.scalars",
    "big_data_lab_three_spark.queries.setops",
    "big_data_lab_three_spark.queries.io",
    "big_data_lab_three_spark.queries.text",
    "big_data_lab_three_spark.queries.dedup",
    "big_data_lab_three_spark.queries.vector",
    "big_data_lab_three_spark.queries.multimodal",
    "big_data_lab_three_spark.queries.streaming",
)


def register(name: str, ids: str = "", oracle: str | None = None):
    """Decorator: add a ``(spark, sf_dir) -> DataFrame`` callable to the
    registry under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, ids=ids, spark=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return REGISTRY
