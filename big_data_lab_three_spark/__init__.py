"""big_data_lab_three_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``Lammirea/big_data_lab_three`` (a
pandas/sklearn MLOps lab for network-intrusion detection), extended with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.1):

- DataFrame / SQL API everywhere; logical plans are declared, Catalyst picks
  the physical strategy.  No RDDs on the data path.
- Zero row-at-a-time Python UDFs for relational parity; Pandas UDFs (Arrow)
  only where built-ins genuinely cannot express the semantics.
- No ``collect()`` on the data path — driver-side materialization only for
  tiny results (modes, metrics, top-k heads).
- Every operator is written to survive a 1000-executor / 100 TB deployment:
  aggregations are single-pass wide ``agg(*exprs)``, small dimensions are
  broadcast, skew and shuffle sizing are left to AQE which the session
  factory enables.
"""

from big_data_lab_three_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
