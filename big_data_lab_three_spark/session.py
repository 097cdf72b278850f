"""SparkSession factory.

The reference has no session concept — each CLI entry point re-reads and
re-fits everything eagerly (reference ``src/train.py:26-114``,
``src/app.py:54`` constructs a ``MultiModel`` per HTTP request).  Here the
session is an explicit, process-wide singleton: build once, share across
queries, never per-request.

Scale notes
-----------
The configs below are chosen for correctness-on-local AND sanity-at-scale:

- AQE on (coalesce post-shuffle partitions, skew-join splitting, runtime
  broadcast demotion) — on a 1000-executor cluster this is what adapts the
  static plan to real data sizes.
- ``spark.sql.shuffle.partitions`` defaults to 32 locally; on a real cluster
  AQE's coalescing makes the initial number mostly a ceiling, so a deployment
  would raise it (e.g. 2000) and let AQE shrink.
- Arrow enabled so any Pandas-UDF path (SMOTE, embedding ops, multimodal
  decode) moves columnar batches, not pickled rows.
- Session timezone pinned to UTC so timestamp semantics are stable across
  driver machines (and match DuckDB's naive timestamps in the oracle
  comparisons).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # PySpark 4 wraps EVERY Column/DataFrame op with a call-site capture
    # (inspect.stack walk + an extra JVM round-trip per op) to enrich
    # error messages with user line numbers.  On expression-heavy plans
    # this is the DOMINANT DataFrame-construction cost — measured 3.5s →
    # 0.7s building dedup_simhash's 60-bit signature plan, and it taxes
    # every one of the registry's 277 queries on every invocation (driver
    # Python, so it costs the same on a real cluster).  Pure debugging
    # metadata: plans, results, and error *classes* are unchanged — only
    # the "was at <file>:<line>" enrichment is dropped.  r15 optimization.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # Keep broadcast threshold at default 10MB: region/nation/supplier-sized
    # dims broadcast automatically; at 100TB the fact side never does.
    "spark.ui.enabled": "false",
    # local[N] runs every executor thread inside the driver JVM — the 1g
    # default heap is the first thing to die under a 32-thread suite.
    # Applies only when this factory creates the JVM (a cluster deploy or
    # the round driver's own session sets its own sizing).
    "spark.driver.memory": "16g",
    "spark.driver.maxResultSize": "4g",
    "spark.driver.extraJavaOptions": "-Duser.timezone=UTC",
    "spark.executor.extraJavaOptions": "-Duser.timezone=UTC",
}


def get_spark(
    app_name: str = "big_data_lab_three_spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the process-wide SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``)
    for local runs; under ``spark-submit`` on a cluster the submitted master
    wins because ``SparkSession.builder`` ignores ``master`` once a context
    exists.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**DEFAULT_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
