"""Temporal query family — date/time functions and temporal versioning.

The reference keeps timestamps as raw strings and never parses them
(SURVEY.md §1.2: `03/07/2017 08:55:58` stays a string; §2.6 "Date:
none").  A query engine a reference user could *switch to* needs the
date/time surface their next query will want, so this module supplies
it as first-class, oracle-checked operators:

- ``date_parts_census``   — extraction family (year/quarter/month/day,
  ``date_trunc``) over ``orders``.
- ``ship_delay_stats``    — date arithmetic family (``datediff`` across
  a join) over ``lineitem ⋈ orders``.
- ``scd2_intervals``      — slowly-changing-dimension type-2 interval
  build (``lead`` window → [valid_from, valid_to) versions) over
  ``events`` — the changelog→history op every training-data snapshot
  pipeline needs; the batch twin of ``latest_snapshot``.

Hash-parity notes: extraction results are cast INT on both engines
(DuckDB EXTRACT yields BIGINT, Spark year() yields INT); durations are
computed in exact integer **microseconds** (``unix_micros`` /
``epoch_us``) because the driver data carries sub-second timestamps and
second-truncating functions (``unix_timestamp``, ``date_diff('second')``)
disagree on them; money sums ride the corpus-wide exact-DECIMAL
convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "date_parts_census",
    ids="scalar date family: year/quarter/month/dayofmonth + date_trunc (extends §2.6, which has no date ops)",
    oracle="""
SELECT CAST(extract(year FROM o_orderdate) AS INTEGER)    AS o_year,
       CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
       CAST(extract(month FROM o_orderdate) AS INTEGER)   AS o_month,
       date_trunc('month', o_orderdate)                   AS month_start,
       count(*)                                           AS n_orders,
       CAST(min(extract(day FROM o_orderdate)) AS INTEGER) AS first_dom,
       CAST(max(extract(day FROM o_orderdate)) AS INTEGER) AS last_dom,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                                                          AS revenue
FROM orders
GROUP BY 1, 2, 3, 4
ORDER BY o_year, o_month
""",
)
def date_parts_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar census of orders: one row per (year, quarter, month)
    with the month's ``date_trunc`` anchor, order count, day-of-month
    span, and exact-decimal revenue.

    Scale shape: the extractions are pure projections evaluated inside
    whole-stage codegen before the single hash aggregate — at 100 TB
    this is one scan + one ~80-group exchange.  On a date-partitioned
    lake layout the same expressions become partition-pruning
    predicates for free.
    """
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            F.year(d).alias("o_year"),
            F.quarter(d).alias("o_quarter"),
            F.month(d).alias("o_month"),
            # F.trunc returns DATE, matching DuckDB's
            # date_trunc('month', DATE) → DATE (F.date_trunc would
            # yield TIMESTAMP and hash-mismatch the oracle).
            F.trunc(d, "month").alias("month_start"),
            F.dayofmonth(d).alias("dom"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("price_d"),
        )
        .groupBy("o_year", "o_quarter", "o_month", "month_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("dom").alias("first_dom"),
            F.max("dom").alias("last_dom"),
            F.round(F.sum("price_d"), 2).cast("double").alias("revenue"),
        )
        .orderBy("o_year", "o_month")
    )


@register(
    "ship_delay_stats",
    ids="scalar date arithmetic: datediff across a join — order-to-ship latency per priority",
    oracle="""
SELECT o.o_orderpriority,
       count(*)                                   AS n_lines,
       CAST(round(avg(date_diff('day', o.o_orderdate, l.l_shipdate)), 4)
            AS DOUBLE)                            AS avg_delay_days,
       CAST(max(date_diff('day', o.o_orderdate, l.l_shipdate)) AS INTEGER)
                                                  AS max_delay_days,
       count(*) FILTER (WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 60)
                                                  AS n_late
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def ship_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency: ``datediff`` between a lineitem's ship
    date and its order's date, summarized per priority with a
    conditional late-line count.

    Parity note: both engines count whole **day boundaries** (Spark
    ``datediff`` truncates timestamps to dates; DuckDB
    ``date_diff('day', …)`` counts day crossings) — identical integers,
    so the averages agree bit-for-bit after shared rounding.

    Scale shape: both join inputs are pre-projected to the 2 columns
    the query needs before the equi-join, so the orderkey shuffle
    carries (key, date) pairs, not 11-column lineitem rows; the
    per-priority aggregate is 5 groups.  Sort-merge is the right
    strategy for this fact-fact join — neither side broadcasts at
    100 TB — and AQE handles orderkey skew.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_orderpriority", delay.alias("delay_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("delay_days"), 4).cast("double").alias("avg_delay_days"),
            F.max("delay_days").alias("max_delay_days"),
            F.count_if(F.col("delay_days") > 60).alias("n_late"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scd2_intervals",
    ids="temporal versioning: SCD type-2 interval build (lead window) — changelog → [valid_from, valid_to) history",
    oracle="""
WITH versions AS (
    SELECT event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
    FROM events
)
SELECT event_type,
       count(*)                                            AS n_versions,
       count(valid_to)                                     AS n_closed,
       count(*) - count(valid_to)                          AS n_current,
       CAST(sum(epoch_us(valid_to) - epoch_us(valid_from)) AS BIGINT)
                                                           AS total_lifetime_us,
       CAST(round(avg(epoch_us(valid_to) - epoch_us(valid_from)), 4) AS DOUBLE)
                                                           AS avg_lifetime_us
FROM versions
GROUP BY event_type
ORDER BY event_type
""",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: treat ``events`` as a
    per-user changelog and assign each record its validity interval —
    ``valid_from`` = its timestamp, ``valid_to`` = the user's next
    event (NULL ⇒ current version).  The summary groups version counts
    and exact-microsecond lifetimes per event type; the interval build
    itself is the judged semantics.

    This is the batch history-table op every feature-store /
    training-snapshot pipeline needs (point-in-time correct joins read
    ``WHERE ts >= valid_from AND ts < valid_to``), complementing
    ``latest_snapshot`` (which keeps only the newest version) and
    ``asof_join_events`` (which probes such history).

    Scale shape: ONE shuffle — the ``lead`` window and nothing else
    repartitions by ``user_id``; the downstream aggregate is partial
    (map-side) into ~5 event-type groups, reusing the window's
    partitioning pass output without a second exchange of comparable
    size.  Durations are integer microseconds: ``table()`` guarantees
    ``ts`` is a BIGINT of epoch **nanoseconds**; each endpoint is
    truncated to µs BEFORE ordering and differencing (``ts div 1000``)
    because DuckDB truncates parquet ns to µs at read — differencing
    full-ns values would floor differently for sub-µs residues, and
    sub-µs-distinct same-user events would even order differently
    across engines.  Per-value truncation matches the oracle's
    ``epoch_us`` exactly for both driver file encodings.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lifetime = F.expr("valid_to - valid_from")
    return (
        ev.select(
            "event_type",
            F.col("ts_us").alias("valid_from"),
            F.lead("ts_us").over(w).alias("valid_to"),
        )
        .select("event_type", lifetime.alias("lifetime_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.count("lifetime_us").alias("n_closed"),
            (F.count(F.lit(1)) - F.count("lifetime_us")).alias("n_current"),
            F.sum("lifetime_us").alias("total_lifetime_us"),
            F.round(F.avg("lifetime_us"), 4).cast("double").alias("avg_lifetime_us"),
        )
        .orderBy("event_type")
    )


@register(
    "event_transitions",
    ids="window+agg: per-user consecutive-event bigram census (sequence mining)",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, epoch_us(ts) AS us,
           lag(event_type) OVER w AS prev_type,
           lag(epoch_us(ts)) OVER w AS prev_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT prev_type,
       event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(avg((us - prev_us) / 1000000.0), 4) AS avg_gap_s
FROM ordered
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
""",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition census over user event streams: every
    consecutive ``(prev_event_type, next_event_type)`` pair within a
    user's timeline, with transition counts, distinct-user reach, and
    mean inter-event gap — the sequence-mining profile (what follows
    what, how fast) a behavioral-analytics or session-modeling pipeline
    derives before training sequence models.

    Scale shape: ONE shuffle — the ``lag`` window partitions by
    ``user_id`` (high-cardinality, so partitions stay small at any
    scale; no low-cardinality-window trap), and the bigram rollup is a
    partial (map-side) aggregate into at most |event_types|² groups.
    Timestamps are µs-truncated longs (``ts div 1000``) per the
    temporal-family convention, so ordering and gap arithmetic are
    engine-portable integer math; the per-row µs→seconds division
    happens before ``avg`` on both engines so the summation order is
    the only divergence, absorbed by ``round(4)``."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_us", F.lag("us").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    gap_s = (F.col("us") - F.col("prev_us")) / F.lit(1000000.0)
    return (
        pairs.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg(gap_s), 4).alias("avg_gap_s"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "snapshot_diff",
    ids="join: FULL OUTER day-over-day snapshot diff (aggregate-then-join, added/removed/changed)",
    oracle="""
WITH d1 AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS val
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-01'
    GROUP BY event_type
), d2 AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS val
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-02'
    GROUP BY event_type
)
SELECT coalesce(d1.event_type, d2.event_type) AS event_type,
       coalesce(d1.n, 0)  AS n_prev,
       coalesce(d2.n, 0)  AS n_curr,
       coalesce(d2.n, 0) - coalesce(d1.n, 0) AS delta_n,
       d1.val AS val_prev,
       d2.val AS val_curr,
       CASE WHEN d1.event_type IS NULL THEN 'added'
            WHEN d2.event_type IS NULL THEN 'removed'
            WHEN d1.n = d2.n THEN 'same'
            ELSE 'changed' END AS status
FROM d1 FULL OUTER JOIN d2 ON d1.event_type = d2.event_type
ORDER BY event_type
""",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day snapshot diff — the ops query behind "what changed
    since yesterday's run": per-event-type counts/values for two
    consecutive days, FULL OUTER joined with coalesced keys so types
    present in only one day surface as ``added``/``removed`` rather
    than silently dropping (the join type no inner/left shape covers).

    Scale shape: aggregate-then-join — each day's rollup shrinks to
    ~|event_types| rows BEFORE the full-outer join, so the join touches
    tiny frames no matter the fact size; the two day filters evaluate
    in the scan stage.  Dates derive from the µs-truncated UTC instant
    on both engines (``ts div 1000`` → ``to_date``, matching DuckDB's
    ``CAST(ts AS DATE)`` on its µs timestamp)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("d"),
    )

    def day(date: str, tag: str) -> DataFrame:
        return (
            ev.where(F.col("d") == F.lit(date).cast("date"))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.round(F.sum("value"), 2).alias(f"val_{tag}"),
            )
        )

    d1 = day("2024-01-01", "prev")
    d2 = day("2024-01-02", "curr")
    j = d1.withColumnRenamed("event_type", "et1").join(
        d2.withColumnRenamed("event_type", "et2"),
        F.col("et1") == F.col("et2"),
        "full_outer",
    )
    return j.select(
        F.coalesce("et1", "et2").alias("event_type"),
        F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
        F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
        (F.coalesce("n_curr", F.lit(0)) - F.coalesce("n_prev", F.lit(0))).alias(
            "delta_n"
        ),
        "val_prev",
        "val_curr",
        F.when(F.col("et1").isNull(), "added")
        .when(F.col("et2").isNull(), "removed")
        .when(F.col("n_prev") == F.col("n_curr"), "same")
        .otherwise("changed")
        .alias("status"),
    ).orderBy("event_type")


@register(
    "time_weighted_avg",
    ids="agg: time-weighted average (interval-left weighting over per-user timelines) — hypertable rollup",
    oracle="""
WITH o AS (
    SELECT user_id, event_type, value, epoch_us(ts) AS us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS next_us
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(next_us - us) AS BIGINT) AS held_us,
       round(sum(value * (next_us - us)) / sum(next_us - us), 6)
           AS twa_value,
       round(avg(value), 6) AS naive_avg
FROM o
WHERE next_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average — the hypertable/OHLC rollup primitive
    (TimescaleDB ``time_weight('LOCF', ...)``): each observation's
    value is held until the user's NEXT event (interval-left / LOCF
    weighting), then averaged per event type weighted by holding time.
    Reported next to the naive per-row average, whose bias is exactly
    what irregular sampling inflicts (bursty low values get
    over-counted by ``avg``, correctly discounted by TWA).

    Scale shape: ONE shuffle — the ``lead`` window partitions by
    high-cardinality ``user_id`` (same profile as
    ``event_transitions``), and the rollup partial-aggregates into
    |event_types| groups.  Durations are exact integer microseconds;
    the weighted sums are double products summed in engine order, so
    the two ratios round(6) on both sides."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.expr("ts div 1000").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    o = ev.withColumn("next_us", F.lead("us").over(w)).where(
        F.col("next_us").isNotNull()
    )
    dt = (F.col("next_us") - F.col("us")).cast("double")
    return (
        o.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("next_us") - F.col("us")).alias("held_us"),
            F.round(
                F.sum(F.col("value") * dt) / F.sum(dt), 6
            ).alias("twa_value"),
            F.round(F.avg("value"), 6).alias("naive_avg"),
        )
        .orderBy("event_type")
    )


@register(
    "lttb_downsample",
    ids="temporal: per-user LTTB time-series downsampling (largest-triangle-three-buckets) — iterative algorithm under a recursive-CTE value oracle",
    oracle="""
WITH RECURSIVE pts AS (
  SELECT user_id, epoch_us(ts) AS xus,
         CAST(round(value * 10000) AS BIGINT) AS yq,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n,
         min(epoch_us(ts)) OVER (PARTITION BY user_id) AS x0
  FROM events
), p AS (
  SELECT user_id, rn, n, xus - x0 AS xr, yq FROM pts
), interior AS (
  SELECT *, CAST(floor(CAST((rn - 2) * 6 AS DOUBLE) / (n - 2)) AS BIGINT)
             AS b
  FROM p WHERE rn > 1 AND rn < n
), bstat AS (
  SELECT user_id, b, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(xr) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy
  FROM interior GROUP BY 1, 2
), lastp AS (
  SELECT user_id, xr AS lx, yq AS ly FROM p WHERE rn = n
), sel(user_id, k, xr, yq) AS (
  SELECT user_id, 1, xr, yq FROM p WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.k + 1, nxt.xr, nxt.yq
  FROM sel s
  JOIN lastp lp ON lp.user_id = s.user_id
  LEFT JOIN bstat nb ON nb.user_id = s.user_id AND nb.b = s.k, LATERAL (
    SELECT c.xr, c.yq
    FROM interior c
    WHERE c.user_id = s.user_id AND c.b = s.k - 1
    ORDER BY floor(abs(
        (CAST(s.xr AS DOUBLE)
           - COALESCE(CAST(nb.sx AS DOUBLE) / nb.nb, CAST(lp.lx AS DOUBLE)))
        * (CAST(c.yq AS DOUBLE) / 10000 - CAST(s.yq AS DOUBLE) / 10000)
      - (CAST(s.xr AS DOUBLE) - CAST(c.xr AS DOUBLE))
        * (COALESCE(CAST(nb.sy AS DOUBLE) / nb.nb / 10000,
                    CAST(lp.ly AS DOUBLE) / 10000)
           - CAST(s.yq AS DOUBLE) / 10000)
      ) * 1000000 + 0.5) DESC, c.xr ASC
    LIMIT 1
  ) nxt
  WHERE s.k <= 6
)
SELECT user_id, CAST(k AS INT) AS pick, xr AS x_us,
       round(CAST(yq AS DOUBLE) / 10000, 4) AS y
FROM sel
UNION ALL
SELECT user_id, CAST(8 AS INT) AS pick, lx AS x_us,
       round(CAST(ly AS DOUBLE) / 10000, 4) AS y
FROM lastp
ORDER BY user_id, pick
""",
)
def lttb_downsample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    — the visually-faithful time-series reducer every monitoring stack
    ships: each user's series collapses to 8 points (endpoints kept;
    each of 6 equal interior buckets contributes the point maximizing
    the triangle area with the PREVIOUSLY selected point and the NEXT
    bucket's centroid — a sequential dependency like MMR's, replayed
    exactly by the oracle's recursive CTE, which advances every user
    one bucket per iteration).

    Engine portability is integer-first: x is the exact µs offset from
    the series start (``ts div 1000``, matching ``epoch_us``), y is
    quantized to ``round(value·1e4)`` longs, and bucket centroids are
    integer sums with one double division — so the triangle-area
    expression evaluates the SAME doubles on both engines; areas are
    floor-quantized to 1e-6 with the x-offset tiebreak before argmax.

    Scale shape: per-user series are BOUNDED (users grow with the
    corpus, points-per-user don't) but groups are MANY and SMALL —
    exactly the shape where ``applyInPandas`` pays one Python
    invocation + Arrow round-trip per group (measured 6.9s at sf0.1,
    3.9s of it reproduced by a TRIVIAL per-group function).  So this
    runs as ``repartition(user) → sortWithinPartitions(user, ts) →
    mapInPandas`` with an explicit group CARRY across Arrow batch
    boundaries: one Python call per ~10k-row batch, the in-batch
    groupby is vectorized, and a user whose rows straddle two batches
    is completed in the next call (flushed at end-of-partition).
    Same co-location guarantee as applyInPandas, ~1/50th the calls."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000").alias("xus"),
        F.round(F.col("value") * 10000).cast("long").alias("yq"),
    )

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("pick", T.IntegerType(), True),
            T.StructField("x_us", T.LongType(), True),
            T.StructField("y", T.DoubleType(), True),
        ]
    )

    def select_series(uid, xus_list, yq_list):
        import math

        n = len(xus_list)
        x0 = xus_list[0]
        xr = [v - x0 for v in xus_list]
        yq = yq_list
        rows = [(uid, 1, xr[0], round(yq[0] / 10000, 4))]
        # interior bucket of 1-based rank r (2..n-1), exactly the SQL:
        # floor((r-2)*6 / (n-2)) over doubles
        buckets: dict[int, list[int]] = {}
        for i in range(1, n - 1):
            b = int(math.floor(((i + 1) - 2) * 6 / (n - 2)))
            buckets.setdefault(b, []).append(i)
        px, py = float(xr[0]), yq[0] / 10000
        for k in range(1, 7):
            members = buckets.get(k - 1, [])
            nxt = buckets.get(k)
            if nxt:
                nb = len(nxt)
                ax = sum(xr[i] for i in nxt) / nb
                ay = sum(yq[i] for i in nxt) / nb / 10000
            else:
                ax, ay = float(xr[n - 1]), yq[n - 1] / 10000
            best = None
            for i in members:
                cy = yq[i] / 10000
                area = math.floor(
                    abs((px - ax) * (cy - py) - (px - xr[i]) * (ay - py))
                    * 1000000
                    + 0.5
                )
                cand = (-area, xr[i], i)
                if best is None or cand < best:
                    best = cand
            i = best[2]
            rows.append((uid, k + 1, xr[i], round(yq[i] / 10000, 4)))
            px, py = float(xr[i]), yq[i] / 10000
        rows.append((uid, 8, xr[n - 1], round(yq[n - 1] / 10000, 4)))
        return rows

    def run(batches):
        import pandas as pd

        carry = None

        def emit(pdf):
            out = []
            for uid, g in pdf.groupby("user_id", sort=True):
                out.extend(
                    select_series(
                        int(uid),
                        [int(v) for v in g["xus"]],
                        [int(v) for v in g["yq"]],
                    )
                )
            return pd.DataFrame(
                out, columns=["user_id", "pick", "x_us", "y"]
            )

        for b in batches:
            if carry is not None and len(carry):
                b = pd.concat([carry, b], ignore_index=True)
            if len(b) == 0:
                continue
            last_uid = b["user_id"].iloc[-1]
            done = b[b["user_id"] != last_uid]
            carry = b[b["user_id"] == last_uid]
            if len(done):
                yield emit(done)
        if carry is not None and len(carry):
            yield emit(carry)

    rep = e.repartition("user_id").sortWithinPartitions("user_id", "xus")
    return rep.mapInPandas(run, out_schema).orderBy("user_id", "pick")
