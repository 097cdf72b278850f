"""Streaming query corpus: events replayed through Structured Streaming.

Each entry drains the ``events`` stream with ``Trigger.AvailableNow``
into a memory sink and returns the sink table, so the driver compares a
real streaming execution (stateful aggregation, watermarks, timeouts)
against the batch oracle.  Names are uniquified per (process, sf_dir)
because memory-sink tables are session-global.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.functions.numeric import quantized_sum
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.streaming import (
    read_events_stream,
    run_stream_to_table,
    sessionize,
    windowed_event_counts,
)

_seq = itertools.count()


@register(
    "streaming_window_counts",
    ids="streaming: tumbling event-time window + watermark (§2.8 extension)",
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def streaming_window_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type through the streaming
    engine (complete mode: every window emitted after the drain, so the
    batch GROUP BY is the exact oracle)."""
    stream = read_events_stream(spark, sf_dir)
    result = windowed_event_counts(stream, "1 hour", "2 hours")
    return run_stream_to_table(
        spark, result, f"stream_win_{next(_seq)}", output_mode="complete"
    )


@register(
    "streaming_sessionize",
    ids="streaming: custom stateful sessionization (applyInPandasWithState)",
    oracle="""
WITH m AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
marks AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts)
                 > CAST(720 AS BIGINT) * 60000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id, us, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
  FROM marks
),
agg AS (
  SELECT user_id, CAST(sid AS INTEGER) AS session_id,
         CAST(count(*) AS INTEGER) AS n_events,
         round(sum(value), 4) AS total_value,
         min(us) AS start_us, max(us) AS end_us,
         max(sid) OVER (PARTITION BY user_id) AS last_sid
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, session_id, n_events, total_value, start_us, end_us
FROM agg, m
WHERE session_id < last_sid  -- closed by a later event
   -- or closed by the final watermark: Spark tracks event-time
   -- watermarks and state timeouts in MILLISECONDS, so the timeout
   -- comparison truncates both sides to ms (strict <, GroupState fires
   -- on timeout < watermark)
   OR end_us // 1000 + 720 * 60000 < max_us // 1000
""",
)
def streaming_sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 12 h-gap sessions via the custom stateful operator.  The
    oracle is batch gaps-and-islands sessionization RESTRICTED to
    sessions a correct streaming engine has finalized at end-of-stream:
    closed by a later event, or timed out under the final watermark.
    total_value is rounded batch-side after the drain (Spark/DuckDB
    round HALF_UP; Python's round is banker's)."""
    stream = read_events_stream(spark, sf_dir)
    result = sessionize(stream, gap_minutes=720)
    drained = run_stream_to_table(
        spark, result, f"stream_sess_{next(_seq)}", output_mode="append"
    )
    return drained.select(
        "user_id",
        "session_id",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        "start_us",
        "end_us",
    )


@register(
    "streaming_dedup",
    ids="streaming: dropDuplicatesWithinWatermark — bounded-state late-duplicate suppression",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
""",
)
def streaming_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user_id, event_type) through the streaming
    engine with watermark-bounded dedup state (see
    ``streaming.dedup_within_watermark`` for why the key set — not the
    winning row — is the comparable output)."""
    from big_data_lab_three_spark.streaming import dedup_within_watermark

    stream = read_events_stream(spark, sf_dir)
    result = dedup_within_watermark(stream, "2 hours")
    return run_stream_to_table(
        spark, result, f"stream_dedup_{next(_seq)}", output_mode="append"
    )


@register(
    "streaming_enrich_join",
    ids="streaming: stream-static broadcast join + stateful agg (§2.8 extension)",
    oracle="""
SELECT c_mktsegment, event_type,
       count(*) AS n,
       round(sum(value), 4) AS total_value
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY c_mktsegment, event_type
ORDER BY c_mktsegment, event_type
""",
)
def streaming_enrich_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched with the static customer dimension inside the
    streaming engine (stream-static broadcast join — the static side is
    re-planned per micro-batch, so dimension refreshes flow in without
    a restart), then aggregated per (segment, event type) in complete
    mode.  The batch join+GROUP BY is the exact oracle."""
    from big_data_lab_three_spark.sources import table
    from big_data_lab_three_spark.streaming import enrich_with_dimension

    stream = read_events_stream(spark, sf_dir)
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    result = (
        enrich_with_dimension(stream, dim)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    return run_stream_to_table(
        spark, result, f"stream_enrich_{next(_seq)}", output_mode="complete"
    ).orderBy("c_mktsegment", "event_type")


@register(
    "streaming_interval_join",
    ids="streaming: stream-stream event-time interval join (click→purchase attribution)",
    oracle="""
SELECT p.user_id,
       epoch_us(c.ts) AS trigger_us,
       epoch_us(p.ts) AS outcome_us,
       p.value AS outcome_value
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY p.user_id, trigger_us, outcome_us
""",
)
def streaming_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to every same-user click in the preceding
    hour, through the streaming engine's stream-stream join (both sides
    buffered in watermark-bounded state — see
    ``streaming.interval_join_attribution``).  Inner join + full drain
    ⇒ the batch self-join is the exact oracle."""
    from big_data_lab_three_spark.streaming import interval_join_attribution

    stream = read_events_stream(spark, sf_dir)
    result = interval_join_attribution(stream)
    return run_stream_to_table(
        spark, result, f"stream_ijoin_{next(_seq)}", output_mode="append"
    ).orderBy("user_id", "trigger_us", "outcome_us")


@register(
    "streaming_sliding_counts",
    ids="streaming: sliding event-time window (overlap factor 2) + watermark",
    oracle="""
WITH starts AS (
  SELECT epoch_us(date_trunc('hour', ts) - g.i * INTERVAL 1 HOUR)
           AS window_start_us,
         event_type, value
  FROM events CROSS JOIN generate_series(0, 1) AS g(i)
)
SELECT window_start_us,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS total_value
FROM starts
GROUP BY 1, 2
""",
)
def streaming_sliding_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour — the overlapping-window
    variant of ``streaming_window_counts``: every event lands in
    exactly window/slide = 2 windows, so streaming state carries 2×
    the tumbling rows and the watermark's eviction matters
    proportionally more.  The oracle replays the assignment rule in
    SQL (each event joined to both its hour-truncated start and the
    hour before), making the overlap factor itself value-checked,
    not just the per-window sums."""
    stream = read_events_stream(spark, sf_dir)
    result = windowed_event_counts(
        stream, "2 hours", "4 hours", slide="1 hour"
    )
    return run_stream_to_table(
        spark, result, f"stream_slide_{next(_seq)}", output_mode="complete"
    )


@register(
    "streaming_topk_trend",
    ids="streaming: per-window top-3 trending event types (windowed stateful counts + rank over the drained sink)",
    oracle="""
WITH c AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT window_start_us, event_type, n, CAST(rn AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY window_start_us ORDER BY n DESC, event_type) AS rn
  FROM c
)
WHERE rn <= 3
ORDER BY window_start_us, rank
""",
)
def streaming_topk_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending dashboard feed: 1-hour tumbling windows of per-type
    counts maintained by the STREAMING engine (watermarked state,
    complete mode), then top-3 per window ranked on the drained sink —
    exactly how a production trending readout is built, because rank
    is not an incremental aggregate: the stream maintains the counts,
    the serving query ranks the (tiny) sink table.  Counts are exact
    integers with the event-type tiebreak, so the ranking is fully
    deterministic against the batch oracle."""
    from pyspark.sql import Window

    stream = read_events_stream(spark, sf_dir)
    result = windowed_event_counts(stream, "1 hour", "2 hours")
    drained = run_stream_to_table(
        spark, result, f"stream_trend_{next(_seq)}", output_mode="complete"
    )
    w = Window.partitionBy("window_start_us").orderBy(
        F.desc("n"), "event_type"
    )
    return (
        drained.select("window_start_us", "event_type", "n")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .orderBy("window_start_us", "rank")
    )


@register(
    "streaming_drift_monitor",
    ids="streaming: per-window chi-square drift of the value-bucket histogram vs the pooled distribution",
    oracle="""
WITH c AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
         least(9, CAST(floor(value / 25.0) AS BIGINT)) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), w AS (
  SELECT window_start_us, CAST(sum(n) AS BIGINT) AS wn FROM c GROUP BY 1
), pooled AS (
  SELECT bucket, CAST(sum(n) AS BIGINT) AS pn FROM c GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total FROM c
), grid AS (
  SELECT w.window_start_us, w.wn, p.bucket, p.pn, t.total,
         coalesce(c.n, 0) AS obs
  FROM w CROSS JOIN pooled p CROSS JOIN tot t
  LEFT JOIN c ON c.window_start_us = w.window_start_us
             AND c.bucket = p.bucket
), q AS (
  SELECT window_start_us, wn,
         (CAST(obs AS DOUBLE) - CAST(wn AS DOUBLE) * pn / total)
         * (CAST(obs AS DOUBLE) - CAST(wn AS DOUBLE) * pn / total)
         / (CAST(wn AS DOUBLE) * pn / total) AS contrib
  FROM grid
)
SELECT window_start_us, CAST(max(wn) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_buckets,
       round(CAST(sum(CAST(floor(contrib * 1000000000 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000000, 6) AS chi2
FROM q GROUP BY window_start_us
ORDER BY window_start_us
""",
)
def streaming_drift_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: the STREAM maintains the only state a
    drift detector needs at 100 TB/day — exact per-(hour-window,
    value-bucket) counters under a watermark — and the SERVING query
    computes each window's chi-square homogeneity distance against the
    pooled bucket distribution over the drained (tiny) sink.  Same
    split as `streaming_topk_trend`: chi-square is not an incremental
    aggregate, so it never lives in stream state.

    The full window×bucket grid is expanded on the sink (zero-observed
    cells included — a vanished bucket IS drift), so the statistic is
    well-defined and identical on both engines: integer counters,
    the shared `wn·pn/total` expected-count expression, per-cell 1e-9
    quantization before the integer sum (the `chi_square_test`
    convention).

    Scale shape: streaming state is ≤ windows×10 counters
    (watermark-evicted); the serving pass runs on the drained census;
    ~25-row output."""
    stream = read_events_stream(spark, sf_dir)
    bucket = F.least(
        F.lit(9), F.floor(F.col("value") / F.lit(25.0))
    ).cast("long")
    agg = (
        stream.withWatermark("ts_utc", "2 hours")
        .groupBy(F.window("ts_utc", "1 hour"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            "bucket",
            "n",
        )
    )
    c = run_stream_to_table(
        spark, agg, f"stream_drift_{next(_seq)}", output_mode="complete"
    )
    c.persist()
    w = c.groupBy("window_start_us").agg(F.sum("n").alias("wn"))
    pooled = c.groupBy("bucket").agg(F.sum("n").alias("pn"))
    tot = c.agg(F.sum("n").alias("total"))
    grid = (
        w.crossJoin(F.broadcast(pooled))
        .crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(
                # fresh projection breaks the self-join lineage conflict
                c.select(
                    F.col("window_start_us").alias("ws"),
                    F.col("bucket").alias("bk"),
                    F.col("n").alias("cn"),
                )
            ),
            (F.col("ws") == F.col("window_start_us"))
            & (F.col("bk") == F.col("bucket")),
            "left",
        )
        .select(
            "window_start_us",
            "wn",
            "pn",
            "total",
            F.coalesce(F.col("cn"), F.lit(0)).alias("obs"),
        )
    )
    e = F.col("wn").cast("double") * F.col("pn") / F.col("total")
    contrib = (
        (F.col("obs").cast("double") - e)
        * (F.col("obs").cast("double") - e)
        / e
    )
    q = grid.select("window_start_us", "wn", contrib.alias("contrib"))
    return (
        q.groupBy("window_start_us")
        .agg(
            F.max("wn").alias("n_events"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(
                quantized_sum(F.col("contrib"), 1000000000).cast("double")
                / F.lit(1000000000),
                6,
            ).alias("chi2"),
        )
        .orderBy("window_start_us")
    )


@register(
    "streaming_cusum",
    ids="streaming: CUSUM changepoint over the drained per-window count series (exact integer argmax)",
    oracle="""
WITH c AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), p AS (
  SELECT window_start_us,
         CAST(sum(n) OVER (ORDER BY window_start_us) AS BIGINT) AS prefix,
         CAST(row_number() OVER (ORDER BY window_start_us) AS BIGINT) AS t
  FROM c
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS nw, CAST(sum(n) AS BIGINT) AS s
  FROM c
), sc AS (
  SELECT p.window_start_us, p.t, p.prefix, tot.nw, tot.s,
         tot.nw * p.prefix - p.t * tot.s AS signed
  FROM p, tot
  WHERE p.t < tot.nw
  ORDER BY abs(tot.nw * p.prefix - p.t * tot.s) DESC, p.window_start_us ASC
  LIMIT 1
)
SELECT nw AS n_windows, window_start_us AS cp_window_start_us,
       CAST(signed AS BIGINT) AS cusum_signed_scaled,
       round(CAST(prefix AS DOUBLE) / t, 4) AS mean_before,
       round(CAST(s - prefix AS DOUBLE) / (nw - t), 4) AS mean_after
FROM sc
""",
)
def streaming_cusum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming changepoint detection: the STREAM maintains the exact
    per-hour-window event counters (watermarked state, complete mode)
    — and the SERVING query runs the binary-segmentation CUSUM scan
    over the drained window series, finding the hour where the event
    rate most decisively shifted.  Changepoint detection, like ranking
    and chi-square, is not an incremental aggregate — it lives on the
    sink, never in stream state (the family split all three r7
    streaming readouts share).

    The argmax is the exact integer `|nw·prefix_t − t·S|` on window
    counts (the `cusum_changepoint` algebra; counts make even the
    signed peak reportable as a raw BIGINT — no float in the
    statistic at all), ties to the earliest window.

    Scale shape: streaming state is one counter per window
    (watermark-evicted); the serving scan runs over the ~500-row
    drained census; 1-row output."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts_utc", "2 hours")
        .groupBy(F.window("ts_utc", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"), "n"
        )
    )
    c = run_stream_to_table(
        spark, agg, f"stream_cusum_{next(_seq)}", output_mode="complete"
    )
    c.persist()
    from pyspark.sql import Window as W

    w = W.orderBy("window_start_us")
    p = c.select(
        "window_start_us",
        F.sum("n")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("prefix"),
        F.row_number().over(w).cast("long").alias("t"),
    )
    tot = c.agg(
        F.count(F.lit(1)).alias("nw"), F.sum("n").alias("s")
    )
    signed = F.col("nw") * F.col("prefix") - F.col("t") * F.col("s")
    sc = (
        p.crossJoin(F.broadcast(tot))
        .where(F.col("t") < F.col("nw"))
        .select(
            "window_start_us", "t", "prefix", "nw", "s",
            signed.alias("signed"),
        )
        .orderBy(
            F.abs(F.col("signed")).desc(), F.col("window_start_us").asc()
        )
        .limit(1)
    )
    return sc.select(
        F.col("nw").alias("n_windows"),
        F.col("window_start_us").alias("cp_window_start_us"),
        F.col("signed").alias("cusum_signed_scaled"),
        F.round(
            F.col("prefix").cast("double") / F.col("t"), 4
        ).alias("mean_before"),
        F.round(
            (F.col("s") - F.col("prefix")).cast("double")
            / (F.col("nw") - F.col("t")),
            4,
        ).alias("mean_after"),
    )
