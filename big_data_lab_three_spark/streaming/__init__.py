"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.8) — this package
is the north-star extension: the driver's ``events`` table replayed
through ``readStream`` with event-time windows, watermarked late-data
handling, and a custom stateful operator (sessionization via
``applyInPandasWithState``).

Every streaming job here is runnable in-batch for verification: the
parquet file source + ``Trigger.AvailableNow`` drains the table through
the streaming engine into a sink, so the DuckDB oracle can check the
result like any batch query.
"""

from big_data_lab_three_spark.streaming.jobs import (  # noqa: F401
    dedup_within_watermark,
    enrich_with_dimension,
    interval_join_attribution,
    read_events_stream,
    run_stream_to_table,
    sessionize,
    windowed_event_counts,
)
