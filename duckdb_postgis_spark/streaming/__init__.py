"""Structured Streaming variants of the S1-S5 surface (SURVEY.md §2.9).

The reference engine has no streaming (`/root/reference/src` contains none);
this package is our declared extension.  Each stream here reproduces the
semantics of its deterministic batch twin in ``operators/streaming.py`` —
tests replay the events table through ``Trigger.AvailableNow`` and compare
against the twin, which in turn is DuckDB-oracle-checked.
"""

from duckdb_postgis_spark.streaming.streams import (  # noqa: F401
    events_stream,
    run_available_now,
    stream_dedup_live,
    stream_session_live,
    stream_sliding_live,
    stream_tumbling_live,
    stream_user_state_live,
    stream_watermark_late_live,
)
