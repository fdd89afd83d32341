"""Physical-layout strategies for the 100 TB scale path (SURVEY.md §7 M5)."""

from duckdb_postgis_spark.plans.layout import (  # noqa: F401
    ensure_bucketed_table,
    ensure_events_partitioned,
)
