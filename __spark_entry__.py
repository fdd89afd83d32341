"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``duckdb_postgis_spark/operators/*`` and register
themselves with the registry; this module just exposes the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duckdb_postgis_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary (scan → filter → 2-key hash agg with 9 aggregates → sort)."""
    from duckdb_postgis_spark.operators.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.8-2.11."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins (same column names, exact-arithmetic convention —
    see duckdb_postgis_spark/functions/num.py). Keys absent here (vs
    queries()) are non-SQL-expressible ops → driver rows-only check."""
    return registry.all_oracles()
