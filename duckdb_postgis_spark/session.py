"""SparkSession builder with scale-appropriate defaults.

The reference opens an in-memory DuckDB per job (``core_processor.rs:67``);
our equivalent of "the engine" is a configured SparkSession.  Defaults are
chosen for correctness-stability of the DuckDB-oracle comparison (UTC session
timezone, Arrow enabled) and for performance at both test scale and cluster
scale (AQE on, partition coalescing, broadcast threshold).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duckdb-postgis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    - AQE: runtime re-plan, partition coalescing, skew-join handling — the
      100 TB story relies on these instead of hand-tuned partition counts.
    - Arrow: vectorized exchange for the pandas-UDF operators (geo transforms,
      grouped text analysis, block-matmul similarity).
    - UTC session timezone: testdata timestamps are naive; pinning UTC keeps
      Spark and the DuckDB oracle byte-identical on date_trunc/extract.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the legacy default) carries NO parquet min/max statistics,
        # which silently disables timestamp row-group/file skipping on
        # every table this engine writes; MICROS is the modern
        # cross-engine encoding (matches the driver testdata)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
