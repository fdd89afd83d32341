"""Testdata catalog: the ten driver tables as DataFrames / temp views.

Mirrors the reference's single materialized table ``data``
(``core_processor.rs:391-428``) generalized to a multi-table catalog.
Parquet is self-describing, so like the reference's ``read_parquet`` path
(``core_processor.rs:419-424``) no schema is declared — Spark's vectorized
parquet reader supplies column pruning + predicate pushdown for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables small enough to broadcast in any join at any scale factor —
#: at TPC-H geometry these grow ~linearly but stay tiny relative to facts.
DIMENSIONS = ("region", "nation", "supplier", "part", "customer")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's reader rejects;
        # read the raw int64 nanos (legacy conf, runtime-settable) and rebuild
        # a microsecond timestamp with exact integer division (nanos exceed
        # 2^53, so float division would corrupt them).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all tables as temp views (for the SQL-string operators)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
