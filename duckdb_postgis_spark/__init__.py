"""duckdb_postgis_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``enmeshed-analytics/duckdb-postgis``
(v0.2.6), re-expressed Spark-first.

The reference is a geospatial ETL pipeline that delegates all query work to an
embedded DuckDB (``core_processor.rs:391-428``) and writes to PostGIS
(``geo_strategy.rs:350-421``). This package reproduces those semantics on the
Spark DataFrame/SQL/Catalyst stack and extends them with the full relational,
streaming, and LLM-data-pipeline operator surface declared in SURVEY.md §2.

Layout:
    session      SparkSession builder (AQE, Arrow, UTC, tuned shuffle)
    catalog      testdata table loader / temp-view registration
    registry     query + oracle registry backing __spark_entry__.py
    operators/   relational (R1-R20), llm (L1-L9+), streaming twins (S1-S5),
                 geo queries (G3-G6)
    sources/     file-format sniffing + readers (reference core_processor.rs)
    functions/   numeric-exactness helpers, geo math, text, vector ops
    sinks/       PostGIS JDBC writer + geometry-rebuild DDL replay
    streaming/   Structured Streaming (readStream) variants of S1-S5
"""

__version__ = "0.1.0"
