"""Geo-ETL operator queries G3-G6 (SURVEY §2.11) over the driver testdata.

The testdata has no geometry columns, so coordinates are synthesized with
engine-identical DECIMAL arithmetic from table keys — the geo *operators*
(WKT synthesis, range aggregation, WKB round-trip, reprojection) are the
thing under test, exactly as the reference performs them on loaded files.

Reference parity: point synthesis mirrors ST_AsText(ST_Force2D(ST_Point(x,y)))
(geo_strategy.rs:322-343); range aggregation mirrors the coordinate min/max
fold (geo_strategy.rs:186-225); the WKB round-trip mirrors the probe ladder
(geo_strategy.rs:135-183); reprojection mirrors ST_Transform 27700→4326
(geo_strategy.rs:283-291).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from duckdb_postgis_spark.catalog import table
from duckdb_postgis_spark.registry import query

# Engine-identical synthetic coordinates: DECIMAL(·,1) keeps string rendering
# byte-identical between Spark and DuckDB (x.5 doubles are exact in binary).
_LON = "CAST((c_custkey % 360) - 179.5 AS DECIMAL(6,1))"
_LAT = "CAST((c_custkey % 180) - 89.5 AS DECIMAL(5,1))"


def _coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(_LON).alias("lon"),
        F.expr(_LAT).alias("lat"),
    )


# --------------------------------------------------------------------------
# G3 point WKT synthesis
# --------------------------------------------------------------------------
@query(
    "geo_point_wkt",
    oracle=f"""
    SELECT c_custkey,
           'POINT (' || CAST({_LON} AS VARCHAR) || ' ' || CAST({_LAT} AS VARCHAR) || ')'
             AS geom_wkt
    FROM customer
    WHERE {_LON} IS NOT NULL AND {_LAT} IS NOT NULL
    ORDER BY c_custkey
    """,
)
def geo_point_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x,y → 'POINT (x y)' WKT column, null-filtered — the reference's
    coordinate-pair path (geo_strategy.rs:322-343: ST_AsText(ST_Force2D(
    ST_Point(x,y))) with WHERE x IS NOT NULL AND y IS NOT NULL).
    Scale: pure codegen string synthesis, no shuffle."""
    c = _coords(spark, sf_dir)
    return (
        c.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
        .select(
            "c_custkey",
            F.concat(
                F.lit("POINT ("),
                F.col("lon").cast("string"),
                F.lit(" "),
                F.col("lat").cast("string"),
                F.lit(")"),
            ).alias("geom_wkt"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# G4 CRS inference ranges (the aggregation half; classifier is pure python)
# --------------------------------------------------------------------------
@query(
    "geo_crs_infer_ranges",
    oracle=f"""
    SELECT CAST(MIN({_LON}) AS DOUBLE) AS min_x, CAST(MAX({_LON}) AS DOUBLE) AS max_x,
           CAST(MIN({_LAT}) AS DOUBLE) AS min_y, CAST(MAX({_LAT}) AS DOUBLE) AS max_y,
           COUNT(*) AS n_points
    FROM customer
    WHERE {_LON} IS NOT NULL AND {_LAT} IS NOT NULL
    """,
)
def geo_crs_infer_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinate-range aggregation feeding the CRS classifier (SURVEY G4).
    The reference folds ≤10 probe rows client-side (geo_strategy.rs:186-225);
    as a real engine op this becomes a full min/max aggregate. The range→EPSG
    decision ladder (geo_strategy.rs:228-253) is
    functions/geo.py::classify_crs_from_ranges, unit-tested with the
    reference's exact thresholds. Scale: partial min/max — one reduced row."""
    c = _coords(spark, sf_dir)
    return c.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull()).agg(
        F.min("lon").cast("double").alias("min_x"),
        F.max("lon").cast("double").alias("max_x"),
        F.min("lat").cast("double").alias("min_y"),
        F.max("lat").cast("double").alias("max_y"),
        F.count("*").alias("n_points"),
    )


# --------------------------------------------------------------------------
# G6 WKB round-trip (encode → decode → coordinates)
# --------------------------------------------------------------------------
@query(
    "geo_wkb_roundtrip",
    oracle=f"""
    SELECT c_custkey, CAST({_LON} AS DOUBLE) AS x, CAST({_LAT} AS DOUBLE) AS y
    FROM customer
    ORDER BY c_custkey
    """,
)
def geo_wkb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WKB probe-ladder round-trip (SURVEY G6; geo_strategy.rs:135-183):
    encode each point as little-endian WKB, then decode via the probe ladder
    back to coordinates. The oracle is the identity on the inputs — any codec
    asymmetry fails the value hash. Arrow-batched mapInPandas (the geometry
    hot path stays vectorized python, the reference's own design keeps
    geometry row-scalar: SURVEY §4). Scale: narrow map, no shuffle."""
    from duckdb_postgis_spark.functions.geo import probe_geometry_encoding, wkb_point_encode

    c = _coords(spark, sf_dir).select(
        "c_custkey", F.col("lon").cast("double"), F.col("lat").cast("double")
    )

    def roundtrip(it):
        import pandas as pd

        for pdf in it:
            wkbs = [
                wkb_point_encode(x, y) for x, y in zip(pdf["lon"], pdf["lat"])
            ]
            decoded = [probe_geometry_encoding(w) for w in wkbs]
            yield pd.DataFrame(
                {
                    "c_custkey": pdf["c_custkey"],
                    "x": [d[1] if d else None for d in decoded],
                    "y": [d[2] if d else None for d in decoded],
                }
            )

    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("x", DoubleType()),
            StructField("y", DoubleType()),
        ]
    )
    return c.mapInPandas(roundtrip, schema=schema).orderBy("c_custkey")


# --------------------------------------------------------------------------
# G5 reprojection EPSG:27700 → EPSG:4326 (rows-only: DuckDB spatial absent)
# --------------------------------------------------------------------------
@query("geo_transform_27700_to_4326")
def geo_transform_27700_to_4326(spark: SparkSession, sf_dir: str) -> DataFrame:
    """British National Grid → WGS84 reprojection via closed-form OSGB math
    in an Arrow-batched pandas UDF (SURVEY G5; the reference's ST_Transform
    path geo_strategy.rs:288 with always_xy). Synthetic E/N derived from part
    keys inside the BNG validity envelope [0,800000]×[0,1400000]
    (geo_strategy.rs:237-243). No SQL oracle (DuckDB spatial unavailable
    offline) — numeric accuracy is unit-tested against published OS test
    points instead. Scale: vectorized python over Arrow batches."""
    from duckdb_postgis_spark.functions.geo import bng_to_wgs84

    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        (400000.0 + (F.col("p_partkey") % 4000) * F.lit(50.0)).alias("easting"),
        (100000.0 + (F.col("p_partkey") % 10000) * F.lit(100.0)).alias("northing"),
    )

    def reproject(it):
        import pandas as pd

        for pdf in it:
            lonlat = [
                bng_to_wgs84(e, n) for e, n in zip(pdf["easting"], pdf["northing"])
            ]
            yield pd.DataFrame(
                {
                    "p_partkey": pdf["p_partkey"],
                    "easting": pdf["easting"],
                    "northing": pdf["northing"],
                    "lon": [round(v[0], 6) for v in lonlat],
                    "lat": [round(v[1], 6) for v in lonlat],
                }
            )

    schema = StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("easting", DoubleType()),
            StructField("northing", DoubleType()),
            StructField("lon", DoubleType()),
            StructField("lat", DoubleType()),
        ]
    )
    return p.mapInPandas(reproject, schema=schema).orderBy("p_partkey")
