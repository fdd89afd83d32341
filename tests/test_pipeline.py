"""End-to-end pipeline tests: process_file on synthesized fixture files of
every supported format (the reference's integration surface, exercised
without a live PostGIS — sink DDL is asserted as SQL text)."""

from __future__ import annotations

import pytest

from duckdb_postgis_spark.pipeline import process_file
from duckdb_postgis_spark.sinks.postgis import (
    clean_table_name,
    create_schema_sql,
    drop_table_sql,
    geometry_rebuild_sql,
    postgis_uri_to_jdbc,
)


def test_csv_with_lonlat(spark, tmp_path):
    p = tmp_path / "cities.csv"
    p.write_text(
        "name,longitude,latitude\nLondon,-0.1276,51.5072\nParis,2.3522,48.8566\nNull,,\n"
    )
    res = process_file(spark, str(p))
    assert res.file_type == "CSV"
    assert res.coordinate_pair == ("longitude", "latitude")
    assert res.geom_columns == ["geom_from_longitude_latitude"]
    assert res.source_crs == "4326"
    rows = res.dataframe.collect()
    assert len(rows) == 2  # null coords filtered (geo_strategy.rs:328)
    wkts = {r["geom_from_longitude_latitude_wkt"] for r in rows}
    assert "POINT (-0.1276 51.5072)" in wkts


def test_csv_with_bng_reprojects(spark, tmp_path):
    p = tmp_path / "uk.csv"
    p.write_text("site,Easting,Northing\nGreenwich,538890,177320\nYork,460150,452150\n")
    res = process_file(spark, str(p))
    assert res.source_crs == "27700"
    wkt = res.dataframe.collect()[0]["geom_from_Easting_Northing_wkt"]
    x, y = map(float, wkt[len("POINT (") : -1].split())
    assert abs(y - 51.477) < 2e-3  # Greenwich latitude after reprojection


def test_csv_no_coordinates_non_geo(spark, tmp_path):
    p = tmp_path / "plain.csv"
    p.write_text("id,name,amount\n1,a,10\n2,b,20\n")
    res = process_file(spark, str(p))
    assert res.geom_columns == []
    assert res.dataframe.count() == 2


def test_geojson_points(spark, tmp_path):
    p = tmp_path / "pts.geojson"
    p.write_text(
        '{"type": "FeatureCollection", "features": ['
        '{"type": "Feature", "geometry": {"type": "Point", "coordinates": [102.0, 0.5]},'
        ' "properties": {"name": "A"}},'
        '{"type": "Feature", "geometry": {"type": "Point", "coordinates": [103.5, 1.25]},'
        ' "properties": {"name": "B"}}]}'
    )
    res = process_file(spark, str(p))
    assert res.file_type == "GeoJSON"
    df = res.dataframe
    assert "geometry_wkt_wkt" in df.columns or "geometry_wkt" in df.columns
    vals = [r for r in df.collect()]
    assert len(vals) == 2


def test_parquet_passthrough(spark, tmp_path):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    path = str(tmp_path / "t.parquet")
    src.coalesce(1).write.parquet(path)
    import glob

    part = glob.glob(f"{path}/*.parquet")[0]
    res = process_file(spark, part)
    assert res.file_type == "Parquet"
    assert res.geom_columns == []
    assert res.dataframe.count() == 2


def test_zipped_shapefile_end_to_end(spark, tmp_path):
    from duckdb_postgis_spark.sources.readers import write_sample_zip_shapefile

    p = str(tmp_path / "layer.zip")
    write_sample_zip_shapefile(
        p, [(530000.0, 180000.0), (460150.0, 452150.0)], prj="OSGB_1936 British_National_Grid"
    )
    res = process_file(spark, str(p))
    assert res.file_type == "Shapefile"
    df = res.dataframe
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["crs_epsg"] == "27700"


def test_gpkg_reader(spark, tmp_path):
    import sqlite3

    from duckdb_postgis_spark.functions.geo import wkb_point_encode
    from duckdb_postgis_spark.sources.readers import read_geopackage

    p = str(tmp_path / "x.gpkg")
    con = sqlite3.connect(p)
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)"
    )
    con.execute("INSERT INTO gpkg_contents VALUES ('pts', 'features')")
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT)"
    )
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('pts', 'geom')")
    con.execute("CREATE TABLE pts (fid INTEGER, name TEXT, geom BLOB)")
    # GPKG binary: magic GP, version 0, flags 0x01 (little-endian, no envelope), srid 4326
    header = b"GP\x00\x01" + (4326).to_bytes(4, "little")
    con.execute(
        "INSERT INTO pts VALUES (1, 'a', ?)",
        (header + wkb_point_encode(-0.1, 51.5),),
    )
    con.commit()
    con.close()
    df = read_geopackage(spark, p)
    row = df.collect()[0]
    assert row["name"] == "a"
    from duckdb_postgis_spark.functions.geo import wkb_point_decode

    assert wkb_point_decode(bytes(row["geom"])) == (-0.1, 51.5)


def _write_min_xlsx(path, shared_strings, sheet_xml):
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {ns}><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>',
        )
        if shared_strings:
            items = "".join(f"<si><t>{s}</t></si>" for s in shared_strings)
            zf.writestr(
                "xl/sharedStrings.xml",
                f'<?xml version="1.0"?><sst {ns} count="{len(shared_strings)}">{items}</sst>',
            )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>{sheet_xml}</sheetData></worksheet>',
        )


def test_xlsx_stdlib_reader_end_to_end(spark, tmp_path):
    """Pure-stdlib xlsx decode (round-1 gap: stub behind missing openpyxl;
    reference reads xlsx via DuckDB read_xlsx, core_processor.rs:407-412).
    Covers shared strings, inline strings, booleans, int-vs-float numbers,
    blank cells, and the sniffer → process_file dispatch."""
    from duckdb_postgis_spark.pipeline import process_file

    p = str(tmp_path / "t.xlsx")
    _write_min_xlsx(
        p,
        ["name", "qty", "price", "alice", "bob"],
        # header via shared strings; row2 sparse (qty missing), inline str,
        # bool, integral + fractional numbers
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c><c r="D1" t="inlineStr"><is><t>ok</t></is></c></row>'
        '<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>3</v></c>'
        '<c r="C2"><v>1.5</v></c><c r="D2" t="b"><v>1</v></c></row>'
        '<row r="3"><c r="A3" t="s"><v>4</v></c><c r="C3"><v>2</v></c></row>',
    )
    df = process_file(spark, p).dataframe
    assert df.columns == ["name", "qty", "price", "ok"]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["alice"]["qty"] == 3 and rows["alice"]["price"] == 1.5
    assert rows["alice"]["ok"] is True
    assert rows["bob"]["qty"] is None and rows["bob"]["price"] == 2


def test_legacy_xls_still_raises_cleanly(spark, tmp_path):
    from duckdb_postgis_spark.sources.readers import read_excel

    p = tmp_path / "t.xls"
    p.write_bytes(b"\xd0\xcf\x11\xe0" + b"\x00" * 60)
    with pytest.raises((NotImplementedError, ValueError, Exception)):
        read_excel(spark, str(p))


# --- sink SQL text (byte-compatible with geo_strategy.rs:370-414) ---------
def test_clean_table_name():
    assert clean_table_name("/data/My File.geojson") == "My File"
    assert clean_table_name("plain") == "plain"


def test_schema_sql_escaping():
    assert create_schema_sql("it's") == 'CREATE SCHEMA IF NOT EXISTS "it\'\'s";'


def test_drop_sql():
    assert drop_table_sql("s", "t") == 'DROP TABLE IF EXISTS "s"."t";'


def test_geometry_rebuild_sql_shape():
    sql = geometry_rebuild_sql("s", "t", "geom")
    assert sql.startswith("BEGIN TRANSACTION;")
    assert 'ALTER TABLE "s"."t" ADD COLUMN "geom" geometry;' in sql
    assert "safe_geom_from_text" in sql
    assert "RETURN NULL;" in sql  # bad WKT swallowed as NULL
    assert 'WHERE "geom_wkt" IS NOT NULL AND "geom_wkt" != \'\';' in sql
    assert "DROP FUNCTION safe_geom_from_text(text, integer);" in sql
    assert 'DROP COLUMN "geom_wkt";' in sql
    assert sql.rstrip().endswith("COMMIT;")


def test_jdbc_uri_splits_credentials():
    """pgJDBC rejects userinfo in the URL — credentials must become
    connection properties (round-1 ADVICE)."""
    url, props = postgis_uri_to_jdbc("postgresql://u:p%40ss@h:5432/db")
    assert url == "jdbc:postgresql://h:5432/db"
    assert props == {"user": "u", "password": "p@ss"}
    # postgres:// scheme alias, no credentials, query params preserved
    url, props = postgis_uri_to_jdbc("postgres://h/db?sslmode=require")
    assert url == "jdbc:postgresql://h/db?sslmode=require"
    assert props == {}


def test_zipped_shapefile_polygon_roundtrip(spark, tmp_path):
    """Polygon (type 5) with a hole → WKB → WKT round-trip through the codec
    (round-1 gap: reader was Point-only; reference reads all types via GDAL
    st_read, core_processor.rs:399-406)."""
    from duckdb_postgis_spark.functions.wkb import to_wkt, wkb_decode
    from duckdb_postgis_spark.sources.readers import (
        read_zipped_shapefile,
        shp_poly_payload,
        write_sample_zip_shapefile_records,
    )

    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]  # CW
    hole = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]  # CCW
    p = str(tmp_path / "poly.zip")
    write_sample_zip_shapefile_records(p, [shp_poly_payload(5, [outer, hole])])
    rows = read_zipped_shapefile(spark, p).collect()
    assert len(rows) == 1
    wkt = to_wkt(wkb_decode(rows[0]["geometry_wkb"]))
    assert wkt == (
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    )
    # centroid probe columns: (5*100 - 3*4) / 96 — the 2x2 hole at (3,3)
    # pulls the 10x10 square's centroid from 5 to 5.0833
    assert rows[0]["x"] == pytest.approx((5 * 100 - 3 * 4) / 96)
    assert rows[0]["y"] == pytest.approx((5 * 100 - 3 * 4) / 96)


def test_zipped_shapefile_polyline_and_multipoint(spark, tmp_path):
    from duckdb_postgis_spark.functions.wkb import to_wkt, wkb_decode
    from duckdb_postgis_spark.sources.readers import (
        read_zipped_shapefile,
        shp_multipoint_payload,
        shp_poly_payload,
        write_sample_zip_shapefile_records,
    )

    p = str(tmp_path / "mixed.zip")
    write_sample_zip_shapefile_records(
        p,
        [
            shp_poly_payload(3, [[(0.0, 0.0), (4.0, 0.0)], [(0.0, 1.0), (4.0, 1.0)]]),
            shp_poly_payload(3, [[(0.0, 0.0), (2.0, 2.0)]]),
            shp_multipoint_payload([(1.0, 1.0), (3.0, 5.0)]),
        ],
    )
    rows = read_zipped_shapefile(spark, p).orderBy("id").collect()
    wkts = [to_wkt(wkb_decode(r["geometry_wkb"])) for r in rows]
    assert wkts == [
        "MULTILINESTRING ((0 0, 4 0), (0 1, 4 1))",
        "LINESTRING (0 0, 2 2)",
        "MULTIPOINT (1 1, 3 5)",
    ]


def test_zipped_shapefile_multipolygon(spark, tmp_path):
    from duckdb_postgis_spark.functions.wkb import to_wkt, wkb_decode
    from duckdb_postgis_spark.sources.readers import (
        read_zipped_shapefile,
        shp_poly_payload,
        write_sample_zip_shapefile_records,
    )

    sq1 = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]  # CW
    sq2 = [(5.0, 5.0), (5.0, 6.0), (6.0, 6.0), (6.0, 5.0), (5.0, 5.0)]  # CW
    p = str(tmp_path / "mp.zip")
    write_sample_zip_shapefile_records(p, [shp_poly_payload(5, [sq1, sq2])])
    rows = read_zipped_shapefile(spark, p).collect()
    wkt = to_wkt(wkb_decode(rows[0]["geometry_wkb"]))
    assert wkt == (
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 6, 6 6, 6 5, 5 5)))"
    )


def test_zipped_shapefile_multipatch_roundtrip(spark, tmp_path):
    """MultiPatch (type 31, round 7 — the reference reads these via GDAL
    st_read): triangle strip + triangle fan explode into one triangle
    polygon each, OuterRing+InnerRing group into a holed polygon, and the
    trailing Z block is skipped (force-2D, geo_strategy.rs:283-291)."""
    from duckdb_postgis_spark.functions.wkb import to_wkt, wkb_decode
    from duckdb_postgis_spark.sources.readers import (
        read_zipped_shapefile,
        shp_multipatch_payload,
        write_sample_zip_shapefile_records,
    )

    strip = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]  # 2 triangles
    fan = [(10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0)]  # 2 tris
    outer = [(20.0, 20.0), (20.0, 24.0), (24.0, 24.0), (24.0, 20.0), (20.0, 20.0)]
    hole = [(21.0, 21.0), (22.0, 21.0), (22.0, 22.0), (21.0, 22.0), (21.0, 21.0)]
    p = str(tmp_path / "patch.zip")
    write_sample_zip_shapefile_records(
        p,
        [
            shp_multipatch_payload(
                [(0, strip), (1, fan), (2, outer), (3, hole)]
            )
        ],
    )
    rows = read_zipped_shapefile(spark, p).collect()
    assert len(rows) == 1
    wkt = to_wkt(wkb_decode(bytes(rows[0]["geometry_wkb"])))
    assert wkt == (
        "MULTIPOLYGON ("
        "((0 0, 1 0, 0 1, 0 0)), ((1 0, 0 1, 1 1, 1 0)), "
        "((10 10, 11 10, 11 11, 10 10)), ((10 10, 11 11, 10 11, 10 10)), "
        "((20 20, 20 24, 24 24, 24 20, 20 20), (21 21, 22 21, 22 22, 21 22, 21 21)))"
    )


def test_zipped_shapefile_multipatch_bare_rings(spark, tmp_path):
    """Bare Ring parts (type 5) fall back to the polygon winding heuristic:
    two clockwise squares → two separate polygons."""
    from duckdb_postgis_spark.functions.wkb import to_wkt, wkb_decode
    from duckdb_postgis_spark.sources.readers import (
        read_zipped_shapefile,
        shp_multipatch_payload,
        write_sample_zip_shapefile_records,
    )

    sq1 = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]  # CW
    sq2 = [(5.0, 5.0), (5.0, 6.0), (6.0, 6.0), (6.0, 5.0), (5.0, 5.0)]  # CW
    p = str(tmp_path / "rings.zip")
    write_sample_zip_shapefile_records(
        p, [shp_multipatch_payload([(5, sq1), (5, sq2)])]
    )
    rows = read_zipped_shapefile(spark, p).collect()
    wkt = to_wkt(wkb_decode(bytes(rows[0]["geometry_wkb"])))
    assert wkt == (
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 6, 6 6, 6 5, 5 5)))"
    )


def test_gpkg_srs_metadata_wins_over_range_inference(spark, tmp_path):
    """CRS from gpkg_contents.srs_id → gpkg_spatial_ref_sys (reference reads
    st_read_meta auth_code, geo_strategy.rs:55-70). The coords below LOOK
    like lon/lat (range inference would say 4326) but metadata says 27700 —
    metadata must win."""
    import sqlite3

    from duckdb_postgis_spark.pipeline import process_file

    p = str(tmp_path / "meta.gpkg")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT, srs_id INTEGER)")
    con.execute("INSERT INTO gpkg_contents VALUES ('pts', 'features', 27700)")
    con.execute(
        "CREATE TABLE gpkg_spatial_ref_sys (srs_id INTEGER, organization TEXT, organization_coordsys_id INTEGER)"
    )
    con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES (27700, 'EPSG', 27700)")
    con.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('pts', 'geom')")
    con.execute("CREATE TABLE pts (fid INTEGER, geom BLOB)")
    import struct as _s

    wkb = _s.pack("<BIdd", 1, 1, 0.5, 51.5)  # in-4326-range on purpose
    con.execute(
        "INSERT INTO pts VALUES (1, ?)", (b"GP\x00\x01" + (4326).to_bytes(4, "little") + wkb,)
    )
    con.commit()
    con.close()
    res = process_file(spark, p)
    assert res.source_crs == "27700"


def test_geojson_all_geometry_types_to_wkt(spark, tmp_path):
    """Round-1 gap: only Point got geometry_wkt; the reference normalizes
    every geometry to 2D WKT (geo_strategy.rs:283-291)."""
    import json

    from duckdb_postgis_spark.sources.readers import read_geojson

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "poly"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [0, 2], [2, 2], [2, 0], [0, 0]]],
                },
            },
            {
                "type": "Feature",
                "properties": {"name": "line"},
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[0, 0], [1.5, 2.25]],
                },
            },
            {
                "type": "Feature",
                "properties": {"name": "pt"},
                "geometry": {"type": "Point", "coordinates": [121.123456, 31.2304]},
            },
        ],
    }
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(fc))
    rows = {r["name"]: r["geometry_wkt"] for r in read_geojson(spark, str(p)).collect()}
    assert rows["pt"] == "POINT (121.123456 31.2304)"
    assert rows["line"] == "LINESTRING (0 0, 1.5 2.25)"
    assert rows["poly"] == "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))"
